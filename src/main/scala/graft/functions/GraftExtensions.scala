package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard deployment path for graft's native expressions:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * registers every function at session build time — no imperative
  * `register(spark)` call needed. The imperative registrars
  * ([[GraftFunctions]]/[[TextFunctions]]) remain for sessions the library
  * doesn't construct (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "sequential-fold dot product of two ARRAY<DOUBLE>"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect", "intersection size of two sorted distinct ARRAY<BIGINT>"),
      (c: Seq[Expression]) => SortedIntersectCount(c(0), c(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_bands"),
      info("graft_minhash_bands", "MinHash LSH band keys of a distinct-hash array"),
      (c: Seq[Expression]) => MinhashBandKeys(c(0))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes3"),
      info("graft_shingle_hashes3", "sorted distinct 60-bit hashes of word 3-shingles"),
      (c: Seq[Expression]) => ShingleHashes(c(0), 3)))
    ext.injectFunction((FunctionIdentifier("graft_winnow_7_4"),
      info("graft_winnow_7_4", "winnowing fingerprints (7-gram hashes, window-4 minima)"),
      (c: Seq[Expression]) => WinnowFingerprints(c(0), 7, 4)))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "Unicode NFC normalization of a STRING"),
      (c: Seq[Expression]) => NfcNormalize(c(0))))
    ext.injectFunction((FunctionIdentifier("graft_array_min_agg"),
      info("graft_array_min_agg", "elementwise min aggregate over ARRAY<BIGINT> rows"),
      (c: Seq[Expression]) => ArrayMinAgg(c(0))))
    // Optimizer rule: push element-only filter predicates under explode()
    // (runs in the operator-optimization batch; see the rule's scaladoc).
    ext.injectOptimizerRule(_ => graft.plans.PushFilterIntoExplode)
  }
}
