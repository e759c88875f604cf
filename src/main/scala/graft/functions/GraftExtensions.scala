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

  // ExpressionInfo's 5-arg constructor slots are (className, db, name,
  // usage, extended) — passing name second would shift it into the db
  // field and print the usage sentence as the function's NAME under
  // DESCRIBE FUNCTION (verified against spark-catalyst 4.1.2)
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "sequential-fold dot product of two ARRAY<DOUBLE>"),
      Arity(2, "graft_dot")(c => DotProduct(c(0), c(1)))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect", "intersection size of two sorted distinct ARRAY<BIGINT>"),
      Arity(2, "graft_sorted_intersect")(c => SortedIntersectCount(c(0), c(1)))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_bands"),
      info("graft_minhash_bands", "MinHash LSH band keys of a distinct-hash array"),
      Arity(1, "graft_minhash_bands")(c => MinhashBandKeys(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "one-pass MinHash signature (all permutation minima)"),
      Arity(1, "graft_minhash_sig")(c => MinhashSignature(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes3"),
      info("graft_shingle_hashes3", "sorted distinct 60-bit hashes of word 3-shingles"),
      Arity(1, "graft_shingle_hashes3")(c => ShingleHashes(c(0), 3))))
    ext.injectFunction((FunctionIdentifier("graft_winnow_7_4"),
      info("graft_winnow_7_4", "winnowing fingerprints (7-gram hashes, window-4 minima)"),
      Arity(1, "graft_winnow_7_4")(c => WinnowFingerprints(c(0), 7, 4))))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "Unicode NFC normalization of a STRING"),
      Arity(1, "graft_nfc")(c => NfcNormalize(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_array_min_agg"),
      info("graft_array_min_agg", "elementwise min aggregate over ARRAY<BIGINT> rows"),
      Arity(1, "graft_array_min_agg")(c => ArrayMinAgg(c(0)))))
    Seq(1, 2, 8).foreach { k =>
      ext.injectFunction((FunctionIdentifier(s"graft_pos_grams$k"),
        info(s"graft_pos_grams$k", s"positional 60-bit hashes of word $k-grams"),
        Arity(1, s"graft_pos_grams$k")(c => PosGramHashes(c(0), k))))
    }
    ext.injectFunction((FunctionIdentifier("graft_token_buckets64"),
      info("graft_token_buckets64", "word-token feature-bucket counts + bias"),
      Arity(1, "graft_token_buckets64")(c => TokenBucketCounts(c(0), 64))))
    ext.injectFunction((FunctionIdentifier("graft_rep_stats"),
      info("graft_rep_stats", "per-doc [n_toks, n_distinct, top_bigram_n]"),
      Arity(1, "graft_rep_stats")(c => RepetitionStats(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_pii_stats"),
      info("graft_pii_stats", "fused PII redaction stats [n_emails, n_ips, clean_len, clean_h]"),
      Arity(1, "graft_pii_stats")(c => PiiStats(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "60-bit SimHash signature of a text column"),
      Arity(1, "graft_simhash60")(c => SimhashSig(c(0)))))
    ext.injectFunction((FunctionIdentifier("graft_clip_count"),
      info("graft_clip_count", "multiset intersection size of two ARRAY<BIGINT>"),
      Arity(2, "graft_clip_count")(c => ClipOverlapCount(c(0), c(1)))))
    ext.injectFunction((FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot", "integer dot product of two ARRAY<BIGINT>"),
      Arity(2, "graft_int_dot")(c => IntDotProduct(c(0), c(1)))))
    ext.injectFunction((FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist", "integer squared L2 distance of two ARRAY<BIGINT>"),
      Arity(2, "graft_sqdist")(c => IntSqDist(c(0), c(1)))))
    ext.injectFunction((FunctionIdentifier("graft_pairs"),
      info("graft_pairs", "all i<j pairs of an ARRAY<BIGINT> as structs"),
      Arity(1, "graft_pairs")(c => SortedPairs(c(0)))))
    // Optimizer rule: push element-only filter predicates under explode()
    // (runs in the operator-optimization batch; see the rule's scaladoc).
    ext.injectOptimizerRule(_ => graft.plans.PushFilterIntoExplode)
  }
}
