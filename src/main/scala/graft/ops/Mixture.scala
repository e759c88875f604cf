package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget mixture planning (q63's operator form, shared with
  * [[graft.corpus.CurationPipeline]]): per source, the integer keep-rate
  * that lands a fixed token budget, and the deterministic hash-bucket
  * sample at that rate.
  *
  * Rate arithmetic is integer DIV in BOTH engines — `Column./` is IEEE
  * division even on BIGINTs, and a fractional rate keeps boundary buckets
  * the integer-floor oracle drops (the q63 pitfall, pinned here once).
  * The rate dim is ≤ |sources| rows → always broadcast; the sample filter
  * is map-side.
  */
object Mixture {

  /** (source, total_toks, rate_pct) per source. */
  def tokenBudgetRates(df: DataFrame, sourceCol: String, nToksCol: String,
                       budgetToks: Long): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(sum(col(nToksCol)).as("total_toks"))
      .withColumn("rate_pct",
        least(lit(100L), expr(s"$budgetToks * 100 DIV total_toks")))

  /** Keep rows whose id hash-bucket falls under their source's rate. */
  def sampleAtRates(df: DataFrame, sourceCol: String, rates: DataFrame,
                    idExpr: String = "CAST(doc_id AS STRING)"): DataFrame =
    df.join(broadcast(rates.select(col(sourceCol), col("rate_pct"))),
        Seq(sourceCol))
      .filter(expr(TextOps.docBucketExpr(idExpr)) < col("rate_pct"))
      .drop("rate_pct")
}
