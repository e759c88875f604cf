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

  /** (source, total_toks, rate_pct): keep-rate ∝ (mass / max_mass)^alpha
    * — temperature-scaled sampling (q89's policy, generalized from its
    * oracle-pinned α = 0.5), which FLATTENS source imbalance instead of
    * hitting a fixed per-source budget: the heaviest source always keeps
    * 100%, lighter sources keep relatively more than proportional
    * sampling would give them. Normalizing to the max (not the sum)
    * keeps the only float work one pow + one divide per source row. */
  def temperatureRates(df: DataFrame, sourceCol: String, nToksCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1; got $alpha")
    val mass = df.groupBy(col(sourceCol))
      .agg(sum(col(nToksCol)).as("total_toks"))
    mass.crossJoin(mass.select(max(col("total_toks")).as("max_toks")))
      .withColumn("rate_pct",
        floor(lit(100.0) * pow(col("total_toks").cast("double") /
          col("max_toks").cast("double"), lit(alpha))))
      .drop("max_toks")
  }

  /** Keep rows whose id hash-bucket falls under their source's rate. */
  def sampleAtRates(df: DataFrame, sourceCol: String, rates: DataFrame,
                    idExpr: String = "CAST(doc_id AS STRING)"): DataFrame =
    df.join(broadcast(rates.select(col(sourceCol), col("rate_pct"))),
        Seq(sourceCol))
      .filter(expr(TextOps.docBucketExpr(idExpr)) < col("rate_pct"))
      .drop("rate_pct")
}
