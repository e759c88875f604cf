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

  /** Keep-rate granularity of [[temperatureRates]]: per-10-thousand, not
    * per-cent — at α = 0.5 a source must be lighter than 1/10⁸ of the
    * heaviest before its rate floors to zero; percent granularity would
    * annihilate anything under 1/10⁴, the small sources the policy
    * exists to keep (q89 pins the same scale). */
  val TemperatureScale = 10000L

  /** (source, total_toks, rate_pm10k): keep-rate ∝ (mass / max_mass)^alpha
    * — temperature-scaled sampling (q89's policy, generalized from its
    * oracle-pinned α = 0.5), which FLATTENS source imbalance instead of
    * hitting a fixed per-source budget: the heaviest source always keeps
    * 100%, lighter sources keep relatively more than proportional
    * sampling would give them. Normalizing to the max (not the sum)
    * keeps the only float work one pow + one divide per source row.
    * The corpus aggregates ONCE — the ≤ |sources|-row result comes back
    * as a local relation (the dimension-collect discipline), so the two
    * downstream uses don't re-scan and nothing stays cached. */
  def temperatureRates(df: DataFrame, sourceCol: String, nToksCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1; got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val mass = df.groupBy(col(sourceCol))
      .agg(sum(col(nToksCol)).as("total_toks"))
      .as[(String, Long)].collect()
    val maxToks = if (mass.isEmpty) 1L else mass.map(_._2).max
    mass.toSeq.map { case (src, toks) =>
      (src, toks,
        math.floor(TemperatureScale.toDouble *
          math.pow(toks.toDouble / maxToks.toDouble, alpha)).toLong)
    }.toDF(sourceCol, "total_toks", "rate_pm10k")
  }

  /** Keep rows whose id hash-bucket falls under their source's rate.
    * `rateCol`/`scale` default to the token-budget policy's percent
    * buckets; [[temperatureRates]] callers pass ("rate_pm10k",
    * [[TemperatureScale]]). */
  def sampleAtRates(df: DataFrame, sourceCol: String, rates: DataFrame,
                    idExpr: String = "CAST(doc_id AS STRING)",
                    rateCol: String = "rate_pct",
                    scale: Long = 100L): DataFrame =
    df.join(broadcast(rates.select(col(sourceCol), col(rateCol))),
        Seq(sourceCol))
      .filter(expr(TextOps.docBucketExpr(idExpr, scale)) < col(rateCol))
      .drop(rateCol)
}
