package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a reusable operator: a d×w counter table over a
  * keyed stream of items, supporting point frequency estimates with
  * one-sided error (estimate ≥ true count, overcount ≤ εN with
  * w = 2/ε at confidence 1 − (1/2)^d).
  *
  * The batch query form is `q138_cms_heavyhitters`; [[graft.streaming
  * .StreamSketch]] maintains the same counter table incrementally —
  * both build on [[bucketExpr]], so batch↔stream parity is structural
  * (identical hash, identical cells), and StreamSketchSpec asserts it
  * on a shared fixture.
  *
  * Scale: the counter build is one (d, bucket)-keyed HashAggregate
  * whose map-side partials collapse to ≤ d·w cells per task — the
  * shuffle is O(d·w·tasks) regardless of corpus size, and the
  * streaming state is exactly the d·w cells (no per-key state at all:
  * that boundedness is the whole point versus an exact count).
  */
object Cms {

  /** Bucket for estimator row `d` (a column named `d` must be in scope)
    * and the given key expression: shared-hash pmod into [0, w). */
  def bucketExpr(keyExpr: String, w: Int): String =
    s"pmod(${TextOps.hash60(s"concat('cm', CAST(d AS STRING), ':', $keyExpr)")}, $w)"

  /** DuckDB twin of [[bucketExpr]] (same constants, same md5). */
  def bucketSql(keyExpr: String, w: Int): String =
    s"${TextOps.sql.hash60(s"concat('cm', CAST(d AS VARCHAR), ':', $keyExpr)")} % $w"

  /** The operator's reserved working names — same guard discipline as
    * [[ShardPlan]]/[[AsofJoin]]: silently overwriting a caller's `d` (a
    * perfectly plausible user column name) would corrupt the group keys
    * with no error. */
  private def requireNoReserved(df: DataFrame, who: String): Unit =
    Seq("d", "bucket").foreach { c =>
      require(!df.columns.contains(c),
        s"Cms.$who: input already has a column named '$c' (reserved)")
    }

  /** (d, bucket) rows for every item — the map-side sketch update. */
  def updates(items: DataFrame, keyExpr: String, d: Int, w: Int): DataFrame = {
    requireNoReserved(items, "updates")
    items
      .withColumn("d", explode(expr(s"sequence(0, ${d - 1})")))
      .select(col("d"), expr(bucketExpr(keyExpr, w)).as("bucket"))
  }

  /** The batch counter table: (d, bucket, c). ≤ d·w rows. */
  def counters(items: DataFrame, keyExpr: String, d: Int, w: Int): DataFrame =
    updates(items, keyExpr, d, w)
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** [[counters]] over a PRE-AGGREGATED key table: each key row carries
    * its multiplicity in `weightCol`, and the cell values are the
    * weighted sums — identical to [[counters]] over the un-aggregated
    * stream (c[d][b] = Σ_keys f·[bucket(key)=b]; integer sums commute),
    * at one bucket hash per KEY instead of one per item. Callers that
    * already hold the exact frequency table (q138's audit column) get
    * the sketch build for d hashes per distinct key. CmsSpec pins the
    * equality on a fixture. */
  def weightedCounters(keyed: DataFrame, keyExpr: String, weightCol: String,
                       d: Int, w: Int): DataFrame = {
    requireNoReserved(keyed, "weightedCounters")
    keyed
      .withColumn("d", explode(expr(s"sequence(0, ${d - 1})")))
      .select(col("d"), expr(bucketExpr(keyExpr, w)).as("bucket"),
        col(weightCol).as("w_"))
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("w_")).as("c"))
  }

  /** Point estimates for `probes` (must carry the key column):
    * min over the d rows of each probe's counter cells. `counters`
    * is broadcast — it is ≤ d·w rows by construction. LEFT join +
    * coalesce-to-0: a probe key the stream never touched has empty
    * counter cells, and the CMS estimate of an empty cell is 0 — an
    * inner join would silently DROP a fully-unseen probe (and
    * overestimate a partially-collided one from its surviving cells
    * only), exactly wrong for membership-style probing. */
  def estimate(probes: DataFrame, countersDf: DataFrame, keyExpr: String,
               d: Int, w: Int, estCol: String = "cms_estimate"): DataFrame = {
    requireNoReserved(probes, "estimate")
    val keyed = probes
      .withColumn("d", explode(expr(s"sequence(0, ${d - 1})")))
      .withColumn("bucket", expr(bucketExpr(keyExpr, w)))
    val groupCols = probes.columns.map(col).toSeq
    keyed.join(broadcast(countersDf), Seq("d", "bucket"), "left")
      .groupBy(groupCols: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as(estCol))
  }
}
