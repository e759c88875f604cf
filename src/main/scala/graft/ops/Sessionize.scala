package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as a single window pass.
  *
  * Reference semantics: games separated by < gap belong to one session; a new
  * session starts when the inter-event gap is >= the threshold (2h in the
  * reference's `vw_settings`) — `/root/reference/parser/parse_matches.sh:298-346`
  * builds this with 4 CTEs (lag → flag → lead-derived [start,end) ranges →
  * interval self-join). We instead compute the session ordinal directly:
  * flag = (gap >= threshold OR first row), session_seq = running SUM(flag).
  * Identical assignment, ONE shuffle (hash partition by entity) instead of a
  * window pass *plus* an interval join.
  *
  * At 100 TB: the only shuffle is `partitionBy(entity)`; session aggregation
  * afterwards reuses the same partitioning (groupBy entity+session_seq is a
  * narrow re-hash Catalyst can satisfy without a second full shuffle when
  * AQE coalesces). Skewed entities (one user with millions of events) are the
  * risk — mitigate upstream with AQE skew handling; the window itself is
  * streaming-friendly (single ordered scan per partition).
  */
object Sessionize {

  /** Adds `session_seq` (1-based ordinal per entity) to `df`.
    *
    * @param entity     partition key column (e.g. user_id)
    * @param ts         event-time column (TimestampType)
    * @param tieBreak   unique column ordering ties on equal ts (determinism)
    * @param gapSeconds new session when gap >= this many seconds
    */
  def assign(df: DataFrame, entity: Column, ts: Column, tieBreak: Column,
             gapSeconds: Long): DataFrame = {
    val w      = Window.partitionBy(entity).orderBy(ts, tieBreak)
    val tsUs   = unix_micros(ts)
    val prevUs = lag(tsUs, 1).over(w)
    val newFlag = when(prevUs.isNull || tsUs - prevUs >= gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_seq",
      sum(newFlag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: n_events, start/end (epoch µs), exact value sum.
    * Mirrors the reference's per-session stats
    * (`/root/reference/parser/parse_matches.sh:349-376`). */
  def sessions(df: DataFrame, entity: Column, ts: Column, tieBreak: Column,
               gapSeconds: Long, valueCents: Column): DataFrame =
    assign(df, entity, ts, tieBreak, gapSeconds)
      .groupBy(entity, col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(ts)).as("start_us"),
        max(unix_micros(ts)).as("end_us"),
        (sum(valueCents).cast("double") / 100.0).as("sum_value"))
}
