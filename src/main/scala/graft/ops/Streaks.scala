package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands streak detection.
  *
  * Reference: consecutive gulag win/loss streaks via the classic
  * double-DENSE_RANK difference
  * (`/root/reference/frontend/generate_lookup_data.sh:356-414`). We use the
  * equivalent ROW_NUMBER-difference island id: rows ordered per entity minus
  * rows ordered per (entity, state) — constant within a run of equal `state`,
  * changes when the state flips. One shuffle on the entity key; both window
  * functions share the same partitioning so Catalyst plans a single sort.
  *
  * At 100 TB: identical shape to sessionization — one hash partition + sort
  * per entity; the island aggregation reuses the partitioning. No joins.
  */
object Streaks {

  /** Adds `island` — stable id for each maximal run of equal `state` per
    * entity in (ts, tieBreak) order. */
  def islands(df: DataFrame, entity: Column, state: Column, ts: Column,
              tieBreak: Column): DataFrame = {
    val wAll   = Window.partitionBy(entity).orderBy(ts, tieBreak)
    val wState = Window.partitionBy(entity, state).orderBy(ts, tieBreak)
    df.withColumn("island", row_number().over(wAll) - row_number().over(wState))
  }

  /** Per-streak rollup: length + first/last event time (epoch µs). */
  def streaks(df: DataFrame, entity: Column, state: Column, ts: Column,
              tieBreak: Column): DataFrame =
    islands(df, entity, state, ts, tieBreak)
      .groupBy(entity, state, col("island"))
      .agg(
        count(lit(1)).as("streak_len"),
        min(unix_micros(ts)).as("start_us"),
        max(unix_micros(ts)).as("end_us"))
}
