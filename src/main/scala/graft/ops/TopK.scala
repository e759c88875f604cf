package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k patterns.
  *
  * Reference: 12 per-metric `ORDER BY x DESC LIMIT 10` leaderboards
  * (`/root/reference/frontend/generate_lookup_data.sh:101-315`), latest-row
  * per player (`:555-561`), recent-N (`:515-537`).
  *
  * Global top-k compiles to Spark's `TakeOrderedAndProject`: each task keeps
  * a size-k heap, the driver merges — no full sort, no shuffle of anything
  * but k rows per partition. That is exactly the 100 TB-safe plan, so plain
  * `orderBy().limit()` is already optimal; the helper only enforces the
  * deterministic total order (unique tiebreak) the cross-engine oracle needs.
  *
  * Per-group top-k uses row_number over a window: one shuffle on the group
  * key, early-filtered by Spark's WindowGroupLimit (rank<=k pushdown) so the
  * sort never materializes more than k rows per group in the final stage.
  */
object TopK {

  /** Global top-k with a guaranteed total order. */
  def global(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Top-k rows per group; emits `rank`. */
  def perGroup(df: DataFrame, k: Int, group: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(ordering: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
