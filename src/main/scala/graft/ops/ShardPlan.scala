package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boustrophedon (snake) shard assignment — near-equal byte mass per
  * output shard without a greedy bin-packing loop: within each group,
  * rows rank by size (desc, id tiebreak) and blocks of k deal
  * alternately 0..k−1 then k−1..0, so consecutive blocks pair the
  * largest remainder with the smallest and monotone size runs cancel
  * (a strictly decreasing sequence balances perfectly; hash-sharding
  * is ±√n). The oracle-verified query form is `q105_shard_plan`; the
  * curation pipeline uses this same code for its release layout.
  *
  * Scale shape: the rank window is PER GROUP (pass the source/partition
  * columns), never a global sort; the assignment itself is map-side
  * arithmetic over the rank. Writing is then `partitionBy(..., "shard")`.
  */
object ShardPlan {

  /** Add a `shard` column in [0, k).
    *
    * @param sizeCol  byte/token mass to balance on
    * @param idCol    unique tiebreak so the ranking is deterministic
    * @param groupBy  rank-window partition columns (e.g. source); empty
    *                 means one global group — only for dimension-sized
    *                 inputs, a corpus must pass its natural grouping
    */
  def assign(df: DataFrame, sizeCol: String, idCol: String,
             groupBy: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"shard count must be >= 1, got $k")
    // `shard` is the reserved output name; arbitrary curated frames route
    // through here, so an existing column of that name must fail loudly
    // rather than be silently overwritten.
    require(!df.columns.contains("shard"),
      "ShardPlan.assign reserves output column 'shard'; rename or drop the input's")
    val r = "__graft_shard_rank"
    require(!df.columns.contains(r), s"ShardPlan.assign reserves temp column $r")
    val w = Window.partitionBy(groupBy.map(col): _*)
      .orderBy(desc(sizeCol), col(idCol))
    df.withColumn(r, (row_number().over(w) - 1).cast("long"))
      .withColumn("shard", expr(
        s"CASE WHEN ($r DIV $k) % 2 = 0 THEN $r % $k " +
        s"ELSE ${k - 1} - ($r % $k) END"))
      .drop(r)
  }

  /** Per-shard mass audit over an assigned frame: (shard, n_docs, mass,
    * mass per-mille of total). k-sized input → the windows are cheap. */
  def audit(assigned: DataFrame, sizeCol: String): DataFrame = {
    val total: Column = sum(col("mass")).over(Window.partitionBy())
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("mass"))
      .withColumn("total", total)
      .withColumn("mass_pm", expr("(1000 * mass) DIV total"))
      .drop("total")
      .orderBy(col("shard"))
  }
}
