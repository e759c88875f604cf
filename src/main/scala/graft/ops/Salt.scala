package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys: two-phase salted aggregation.
  *
  * Reference-relevant because "pro" players carry ~10× the match volume
  * (`/root/reference/README.md:66`, SURVEY.md §7.5.9): a groupBy on
  * player lands those keys on single reducers. AQE's skew handling covers
  * joins; for aggregations the classic fix is explicit salting —
  * phase 1 aggregates on (key, salt) spreading each hot key over
  * `saltBuckets` reducers, phase 2 merges the partials on the key alone.
  *
  * Only algebraic aggregates (sum/count/min/max) compose this way — the
  * caller supplies the partial aggs and the merge aggs. At 100 TB this
  * turns a single 10×-skewed reducer into `saltBuckets` even ones at the
  * cost of a second (tiny, pre-aggregated) shuffle.
  */
object Salt {

  /** Two-phase aggregation: `partials` computed per (keys..., salt),
    * then `merges` per keys. Salt is deterministic per row via a hash of
    * `saltSource` (stable across retries — never rand(), which breaks
    * task redeterminism). */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltSource: Column,
                saltBuckets: Int, partials: Seq[Column],
                merges: Seq[Column]): DataFrame = {
    // same reserved-name guard discipline as ShardPlan/AsofJoin/Cms
    require(!df.columns.contains("_salt"),
      "Salt.saltedAgg: input already has a column named '_salt' (reserved)")
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(saltBuckets)))
    salted.groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }
}
