package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic group-member concatenation ("team identity").
  *
  * Reference: `group_concat(player_id)` per match builds the team key; its
  * order is SQLite view order — implicit and fragile
  * (`/root/reference/parser/parse_matches.sh:389-390`). In Spark,
  * `collect_list` order is partition-dependent, so determinism must be
  * imposed: `sort_array(collect_list(...))` then `concat_ws`. Same rule for
  * roster arrays (`array_sort` on collected structs).
  *
  * At 100 TB: one hash aggregation on the group key; member lists are small
  * (team-sized), so collect_list buffers stay tiny. Never use this pattern
  * when per-group cardinality is unbounded.
  */
object TeamKey {

  /** Adds `team_key` = comma-joined sorted distinct member ids per group. */
  def teamKey(df: DataFrame, group: Column, member: Column): DataFrame =
    df.groupBy(group)
      .agg(
        concat_ws(",", sort_array(collect_set(member.cast("string")))).as("team_key"),
        count(lit(1)).as("n_members"))
}
