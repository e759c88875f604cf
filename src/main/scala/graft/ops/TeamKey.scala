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

  /** Adds `team_key` = comma-joined numerically-sorted distinct member ids
    * per group. Members stay numeric through the shuffle and the set —
    * stringification happens once per GROUP after sorting, not once per
    * row before it (collect_set of 8-byte longs beats a set of strings at
    * every scale). */
  def teamKey(df: DataFrame, group: Column, member: Column): DataFrame =
    df.groupBy(group)
      .agg(
        concat_ws(",",
          transform(sort_array(collect_set(member)), m => m.cast("string")))
          .as("team_key"),
        // distinct members, NOT rows: with duplicate member rows per group
        // the two disagree and n_members must track the deduped team_key.
        // Catalyst dedups the two identical collect_set aggregate buffers.
        size(collect_set(member)).cast("long").as("n_members"))
}
