package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Interval (range) join of a fact table against a small dimension of
  * [start, end] ranges.
  *
  * Reference: game → season assignment by
  * `date_key >= start AND date_key <= end`, where the 'lifetime' season
  * deliberately overlaps every other season so one fact row lands in ≥2
  * buckets (`/root/reference/frontend/generate_lookup_data.sh:602-604,646-649`;
  * season dim `/root/reference/parser/parse_matches.sh:158-184`).
  *
  * At 100 TB the dimension stays tiny (tens of rows), so the right plan is a
  * broadcast nested-loop join: zero shuffle of the fact side, predicate
  * evaluated in-place. For a *large* range side one would instead bucket both
  * sides by coarse time grain and equi-join on the bucket before the range
  * predicate; that variant is in [[bucketed]].
  */
object RangeJoin {

  /** Broadcast NLJ: every fact row joined to every overlapping half-open
    * [start, end) range. */
  def broadcastRange(fact: DataFrame, ranges: DataFrame,
                     ts: Column, start: Column, end: Column): DataFrame =
    fact.join(broadcast(ranges), ts >= start && ts < end)

  /** Scale path for a non-broadcastable range side: both sides exploded to a
    * coarse bucket key (caller supplies bucket columns of identical grain) so
    * Spark plans an equi shuffle join; the exact range predicate filters
    * in-join. */
  def bucketed(fact: DataFrame, ranges: DataFrame, factBucket: Column,
               rangeBucket: Column, ts: Column, start: Column, end: Column): DataFrame =
    fact.join(ranges, factBucket === rangeBucket && ts >= start && ts < end)
}
