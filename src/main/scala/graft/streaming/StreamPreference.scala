package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Preference

/** Incrementally-maintained pairwise-preference state — the streaming
  * twin of the q209/q210 batch pair, for the reward-data loop that
  * ingests preference signals continuously and re-publishes ratings per
  * tick instead of recomputing the corpus.
  *
  * Why the naive stream dies at scale: a user's new events change that
  * user's totals, which can FLIP any of the user's pairwise votes — so
  * the win matrix is not an append-only aggregate of the event stream.
  * The incremental contract here is the q107/q186 O(delta) discipline:
  *
  *  - `totdelta` (append-only parquet): each tick appends the tick's
  *    exact per-(user, item) micro-sums. A user's current total is the
  *    SUM of their delta history — integer addition, associative, so
  *    any tick split reconstructs the same totals bit-for-bit.
  *  - `pairdelta` (append-only parquet): per tick, the votes of the
  *    TOUCHED users only are retracted at their pre-tick totals
  *    (weight −1 per vote) and re-asserted at their post-tick totals
  *    (+1) — both through [[Preference.winsOf]], the ONE comparison
  *    body the batch path uses. Untouched users are never read beyond
  *    the semi-join prune on `totdelta`.
  *
  * Per-tick cost: O(tick events) + O(delta-history rows of touched
  * users) — never a corpus recompute. The live matrix is the k²-group
  * SUM over `pairdelta` (combinable, map-side partial); ratings run
  * [[Preference.mmRatings]] on the collected matrix, so a tick's
  * published ratings equal the batch q209 on the accumulated events
  * EXACTLY (StreamPreferenceSpec pins the parity, including a tick
  * that flips an earlier vote).
  */
object StreamPreference {

  private def stateTable(spark: SparkSession, path: String,
                         schemaOf: DataFrame): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else schemaOf.limit(0)

  /** One tick: fold `events` (raw event rows — user_id, event_type,
    * value) into the state under `stateDir`.
    *
    * Write order: the pair log is appended BEFORE the totals log, and
    * old totals are pinned (localCheckpoint) before either write — a
    * tick never reads its own appends. The two appends are not atomic
    * as a pair; drive ticks from a replayable source (the
    * StreamingCuration foreachBatch pattern) and re-run the whole tick
    * on failure only after clearing the tick's partial files. */
  def tick(spark: SparkSession, events: DataFrame, stateDir: String): Unit = {
    val tickTot = Preference.microTotals(events)
      .localCheckpoint() // read twice (append + old/new vote diff)
    val totPath = s"$stateDir/totdelta"
    val pairPath = s"$stateDir/pairdelta"
    val hist = stateTable(spark, totPath, tickTot)
    // touched users' pre-tick totals: semi-join prune, then sum history
    val touched = tickTot.select(col("user_id")).distinct()
    val oldTot = hist
      .join(touched, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("tot")).as("tot"))
      .localCheckpoint() // state must be read BEFORE totdelta is appended
    val newTot = oldTot
      .unionByName(tickTot)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("tot")).as("tot"))
    val retract = Preference.winsOf(oldTot)
      .select(col("winner"), col("loser"), (-col("w")).as("dw"))
    val assert_ = Preference.winsOf(newTot)
      .select(col("winner"), col("loser"), col("w").as("dw"))
    retract.unionByName(assert_)
      .write.mode("append").parquet(pairPath)
    tickTot.write.mode("append").parquet(totPath)
  }

  /** The live win matrix (winner, loser, w) — k²-group sum over the
    * pair-delta log; zero-sum (fully retracted / tied-away) pairs drop. */
  def matrix(spark: SparkSession, stateDir: String): DataFrame = {
    val pairPath = s"$stateDir/pairdelta"
    if (!new java.io.File(pairPath).exists())
      return spark.range(0).select(lit("").as("winner"), lit("").as("loser"),
        lit(0L).as("w")).limit(0)
    spark.read.parquet(pairPath)
      .groupBy(col("winner"), col("loser"))
      .agg(sum(col("dw")).as("w"))
      .filter(col("w") > 0)
  }

  /** Current Bradley–Terry ratings — [[Preference.mmRatings]] on the
    * collected live matrix, identical to batch q209's publication. */
  def ratings(spark: SparkSession, stateDir: String)
      : Seq[(String, Long, Long, Long, Long)] =
    Preference.mmRatings(
      matrix(spark, stateDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
}
