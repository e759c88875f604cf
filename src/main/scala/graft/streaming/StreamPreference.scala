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
  *  - `totdelta/tick=<id>` (parquet, one dir per tick): the tick's exact
  *    per-(user, item) micro-sums. A user's current total is the SUM of
  *    their delta history — integer addition, associative, so any tick
  *    split reconstructs the same totals bit-for-bit.
  *  - `pairdelta/tick=<id>` (parquet, one dir per tick): the votes of
  *    the TOUCHED users only, retracted at their pre-tick totals
  *    (weight −1 per vote) and re-asserted at their post-tick totals
  *    (+1) — both through [[Preference.winsOf]], the ONE comparison
  *    body the batch path uses. Untouched users are never read beyond
  *    the semi-join prune on the totals history.
  *
  * Crash atomicity: a tick is TWO parquet writes, which cannot be made
  * atomic as a pair on a plain filesystem — so each tick writes into its
  * own `tick=<id>` subdirectories and becomes visible only when its
  * commit marker (`commits/<id>`, written LAST) exists. Every read path
  * ([[matrix]], [[ratings]], and the totals history a later tick folds
  * against) filters to committed ticks, so a crash between the writes
  * leaves partial files that are (a) invisible and (b) identifiable by
  * tick id. Recovery is a bare re-run of the same tick with the same id:
  * `mode(overwrite)` replaces the partials in place and the marker lands
  * last — no manual clearing step, no double count
  * (StreamPreferenceSpec replays a simulated partial tick and proves
  * batch parity). Replaying an already-COMMITTED id is refused — its
  * deltas are in the visible history and would double-count.
  *
  * Per-tick cost: O(tick events) + O(delta-history rows of touched
  * users) — never a corpus recompute. The live matrix is the k²-group
  * SUM over committed `pairdelta` (combinable, map-side partial);
  * ratings run [[Preference.mmRatings]] on the collected matrix, so a
  * tick's published ratings equal the batch q209 on the accumulated
  * events EXACTLY (StreamPreferenceSpec pins the parity, including a
  * tick that flips an earlier vote).
  */
object StreamPreference {

  private val TickId = "[A-Za-z0-9._-]+"

  private def commitsDir(stateDir: String) = new java.io.File(s"$stateDir/commits")

  /** Tick ids whose commit marker exists — the only ticks reads see. */
  def committedTicks(stateDir: String): Seq[String] =
    Option(commitsDir(stateDir).listFiles())
      .map(_.map(_.getName).toSeq.sorted).getOrElse(Seq.empty)

  /** Union of the committed per-tick dirs under `base`; `schemaOf.limit(0)`
    * when no tick has committed yet. Uncommitted dirs are never listed,
    * so a crashed tick's partials cannot leak into any read. */
  private def readLog(spark: SparkSession, base: String, stateDir: String,
                      schemaOf: DataFrame): DataFrame = {
    val dirs = committedTicks(stateDir).map(id => s"$base/tick=$id")
      .filter(d => new java.io.File(d).exists())
    if (dirs.isEmpty) schemaOf.limit(0)
    else spark.read.parquet(dirs: _*)
      .select(schemaOf.columns.map(col).toSeq: _*)
  }

  /** One tick: fold `events` (raw event rows — user_id, event_type,
    * value) into the state under `stateDir`, as tick `tickId` (caller-
    * supplied and stable across retries — drive ticks from a replayable
    * source, the StreamingCuration foreachBatch pattern, with the batch
    * id as the tick id). On any failure, re-run the SAME events under
    * the SAME id: the tick's directories are overwritten in place and
    * the commit marker — the only thing that makes the tick visible —
    * is written last. */
  def tick(spark: SparkSession, events: DataFrame, stateDir: String,
           tickId: String): Unit = {
    require(tickId.matches(TickId),
      s"tick id '$tickId' must match $TickId (it names directories)")
    require(!committedTicks(stateDir).contains(tickId),
      s"tick '$tickId' is already committed — replaying it would " +
        "double-count; recovery re-runs are for UNcommitted ticks only")
    val tickTot = Preference.microTotals(events)
      .localCheckpoint() // read twice (append + old/new vote diff)
    val totBase = s"$stateDir/totdelta"
    val pairBase = s"$stateDir/pairdelta"
    val hist = readLog(spark, totBase, stateDir, tickTot)
    // touched users' pre-tick totals: semi-join prune, then sum history
    val touched = tickTot.select(col("user_id")).distinct()
    val oldTot = hist
      .join(touched, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("tot")).as("tot"))
      .localCheckpoint() // pin: feeds both the retract and the new totals
    val newTot = oldTot
      .unionByName(tickTot)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("tot")).as("tot"))
    val retract = Preference.winsOf(oldTot)
      .select(col("winner"), col("loser"), (-col("w")).as("dw"))
    val assert_ = Preference.winsOf(newTot)
      .select(col("winner"), col("loser"), col("w").as("dw"))
    retract.unionByName(assert_)
      .write.mode("overwrite").parquet(s"$pairBase/tick=$tickId")
    tickTot.write.mode("overwrite").parquet(s"$totBase/tick=$tickId")
    // commit marker LAST — the tick becomes visible atomically
    val cd = commitsDir(stateDir)
    cd.mkdirs()
    java.nio.file.Files.createFile(new java.io.File(cd, tickId).toPath)
  }

  /** The live win matrix (winner, loser, w) — k²-group sum over the
    * committed pair-delta log; zero-sum (fully retracted / tied-away)
    * pairs drop. */
  def matrix(spark: SparkSession, stateDir: String): DataFrame = {
    val empty = spark.range(0).select(lit("").as("winner"),
      lit("").as("loser"), lit(0L).as("dw")).limit(0)
    readLog(spark, s"$stateDir/pairdelta", stateDir, empty)
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
