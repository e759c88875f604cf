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
  * batch parity). Replaying an already-COMMITTED id is an idempotent
  * NO-OP: the documented driver (foreachBatch with the batch id as the
  * tick id) replays a batch after a crash between the sink write and
  * the checkpoint offset commit, and a replayable source re-delivers
  * the identical deltas — they are already visible, so skipping
  * preserves exactly-once (refusing would wedge the stream in a
  * restart/replay loop; the codstats Pipeline handles the same window
  * idempotently via anti-join).
  *
  * Long-lived streams: every tick adds two directories, and the
  * committed-log union's file count grows without bound — [[compact]]
  * folds all committed ticks into ONE snapshot tick under the same
  * commit-marker discipline. The snapshot's marker CONTAINS the ids it
  * supersedes and is published by a single atomic rename, so there is
  * no window where both the snapshot and its inputs are visible (or
  * neither is); superseded dirs are deleted lazily afterwards, and a
  * crashed cleanup just re-deletes on the next compact.
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

  // no leading dot: dot-prefixed names are reserved for in-flight
  // temp markers, which committedTicks ignores
  private val TickId = "[A-Za-z0-9_-][A-Za-z0-9._-]*"

  private def commitsDir(stateDir: String) = new java.io.File(s"$stateDir/commits")

  /** Tick ids whose commit marker exists, MINUS ids superseded by a
    * snapshot marker ([[compact]] writes the folded ids into its marker
    * body) — the only ticks reads see. Exclusion is computed over every
    * present marker's body, so a lagging cleanup (superseded markers
    * still on disk next to the snapshot's) changes nothing. */
  def committedTicks(stateDir: String): Seq[String] = {
    val files = Option(commitsDir(stateDir).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filterNot(_.getName.startsWith(".")) // in-flight temp markers
    val superseded = files.flatMap { f =>
      scala.util.Try(java.nio.file.Files.readString(f.toPath))
        .getOrElse("").split('\n').map(_.trim).filter(_.nonEmpty)
    }.toSet
    files.map(_.getName).filterNot(superseded).sorted
  }

  /** Fails loudly on a pre-commit-marker layout: parquet written
    * DIRECTLY under totdelta/pairdelta (no `tick=` level). Such state
    * would otherwise silently read as empty — every accumulated delta
    * dropped — because [[readLog]] only lists committed tick dirs. */
  private def checkLayout(stateDir: String): Unit =
    Seq("totdelta", "pairdelta").foreach { base =>
      val entries = Option(new java.io.File(s"$stateDir/$base").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
      val legacy = entries.filterNot { f =>
        f.getName.startsWith("tick=") || f.getName.startsWith(".") ||
          f.getName.startsWith("_")
      }
      require(legacy.isEmpty,
        s"$stateDir/$base holds non-tick entries " +
          s"(${legacy.take(3).map(_.getName).mkString(", ")}…) — this " +
          "looks like state from the pre-commit-marker layout, which " +
          "this version would silently read as EMPTY. Migrate it: move " +
          s"the parquet under $base/tick=<id>/ (one id per ingest " +
          "batch, or a single 'legacy' id) and touch commits/<id>.")
    }

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
    checkLayout(stateDir)
    // idempotent replay: a committed id's deltas are already visible —
    // a replayable source re-delivering the same batch (foreachBatch
    // crash between sink write and offset commit) must be a no-op, not
    // a permanent restart/replay wedge
    if (committedTicks(stateDir).contains(tickId)) {
      System.err.println(s"[StreamPreference] tick '$tickId' already " +
        "committed; replay skipped (exactly-once no-op)")
      return
    }
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
    checkLayout(stateDir)
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

  /** Folds every committed tick into ONE snapshot tick, bounding the
    * [[readLog]] union's directory/file count for long-lived streams.
    * Both logs are integer-delta sums, so the fold is the associative
    * re-aggregation (zero-sum rows drop — they can never influence a
    * later fold or read).
    *
    * Atomicity: the snapshot's data dirs are written first (invisible —
    * no marker), then its marker is published by ONE atomic rename; the
    * marker's BODY lists the superseded tick ids, which
    * [[committedTicks]] excludes whether or not their own markers are
    * still on disk — so no crash point shows double or missing state.
    * The snapshot id is a content hash of the folded ids: a crashed
    * compact re-run recomputes the same id and overwrites its own
    * partials, same as a crashed [[tick]]. Superseded dirs/markers are
    * deleted lazily after publication. Returns the snapshot id (or
    * None when there is nothing to fold). */
  def compact(spark: SparkSession, stateDir: String): Option[String] = {
    checkLayout(stateDir)
    val ticks = committedTicks(stateDir)
    if (ticks.size <= 1) return None
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(ticks.mkString("\n").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val id = s"compact-$digest"
    val totBase = s"$stateDir/totdelta"
    val pairBase = s"$stateDir/pairdelta"
    val emptyTot = spark.range(0).select(lit(0L).as("user_id"),
      lit("").as("event_type"), lit(0L).as("tot")).limit(0)
    val emptyPair = spark.range(0).select(lit("").as("winner"),
      lit("").as("loser"), lit(0L).as("dw")).limit(0)
    readLog(spark, totBase, stateDir, emptyTot)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("tot")).as("tot")).filter(col("tot") =!= 0L)
      .write.mode("overwrite").parquet(s"$totBase/tick=$id")
    readLog(spark, pairBase, stateDir, emptyPair)
      .groupBy(col("winner"), col("loser"))
      .agg(sum(col("dw")).as("dw")).filter(col("dw") =!= 0L)
      .write.mode("overwrite").parquet(s"$pairBase/tick=$id")
    // publish: body = superseded ids, single atomic rename
    val cd = commitsDir(stateDir)
    cd.mkdirs()
    val tmp = new java.io.File(cd, s".tmp-$id").toPath
    java.nio.file.Files.writeString(tmp, ticks.mkString("\n"))
    java.nio.file.Files.move(tmp, new java.io.File(cd, id).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // lazy cleanup — correctness never depends on it
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => scala.util.Try(java.nio.file.Files.delete(f)))
    }
    ticks.foreach { t =>
      rmTree(java.nio.file.Paths.get(s"$totBase/tick=$t"))
      rmTree(java.nio.file.Paths.get(s"$pairBase/tick=$t"))
      scala.util.Try(java.nio.file.Files
        .deleteIfExists(new java.io.File(cd, t).toPath))
    }
    Some(id)
  }
}
