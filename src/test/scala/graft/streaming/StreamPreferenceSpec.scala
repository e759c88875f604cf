package graft.streaming

import graft.SparkSpec
import graft.ops.Preference

/** Incremental == batch for the preference state: any tick split of the
  * event history must yield the same win matrix and the same ratings as
  * one batch pass over the union — INCLUDING a tick that flips a vote
  * an earlier tick already counted (the retract/re-assert path the
  * pair-delta log exists for), and INCLUDING a tick that crashed
  * between its two writes (the commit-marker protocol: partials are
  * invisible and a same-id re-run restores parity). */
class StreamPreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def toEvents(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("event_id", "user_id", "event_type", "value")

  test("three ticks with a vote flip equal the batch pass over the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spref").toString
    // tick 1: u10 prefers paper (3.0) over rock (2.0); u20 rock over paper
    val t1 = Seq(
      (1L, 10L, "paper", 3.0), (2L, 10L, "rock", 2.0),
      (3L, 20L, "rock", 3.0), (4L, 20L, "paper", 1.0))
    // tick 2: u10's rock surges +5.0 → u10 FLIPS to rock (7.0 > 3.0);
    // u30 arrives with scissors > rock
    val t2 = Seq(
      (5L, 10L, "rock", 5.0),
      (6L, 30L, "scissors", 4.0), (7L, 30L, "rock", 1.0))
    // tick 3: u20's paper rises to an exact TIE with rock (3.0 == 3.0)
    // → u20's vote must be retracted and NOT re-asserted
    val t3 = Seq((8L, 20L, "paper", 2.0))
    Seq(("t1", t1), ("t2", t2), ("t3", t3)).foreach { case (id, t) =>
      StreamPreference.tick(spark, toEvents(t), dir, id) }
    assert(StreamPreference.committedTicks(dir) == Seq("t1", "t2", "t3"))

    val batch = Preference
      .winsOf(Preference.microTotals(toEvents(t1 ++ t2 ++ t3)))
      .as[(String, String, Long)].collect().toSet
    val streamed = StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    // the flip and the tie are actually in the expected matrix
    assert(batch == Set(("rock", "paper", 1L), ("scissors", "rock", 1L)))

    val batchRatings = Preference.mmRatings(batch.toSeq)
    assert(StreamPreference.ratings(spark, dir) == batchRatings)
    assert(batchRatings.head._1 == "scissors") // beat the rock that beat paper

    // replaying a COMMITTED tick is an idempotent NO-OP (a foreachBatch
    // driver replays a batch after a crash between sink write and
    // offset commit): state must be byte-identical after the replay
    StreamPreference.tick(spark, toEvents(t3), dir, "t3")
    assert(StreamPreference.committedTicks(dir) == Seq("t1", "t2", "t3"))
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch)
    assert(StreamPreference.ratings(spark, dir) == batchRatings)

    // compact folds the three ticks into one snapshot with identical
    // state, and a later tick folds against the snapshot seamlessly
    val snap = StreamPreference.compact(spark, dir)
    assert(snap.isDefined)
    assert(StreamPreference.committedTicks(dir) == Seq(snap.get))
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch)
    assert(StreamPreference.ratings(spark, dir) == batchRatings)
    // superseded dirs are actually gone (lazy cleanup ran)
    assert(!new java.io.File(s"$dir/pairdelta/tick=t1").exists())
    val t4 = Seq((9L, 40L, "paper", 5.0), (10L, 40L, "scissors", 1.0))
    StreamPreference.tick(spark, toEvents(t4), dir, "t4")
    val batch4 = Preference
      .winsOf(Preference.microTotals(toEvents(t1 ++ t2 ++ t3 ++ t4)))
      .as[(String, String, Long)].collect().toSet
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch4)
    // nothing to fold twice: a single-tick... (snapshot + t4 = 2 ticks)
    val snap2 = StreamPreference.compact(spark, dir)
    assert(snap2.isDefined && snap2 != snap)
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch4)
    assert(StreamPreference.compact(spark, dir).isEmpty) // 1 tick left
  }

  test("legacy flat-layout state fails loudly instead of reading empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spref3").toString
    // fabricate the pre-commit-marker layout: parquet directly under
    // pairdelta, no commits/ dir
    Seq(("a", "b", 1L)).toDF("winner", "loser", "dw")
      .write.parquet(s"$dir/pairdelta")
    val e = intercept[IllegalArgumentException](
      StreamPreference.matrix(spark, dir))
    assert(e.getMessage.contains("pre-commit-marker layout"))
    val e2 = intercept[IllegalArgumentException](
      StreamPreference.tick(spark,
        toEvents(Seq((1L, 10L, "a", 1.0))), dir, "t1"))
    assert(e2.getMessage.contains("pre-commit-marker layout"))
  }

  test("single tick equals batch; empty state reads as empty matrix") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spref1").toString
    assert(StreamPreference.matrix(spark, dir).count() == 0)
    assert(StreamPreference.ratings(spark, dir).isEmpty)
    val t = Seq(
      (1L, 10L, "a", 2.0), (2L, 10L, "b", 1.0), (3L, 11L, "a", 1.5),
      (4L, 11L, "b", 2.5))
    StreamPreference.tick(spark, toEvents(t), dir, "t1")
    val batch = Preference.winsOf(Preference.microTotals(toEvents(t)))
      .as[(String, String, Long)].collect().toSet
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch)
    assert(batch == Set(("a", "b", 1L), ("b", "a", 1L)))
  }

  test("a tick that crashed between its writes is invisible and a " +
      "same-id re-run restores batch parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spref2").toString
    val t1 = Seq(
      (1L, 10L, "paper", 3.0), (2L, 10L, "rock", 2.0),
      (3L, 20L, "rock", 3.0), (4L, 20L, "paper", 1.0))
    StreamPreference.tick(spark, toEvents(t1), dir, "t1")

    // Simulate the documented crash window for tick t2: the pair log
    // was written but the totals log and the commit marker were NOT.
    // Reproduce it by running the real tick, then deleting its totals
    // dir and commit marker — exactly the on-disk state a crash between
    // the two writes leaves behind.
    val t2 = Seq((5L, 10L, "rock", 5.0), (6L, 30L, "scissors", 4.0),
      (7L, 30L, "rock", 1.0))
    StreamPreference.tick(spark, toEvents(t2), dir, "t2")
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    rmTree(java.nio.file.Paths.get(s"$dir/totdelta/tick=t2"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/commits/t2"))
    // partial pairdelta exists on disk, identifiable by its tick id...
    assert(new java.io.File(s"$dir/pairdelta/tick=t2").exists())
    // ...but is invisible: state reads as of t1 only
    assert(StreamPreference.committedTicks(dir) == Seq("t1"))
    val afterT1 = Preference
      .winsOf(Preference.microTotals(toEvents(t1)))
      .as[(String, String, Long)].collect().toSet
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == afterT1)

    // recovery = re-run the SAME tick under the SAME id (no manual
    // clearing): overwrite replaces the partials, marker lands last
    StreamPreference.tick(spark, toEvents(t2), dir, "t2")
    val batch = Preference
      .winsOf(Preference.microTotals(toEvents(t1 ++ t2)))
      .as[(String, String, Long)].collect().toSet
    assert(StreamPreference.matrix(spark, dir)
      .as[(String, String, Long)].collect().toSet == batch)
    assert(StreamPreference.ratings(spark, dir) ==
      Preference.mmRatings(batch.toSeq))
  }
}
