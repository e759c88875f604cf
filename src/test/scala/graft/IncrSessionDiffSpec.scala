package graft

import java.sql.Timestamp

/** Round-8 additions: incremental sessionization (q191) and the
  * partition-checksum diff (q192) on planted fixtures. */
class IncrSessionDiffSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)
  private def us(s0: String): Long = ts(s0).getTime * 1000L

  test("q191: a session spanning the batch cut stitches; a wide boundary gap does not") {
    val d = java.nio.file.Files.createTempDirectory("graft_isess").toString
    // cut is 2024-01-16 00:00; gap threshold 2h
    val rows = Seq(
      // user 1: boundary gap 1h → the two batches STITCH into one session
      (1L, "2024-01-15 23:30:00", 1L),
      (2L, "2024-01-16 00:30:00", 1L),
      // user 2: a closed early session, then a boundary gap of 3h → NO
      // stitch; the carried session stays, the new one renumbers after it
      (3L, "2024-01-10 10:00:00", 2L),
      (4L, "2024-01-15 23:00:00", 2L),
      (5L, "2024-01-16 02:00:00", 2L),
      // user 3: second batch only → plain session 1
      (6L, "2024-01-20 12:00:00", 3L))
      .map { case (id, t, u) => (id, ts(t), u, "click", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q191_incr_sessionize")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, us("2024-01-15 23:30:00"), us("2024-01-16 00:30:00"), 200L),
      (2L, 1L, 1L, us("2024-01-10 10:00:00"), us("2024-01-10 10:00:00"), 100L),
      (2L, 2L, 1L, us("2024-01-15 23:00:00"), us("2024-01-15 23:00:00"), 100L),
      (2L, 3L, 1L, us("2024-01-16 02:00:00"), us("2024-01-16 02:00:00"), 100L),
      (3L, 1L, 1L, us("2024-01-20 12:00:00"), us("2024-01-20 12:00:00"), 100L)))
  }

  test("q192: checksum verdicts classify months; only non-same months are refreshed") {
    val d = java.nio.file.Files.createTempDirectory("graft_pdiff").toString
    // version rules (q85's fixture): A = date < 1999; B = date < 2000
    // minus keys % 101, with status rewritten on keys % 97
    val rows = Seq(
      (1L, "O", 10.0, "1998-01-15 00:00:00"),  // same in both
      (97L, "O", 20.0, "1998-02-15 00:00:00"), // status rewritten → changed
      (101L, "O", 40.0, "1998-03-15 00:00:00"), // dropped from B → removed
      (5L, "O", 80.0, "1999-03-15 00:00:00"))   // only in B → added
      .map { case (k, st, p, dt) => (k, 1L, st, p, ts(dt)) }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q192_partition_diff")(spark, d)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1998-01", "same", 1L, 1L, 0L),
      ("1998-02", "changed", 1L, 1L, 2000L),
      ("1998-03", "removed", 1L, 0L, 0L),
      ("1999-03", "added", 0L, 1L, 8000L)))
  }
}
