package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming idempotent ingest (S5 twin): duplicate keys are dropped
  * across micro-batches, first arrival wins. */
class StreamDedupSpec extends SparkSpec {

  test("re-delivered keys are dropped across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val mem = MemoryStream[(String, String, java.sql.Timestamp, Double)]
    val deduped = StreamDedup.firstArrivalOnly(
      mem.toDF().toDF("game_id", "player_uno_id", "ended_at", "kills"),
      "ended_at", "2 hours", Seq("game_id", "player_uno_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_s5")
      .outputMode("append").start()
    try {
      // batch 1: m1 delivered twice in the same batch (kills differ: the
      // first arrival must win), m2 once
      mem.addData(("m1", "alice", ts(1000L), 5.0), ("m1", "alice", ts(1000L), 99.0),
                  ("m2", "alice", ts(2000L), 3.0))
      q.processAllAvailable()
      // batch 2: m1 re-delivered AGAIN (cross-batch), plus a new key
      mem.addData(("m1", "alice", ts(1000L), 77.0), ("m3", "bob", ts(3000L), 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT game_id, player_uno_id, kills FROM dedup_s5")
        .as[(String, String, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
      assert(got.map(r => (r._1, r._2)) == Seq(
        ("m1", "alice"), ("m2", "alice"), ("m3", "bob")))
      // first arrival's payload survived, not a later re-delivery's
      assert(got.find(_._1 == "m1").get._3 == 5.0)
    } finally q.stop()
  }

  test("same key for different players is NOT a duplicate (composite key)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val mem = MemoryStream[(String, String, java.sql.Timestamp, Double)]
    val deduped = StreamDedup.firstArrivalOnly(
      mem.toDF().toDF("game_id", "player_uno_id", "ended_at", "kills"),
      "ended_at", "2 hours", Seq("game_id", "player_uno_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_s5b")
      .outputMode("append").start()
    try {
      mem.addData(("m1", "alice", ts(1000L), 5.0), ("m1", "bob", ts(1000L), 2.0))
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM dedup_s5b").as[Long].head()
      assert(n == 2L) // one game, two tracked players -> two fact rows
    } finally q.stop()
  }
}
