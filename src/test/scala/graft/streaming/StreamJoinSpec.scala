package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join: pairs within the horizon across batch
  * boundaries, nothing outside it, late rows dropped by the watermark. */
class StreamJoinSpec extends SparkSpec {

  case class Click(user_id: Long, click_id: Long, ts: Timestamp)
  case class Purchase(user_id: Long, purchase_id: Long, ts: Timestamp)

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  test("e2e: pairs within horizon emit (incl. cross-batch); outside never") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.clickAttribution(
      clicks.toDF(), purchases.toDF(), horizonSec = 60)
    val q = joined.writeStream.format("memory").queryName("sj_pairs")
      .outputMode("append").start()
    try {
      // batch 1: user 1 clicks twice; user 2 clicks; one purchase by
      // user 1 lands in the SAME batch 30s after click 10.
      clicks.addData(
        Click(1L, 10L, ts("2026-01-01 10:00:00")),
        Click(1L, 11L, ts("2026-01-01 10:00:20")),
        Click(2L, 20L, ts("2026-01-01 10:00:00")))
      purchases.addData(Purchase(1L, 100L, ts("2026-01-01 10:00:30")))
      q.processAllAvailable()
      // batch 2: user 2's purchase arrives a batch later, 40s after its
      // click (matches); user 1 purchases again 2h later (outside every
      // click's horizon — must NOT match).
      purchases.addData(
        Purchase(2L, 200L, ts("2026-01-01 10:00:40")),
        Purchase(1L, 101L, ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT click_id, purchase_id, latency_s FROM sj_pairs " +
          "ORDER BY click_id, purchase_id")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq(
        (10L, 100L, 30L),  // same-batch pair
        (11L, 100L, 10L),  // interval semantics: EVERY click in horizon
        (20L, 200L, 40L))) // cross-batch pair through buffered state
    } finally q.stop()
  }

  test("parity: streaming interval join matches batch q115's pair set on sf0.001") {
    // Shared-fixture equivalence: the SAME events table drives batch q115
    // (bucketed interval join, 1h linear-attribution horizon) and the
    // stream-stream join; the attributed (purchase, click) pair sets must
    // agree. The one documented seam: the stream's horizon is CLOSED at
    // +1h while q115's is open, so exact-boundary pairs (gap == horizon)
    // are excluded from the compare using gaps computed from the fixture.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val horizonUs = 3600L * 1000000L
    val batchPairs = graft.SparkEntry.queries("q115_linear_attribution")(spark, dir)
      .select(col("purchase_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet
    val e = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val clickRows = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect().sortBy(_._3.getTime)
      .map { case (u, id, t) => Click(u, id, t) }
    val purchaseRows = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect().sortBy(_._3.getTime)
      .map { case (u, id, t) => Purchase(u, id, t) }
    val usOf = e.select(col("event_id"), col("ts_us"))
      .as[(Long, Long)].collect().toMap
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    // delay far beyond the fixture's span: parity isolates JOIN semantics;
    // watermark-drop behavior has its own spec below
    val joined = StreamJoin.clickAttribution(
      clicks.toDF(), purchases.toDF(), horizonSec = 3600, delay = "3650 days")
    val q = joined.writeStream.format("memory").queryName("sj_parity")
      .outputMode("append").start()
    try {
      // both sides fed in event-time order across two micro-batches
      val (c1, c2) = clickRows.splitAt(clickRows.length / 2)
      val (p1, p2) = purchaseRows.splitAt(purchaseRows.length / 2)
      clicks.addData(c1.toSeq); purchases.addData(p1.toSeq)
      q.processAllAvailable()
      clicks.addData(c2.toSeq); purchases.addData(p2.toSeq)
      q.processAllAvailable()
      val got = spark.sql("SELECT purchase_id, click_id FROM sj_parity")
        .as[(Long, Long)].collect().toSet
      val gotOpen = got.filterNot { case (p, c) => usOf(p) - usOf(c) == horizonUs }
      assert(batchPairs.nonEmpty) // the fixture genuinely attributes
      assert(gotOpen == batchPairs)
    } finally q.stop()
  }

  test("a click older than the watermark is dropped, not joined") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoin.clickAttribution(
      clicks.toDF(), purchases.toDF(), horizonSec = 60, delay = "10 seconds")
    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode("append").start()
    try {
      // advance both watermarks far past 10:00 (to ~11:59:50)
      clicks.addData(Click(9L, 90L, ts("2026-01-01 12:00:00")))
      purchases.addData(Purchase(9L, 900L, ts("2026-01-01 12:00:05")))
      q.processAllAvailable()
      // now a click at 10:00 arrives 2h late, with a purchase 5s after
      // it: the click is behind the watermark — dropped, no pair.
      clicks.addData(Click(5L, 50L, ts("2026-01-01 10:00:00")))
      purchases.addData(Purchase(5L, 500L, ts("2026-01-01 10:00:05")))
      q.processAllAvailable()
      val got = spark.sql("SELECT click_id, purchase_id FROM sj_late " +
          "ORDER BY click_id")
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((90L, 900L)))
    } finally q.stop()
  }
}
