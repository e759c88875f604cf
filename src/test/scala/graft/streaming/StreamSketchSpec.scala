package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Cms

/** Batch↔stream parity for the Count-Min sketch on a SHARED fixture:
  * the streaming counter table after two ticks must equal the batch
  * build over the union of both ticks, cell for cell — structural
  * parity (same bucketExpr) verified end-to-end, the same discipline
  * as the q90/StreamFunnel and q27/StreamNearDup parity specs. */
class StreamSketchSpec extends SparkSpec {

  private val D = 4
  private val W = 64

  test("streaming CMS counters equal the batch build over both ticks") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tick1 = (1 to 30).flatMap(u => Seq.fill(u % 5 + 1)(u.toLong))
    val tick2 = (20 to 50).flatMap(u => Seq.fill(u % 3 + 1)(u.toLong))

    val mem = MemoryStream[Long]
    val counters = StreamSketch.cmsCounters(
      mem.toDF().toDF("user_id"), "CAST(user_id AS STRING)", D, W)
    val q = counters.writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      mem.addData(tick1: _*)
      q.processAllAvailable()
      mem.addData(tick2: _*)
      q.processAllAvailable()

      val streamed = spark.sql("SELECT d, bucket, c FROM cms")
        .as[(Int, Long, Long)].collect().toSet
      val batch = Cms.counters(
          (tick1 ++ tick2).toDF("user_id"), "CAST(user_id AS STRING)", D, W)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streaming counter table must equal the batch build cell-for-cell")

      // and the live sketch answers point queries with the CMS guarantee
      val exact = (tick1 ++ tick2).groupBy(identity).view.mapValues(_.size)
      val est = Cms.estimate(
          Seq(7L, 25L, 42L).toDF("user_id"),
          spark.sql("SELECT d, bucket, c FROM cms"),
          "CAST(user_id AS STRING)", D, W)
        .as[(Long, Long)].collect().toMap
      Seq(7L, 25L, 42L).foreach { u =>
        assert(est(u) >= exact(u).toLong,
          s"estimate for $u must never undercount")
      }
    } finally q.stop()
  }
}
