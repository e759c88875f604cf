package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming token-rate meter: finalized per-window rates in append mode,
  * watermark-dropped late rows, per-source keying. */
class StreamMeterSpec extends SparkSpec {

  test("windows finalize once the watermark passes; late docs are dropped") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val rates = StreamMeter.tokenRates(
      mem.toDF().toDF("ended_at", "source", "text"),
      "ended_at", "10 minutes", "5 minutes")
    val q = rates.writeStream.format("memory").queryName("meter")
      .outputMode("append").start()
    try {
      // window [0,600): 2 srcA docs (3+2 tokens), 1 srcB doc (1 token)
      mem.addData((ts(10), "srcA", "a b c"), (ts(550), "srcA", "d e"),
                  (ts(20), "srcB", "x"))
      q.processAllAvailable()
      // nothing emitted yet: watermark has not passed any window end
      assert(spark.sql("SELECT COUNT(*) FROM meter").as[Long].head() == 0L)

      // an event at t=1300 moves the watermark to 1300-300=1000 > 600:
      // the first window finalizes and emits
      mem.addData((ts(1300), "srcA", "f g h i"))
      q.processAllAvailable()
      val w0 = spark.sql(
        "SELECT source, n_docs, n_toks FROM meter WHERE unix_timestamp(window_start) = 0")
        .as[(String, Long, Long)].collect().toSet
      assert(w0 == Set(("srcA", 2L, 5L), ("srcB", 1L, 1L)))

      // a LATE srcB doc for the finalized window arrives; the watermark
      // (1000) is past it — it must not revise the emitted rate
      mem.addData((ts(30), "srcB", "late late late"))
      q.processAllAvailable()
      val n = spark.sql(
        "SELECT COUNT(*) FROM meter WHERE unix_timestamp(window_start) = 0")
        .as[Long].head()
      assert(n == 2L, "finalized window must not re-emit for a late arrival")
    } finally q.stop()
  }
}
