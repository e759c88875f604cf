package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ops.QuantileSketch

/** Batch↔stream parity for the mergeable quantile sketch on a SHARED
  * fixture: the streaming sketch after two ticks (including re-delivered
  * rows) must equal the batch bottom-k over the union — row for row,
  * slot for slot. This is the merge-closure property q217 oracle-checks
  * on the even/odd halves, exercised through the streaming state path
  * (the q138/StreamSketch parity discipline). */
class StreamQuantileSpec extends SparkSpec {

  private val K = 8

  test("streaming sketch equals the batch bottom-k over both ticks") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two groups, values chosen so ranks shuffle between ticks; tick2
    // re-delivers some tick1 rows (idempotence under at-least-once)
    val tick1 = (1 to 40).map(i =>
      StreamQuantile.Item(if (i % 2 == 0) "a" else "b", i.toLong, i.toLong * 7))
    val tick2 = (30 to 70).map(i =>
      StreamQuantile.Item(if (i % 2 == 0) "a" else "b", i.toLong, i.toLong * 7))

    // transformWithState needs the RocksDB provider (multiple column
    // families) — same setup as StreamNearDupSpec
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[StreamQuantile.Item]
    val sk = StreamQuantile.sketch(mem.toDS(), K)
    val q = sk.writeStream.format("memory").queryName("qsk")
      .outputMode("update").start()
    try {
      mem.addData(tick1: _*)
      q.processAllAvailable()
      mem.addData(tick2: _*)
      q.processAllAvailable()

      // memory sink in update mode APPENDS each batch's emissions, so
      // the sink holds tick1's sketch ⊎ tick2's sketch as a multiset;
      // parity claim: tick1's emission == batch sketch over tick1, and
      // tick2's == batch sketch over the union — asserted jointly as
      // multiset equality (sorted-seq compare)
      val streamed = spark.sql("SELECT grp, slot, h, key, v FROM qsk")
        .as[(String, Int, Long, Long, Long)].collect().toSeq.sorted

      def batchKept(items: Seq[StreamQuantile.Item]) =
        QuantileSketch.kept(
            items.toDF("grp", "key", "v"), "grp", "key", "v", K)
          .as[(String, Int, Long, Long, Long)].collect().toSeq
      val expected =
        (batchKept(tick1) ++ batchKept((tick1 ++ tick2).distinct)).sorted

      assert(streamed == expected,
        "streaming emissions must equal the per-prefix batch sketches")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("mergeKept is order-insensitive and idempotent") {
    val rows = (1 to 30).map(i =>
      QuantileSketch.Kept(((i * 2654435761L) % 1000003L), i.toLong, i.toLong))
    val (a, b) = rows.splitAt(13)
    val m1 = QuantileSketch.mergeKept(a, b, K)
    val m2 = QuantileSketch.mergeKept(b.reverse, a.reverse, K)
    val whole = QuantileSketch.mergeKept(rows, Seq.empty, K)
    assert(m1 == m2 && m1 == whole)
    // re-delivery is a no-op
    assert(QuantileSketch.mergeKept(m1, b, K) == m1 ||
      QuantileSketch.mergeKept(m1, b, K) == whole)
    assert(QuantileSketch.mergeKept(whole, whole, K) == whole)
  }
}
