package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamFunnel._

/** Streaming funnel: same ordering semantics as batch q90 (a stage
  * counts only strictly after the previous stage's first completion),
  * state persisting across micro-batches. */
class StreamFunnelSpec extends SparkSpec {

  private val Stages = Seq("view", "click", "purchase")

  test("e2e: stages complete in order, out-of-order steps don't count") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = completions(mem.toDS(), Stages)
      .writeStream.format("memory").queryName("funnel_tws")
      .outputMode("append").start()
    try {
      // batch 1: user 1 views then clicks; user 2 clicks BEFORE viewing
      // (the click must not count — no view yet); user 3 views.
      mem.addData(
        Event(1L, 1000L, "view"), Event(1L, 2000L, "click"),
        Event(2L, 1000L, "click"), Event(2L, 2000L, "view"),
        Event(3L, 1000L, "view"))
      q.processAllAvailable()
      // batch 2: user 1 purchases (3rd stage, state crossed the batch
      // boundary); user 2 clicks again — now AFTER its view, so it
      // counts; user 3 purchases without clicking (must not count).
      mem.addData(
        Event(1L, 3000L, "purchase"),
        Event(2L, 3000L, "click"),
        Event(3L, 2000L, "purchase"))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT * FROM funnel_tws ORDER BY user_id, stage_idx")
        .as[Completion].collect().toSeq
      assert(got == Seq(
        Completion(1L, 0, "view", 1000L),
        Completion(1L, 1, "click", 2000L),
        Completion(1L, 2, "purchase", 3000L),
        Completion(2L, 0, "view", 2000L),
        Completion(2L, 1, "click", 3000L),
        Completion(3L, 0, "view", 1000L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("parity: streaming funnel reproduces batch q90 on the shared sf0.001 fixture") {
    // The strongest batch↔stream equivalence evidence available without a
    // streaming oracle: the SAME events table flows through the batch
    // query and the streaming twin (fed in event-time order across three
    // micro-batches — the stream's documented equivalence precondition),
    // and the stream's completions aggregate to the batch query's exact
    // published rows (stage, n_users, user_sig).
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q90_funnel")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[Event].collect().sortBy(e => (e.ts_us, e.user_id, e.event_type))
    val mem = MemoryStream[Event]
    val q = completions(mem.toDS(), Stages)
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("append").start()
    try {
      evs.grouped((evs.length + 2) / 3).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // fold the completion stream into q90's output shape with q90's own
      // user-signature formula
      val got = spark.sql(
        """SELECT concat(stage_idx + 1, '_', stage) AS stage,
          |  count(*) AS n_users,
          |  sum(pmod(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),
          |    16, 10) AS BIGINT), 1000000000)) AS user_sig
          |FROM funnel_parity GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch.map(_._1) == Seq("1_view", "2_click", "3_purchase"))
      assert(batch.forall(_._2 > 0)) // fixture actually exercises all stages
      assert(got == batch)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a same-timestamp follow-up never completes the next stage") {
    // strict > : a click sharing the view's timestamp is refused, the
    // q90 batch rule (ts_us > t1), then a later click is accepted
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = completions(mem.toDS(), Stages)
      .writeStream.format("memory").queryName("funnel_tie")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(7L, 1000L, "view"), Event(7L, 1000L, "click"),
        Event(7L, 5000L, "click"))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT * FROM funnel_tie ORDER BY user_id, stage_idx")
        .as[Completion].collect().toSeq
      assert(got == Seq(
        Completion(7L, 0, "view", 1000L),
        Completion(7L, 1, "click", 5000L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
