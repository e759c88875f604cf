package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import StreamSessionize._

/** Streaming sessionization (SURVEY.md §2.9): the flatMapGroupsWithState
  * transition function is unit-tested via TestGroupState and batch mode;
  * streaming ordinal sessionization is e2e-tested through the modern
  * transformWithState operator (RocksDB state store), and gap windows
  * through a watermarked session_window aggregation — both over
  * MemoryStream. (FlatMapGroupsWithStateExec itself cannot stream in this
  * environment — see the in-test note.) */
class StreamSessionizeSpec extends SparkSpec {

  private val GapUs = 7200L * 1000000L

  test("transition function: closes a session when the gap elapses") {
    val state = TestGroupState.create[SessionState](
      optionalState = Optional.empty[SessionState](), timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val events = Iterator(
      Event(1L, 0L, 100L), Event(1L, 1000000L, 50L),
      Event(1L, GapUs + 1000000L, 25L))
    val closed = flatMapFn(GapUs)(1L, events, state).toSeq
    assert(closed == Seq(Session(1L, 1L, 2L, 0L, 1000000L, 150L)))
    assert(state.get.seq == 2L && state.get.nEvents == 1L)
  }

  test("transition function: timeout flushes the open session and keeps " +
      "the ordinal; a returning user continues at seq + 1, never restarts") {
    val open = SessionState(lastTsUs = 5L, seq = 3L, nEvents = 4L,
      startUs = 1L, sumCents = 10L)
    val state = TestGroupState.create[SessionState](
      optionalState = Optional.of(open), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(1L),
      hasTimedOut = true)
    val out = flatMapFn(GapUs)(1L, Iterator.empty, state).toSeq
    assert(out == Seq(Session(1L, 3L, 4L, 1L, 5L, 10L)))
    // state persists as the flushed sentinel (nEvents = 0, seq kept):
    // removing it would renumber a returning user's next session as 1,
    // colliding with the session 1 already emitted
    assert(!state.isRemoved && state.get.nEvents == 0L && state.get.seq == 3L)

    // the returning user: next event opens session 4, not session 1
    val state2 = TestGroupState.create[SessionState](
      optionalState = Optional.of(state.get), timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out2 = flatMapFn(GapUs)(1L,
      Iterator(Event(1L, 999999999L, 7L)), state2).toSeq
    assert(out2.isEmpty, "an opening session emits only when it closes")
    assert(state2.get.seq == 4L && state2.get.nEvents == 1L)

    // a second timeout on an already-flushed sentinel emits nothing
    val state3 = TestGroupState.create[SessionState](
      optionalState = Optional.of(state.get), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(6L),
      hasTimedOut = true)
    assert(flatMapFn(GapUs)(1L, Iterator.empty, state3).isEmpty)
  }

  test("batch-mode flatMapGroupsWithState matches the gap semantics") {
    // flatMapGroupsWithState also runs on batch Datasets (state starts
    // empty per group) — same transition function, full engine path.
    // NOTE: the STREAMING physical operator cannot be integration-tested in
    // this environment: Spark 4.1.2's FlatMapGroupsWithStateExec mixes in
    // PythonSQLMetrics, whose constructor NPEs (SparkPlan.session is null)
    // during micro-batch planning on the stream thread. The streaming
    // engine itself is e2e-tested below via session_window.
    val spark2 = spark
    import spark2.implicits._
    val ds = spark.createDataset(Seq(
      Event(1L, 0L, 10L), Event(1L, 1000000L, 20L),
      Event(1L, GapUs + 1000000L, 30L), Event(2L, 0L, 5L)))
    val got = sessionize(ds, GapUs, GroupStateTimeout.NoTimeout)
      .collect().toSeq.sortBy(s => (s.user_id, s.session_seq))
    // only sessions CLOSED by a successor appear (no timeout in batch)
    assert(got == Seq(Session(1L, 1L, 2L, 0L, 1000000L, 30L)))
  }

  test("transformWithState e2e: streaming ordinal sessions over MemoryStream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires a multi-column-family state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = sessionizeTws(mem.toDS(), GapUs)
      .writeStream.format("memory").queryName("sess_tws")
      .outputMode("append").start()
    try {
      mem.addData(Event(1L, 0L, 10L), Event(1L, 1000000L, 20L), Event(2L, 0L, 5L))
      q.processAllAvailable()
      // user 1 jumps the gap twice across two batches -> sessions 1, 2 close
      mem.addData(Event(1L, GapUs + 1000000L, 30L))
      q.processAllAvailable()
      mem.addData(Event(1L, 2L * GapUs + 2000000L, 40L))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sess_tws ORDER BY user_id, session_seq")
        .as[Session].collect().toSeq
      assert(got == Seq(
        Session(1L, 1L, 2L, 0L, 1000000L, 30L),
        Session(1L, 2L, 1L, GapUs + 1000000L, GapUs + 1000000L, 30L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming session_window e2e: watermarked gap sessions over MemoryStream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val sessions = mem.toDF().toDF("user_id", "ts", "cents")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val q = sessions.select(col("user_id"), col("n_events"), col("sum_cents"))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    try {
      def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
      mem.addData((1L, ts(0L), 10L), (1L, ts(600L), 20L), (2L, ts(0L), 5L))
      q.processAllAvailable()
      // jump far past gap + watermark so the first sessions close and emit
      mem.addData((1L, ts(100000L), 30L))
      q.processAllAvailable()
      mem.addData((1L, ts(300000L), 40L))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sess_win ORDER BY user_id, n_events DESC")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.contains((1L, 2L, 30L))) // user 1's first session: 2 events, 30 cents
      assert(got.contains((2L, 1L, 5L)))
    } finally q.stop()
  }
}
