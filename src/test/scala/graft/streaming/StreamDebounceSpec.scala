package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import StreamDebounce._

/** Previous-KEPT debounce: the transition function via TestGroupState,
  * the engine path via batch-mode flatMapGroupsWithState, the streaming
  * path via transformWithState over MemoryStream (state surviving
  * batches), and the batch-twin contract: divergence on a burst chain,
  * agreement where no chain exists (the q150 seam). */
class StreamDebounceSpec extends SparkSpec {

  private val GapUs = 5L * 1000000L

  private def ev(u: Long, t: String, sec: Long, id: Long) =
    Event(u, t, sec * 1000000L, id)

  test("transition: a chain keeps 0s and 6s — raw-lag batch would keep only 0s") {
    val state = TestGroupState.create[DebState](
      optionalState = Optional.empty[DebState](),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    val events = Iterator(ev(1L, "c", 0L, 1L), ev(1L, "c", 3L, 2L),
      ev(1L, "c", 6L, 3L))
    val kept = flatMapFn(GapUs)((1L, "c"), events, state).toSeq
    // 3s: only 3s after the last KEPT (0s) → drop; 6s: 6s ≥ 5s → KEEP.
    // q150's raw-lag would compare 6s against the raw 3s event and drop
    // it — the divergence this operator exists for.
    assert(kept.map(_.event_id) == Seq(1L, 3L))
    assert(state.get.lastKeptUs == 6L * 1000000L)
  }

  test("transition: state from a prior batch suppresses an early event") {
    val state = TestGroupState.create[DebState](
      optionalState = Optional.of(DebState(10L * 1000000L)),
      timeoutConf = GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    val kept = flatMapFn(GapUs)((1L, "c"),
      Iterator(ev(1L, "c", 12L, 9L), ev(1L, "c", 15L, 10L)), state).toSeq
    // 12s is 2s after the kept 10s → drop; 15s is 5s after → keep
    assert(kept.map(_.event_id) == Seq(10L))
    assert(state.get.lastKeptUs == 15L * 1000000L)
  }

  test("batch mode: keys are independent; exact-gap boundary is kept") {
    val spark2 = spark
    import spark2.implicits._
    val ds = spark.createDataset(Seq(
      ev(1L, "c", 0L, 1L), ev(1L, "c", 3L, 2L), ev(1L, "c", 8L, 3L),
      ev(2L, "c", 1L, 4L), // other user: independent
      ev(1L, "v", 2L, 5L))) // other type: independent
    val got = debounce(ds, GapUs).collect().toSeq.sortBy(_.event_id)
    // user1/c: 0s kept, 3s dropped (3 < 5 after kept 0s), 8s kept
    // (8 ≥ 5 after kept 0s). Single-event keys keep their only event.
    assert(got.map(_.event_id) == Seq(1L, 3L, 4L, 5L))
  }

  test("batch twin agreement: raw-lag and kept-lag match when no chain exists") {
    // gaps are either ≥ 5s (both keep) or a single isolated short gap
    // (both drop its second event) — no chain of consecutive short gaps,
    // so q150's raw-lag semantics and previous-kept agree row for row.
    val spark2 = spark
    import spark2.implicits._
    val events = Seq(
      ev(1L, "c", 0L, 1L), ev(1L, "c", 2L, 2L), ev(1L, "c", 9L, 3L),
      ev(1L, "c", 20L, 4L), ev(2L, "c", 0L, 5L), ev(2L, "c", 30L, 6L))
    val streamKept = debounce(spark.createDataset(events), GapUs)
      .collect().map(_.event_id).toSet
    // independent raw-lag reimplementation (the q150 rule)
    val rawKept = events.groupBy(e => (e.user_id, e.event_type)).flatMap {
      case (_, es) =>
        val sorted = es.sortBy(e => (e.ts_us, e.event_id))
        sorted.zip(None +: sorted.map(Some(_))).collect {
          case (e, None) => e.event_id
          case (e, Some(p)) if e.ts_us - p.ts_us >= GapUs => e.event_id
        }
    }.toSet
    assert(streamKept == rawKept)
    assert(streamKept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("transformWithState e2e: kept-state survives micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = debounceTws(mem.toDS(), GapUs)
      .writeStream.format("memory").queryName("deb_tws")
      .outputMode("append").start()
    try {
      mem.addData(ev(1L, "c", 0L, 1L))
      q.processAllAvailable()
      // next batch: 3s must be dropped against the PERSISTED 0s keep;
      // 6s re-opens (6 ≥ 5 after the kept 0s)
      mem.addData(ev(1L, "c", 3L, 2L), ev(1L, "c", 6L, 3L))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_id FROM deb_tws ORDER BY event_id")
        .as[Long].collect().toSeq
      assert(got == Seq(1L, 3L))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
