package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming previous-KEPT debounce — the variant the batch q150
  * deliberately does NOT implement: keep an event iff it is the first of
  * its (user, type) key or ≥ gap after the previously KEPT event of that
  * key. Batch lag-debounce (q150) compares against the previous RAW
  * event — a window function; previous-KEPT debounce is inherently
  * sequential state (each keep/drop decision feeds the next), which is
  * exactly what `flatMapGroupsWithState` / `transformWithState` model.
  *
  * The two semantics diverge on a burst CHAIN: events at 0 s, 3 s, 6 s
  * with a 5 s gap — raw-lag keeps only 0 s (every successor is < 5 s
  * after its raw predecessor), previous-kept keeps 0 s AND 6 s (6 s is
  * ≥ 5 s after the last KEPT event, 0 s). A rate limiter wants the
  * latter: a steady sub-gap drizzle must not suppress events forever.
  * On chain-free inputs the two agree (StreamDebounceSpec pins both the
  * divergence and the agreement).
  *
  * Emission contract: kept events emit in the micro-batch they arrive
  * (APPEND mode); drops emit nothing. Spark does not sort the group
  * iterator, so each batch's per-key events sort in-memory here (bounded
  * by events-per-key-per-batch); late data beyond the watermark must be
  * dropped upstream for keep/drop decisions to be stable.
  *
  * Scale: state is ONE timestamp per (user, type) key — O(active keys),
  * independent of event volume; the only shuffle is the keyed
  * groupByKey, the same partitioning the batch twin uses.
  */
object StreamDebounce {

  case class Event(user_id: Long, event_type: String, ts_us: Long,
                   event_id: Long)

  case class DebState(lastKeptUs: Long)

  case class Kept(user_id: Long, event_type: String, ts_us: Long,
                  event_id: Long)

  /** The core keep/drop sweep shared VERBATIM by both API wrappers (one
    * body — the two cannot drift): (sorted events, last kept ts or
    * Long.MinValue) → (kept events, new last-kept ts). */
  private[streaming] def sweep(gapUs: Long, sorted: Array[Event],
      lastKept0: Long): (Seq[Kept], Long) = {
    var lastKept = lastKept0
    val kept = Seq.newBuilder[Kept]
    sorted.foreach { e =>
      if (lastKept == Long.MinValue || e.ts_us - lastKept >= gapUs) {
        kept += Kept(e.user_id, e.event_type, e.ts_us, e.event_id)
        lastKept = e.ts_us
      }
    }
    (kept.result(), lastKept)
  }

  /** Apply to an event stream; key = (user_id, event_type). */
  def debounce(events: Dataset[Event], gapUs: Long): Dataset[Kept] = {
    implicit val ke = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val oe = Encoders.product[Kept]
    implicit val se = Encoders.product[DebState]
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebState, Kept](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, it, state) => flatMapFn(gapUs)(key, it, state)
      }
  }

  /** The state-transition function, exposed for unit testing. */
  def flatMapFn(gapUs: Long)(
      key: (Long, String), it: Iterator[Event],
      state: GroupState[DebState]): Iterator[Kept] = {
    val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
    val (kept, lastKept) = sweep(gapUs, sorted,
      state.getOption.map(_.lastKeptUs).getOrElse(Long.MinValue))
    if (lastKept != Long.MinValue) state.update(DebState(lastKept))
    kept.iterator
  }

  /** The same debounce on the modern `transformWithState` API (carries
    * the streaming e2e coverage — see StreamSessionize's operator note). */
  class DebounceProcessor(gapUs: Long)
      extends StatefulProcessor[(Long, String), Event, Kept] {

    @transient private var st: ValueState[DebState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DebState]("debounce",
        Encoders.product[DebState], TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Kept] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
      val (kept, lastKept) = sweep(gapUs, sorted,
        if (st.exists()) st.get().lastKeptUs else Long.MinValue)
      if (lastKept != Long.MinValue) st.update(DebState(lastKept))
      kept.iterator
    }
  }

  /** transformWithState wiring for [[DebounceProcessor]]. */
  def debounceTws(events: Dataset[Event], gapUs: Long): Dataset[Kept] = {
    implicit val ke = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val oe = Encoders.product[Kept]
    events.groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new DebounceProcessor(gapUs),
        TimeMode.None(), OutputMode.Append())
  }
}
