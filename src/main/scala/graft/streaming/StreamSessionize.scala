package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming gap-based sessionization with ORDINAL session ids — the
  * Structured Streaming twin of [[graft.ops.Sessionize]].
  *
  * The reference's pipeline is batch-recompute-by-cron
  * (`/root/reference/README.md:117-121`); its session semantics (new session
  * when the inter-event gap >= threshold, sessions numbered per player —
  * `/root/reference/parser/parse_matches.sh:298-346`) map here onto
  * `flatMapGroupsWithState`: per-entity state carries (last event time,
  * current ordinal, open-session aggregates). Spark's built-in
  * `session_window` gives gap-windows but labels sessions by start time,
  * not ordinal — the reference needs `session_number`, hence custom state.
  *
  * Emission contract: a session row is emitted when its successor session
  * OPENS (the gap proves the previous session closed), and on event-time
  * timeout for the final open session. Spark does not sort the group
  * iterator, so each micro-batch's per-entity events are sorted in-memory
  * here (bounded by events-per-entity-per-batch); late data beyond the
  * watermark must be dropped upstream for ordinals to be stable.
  *
  * Scale: state is O(1) per entity (no event buffering); the only shuffle
  * is the groupByKey on the entity — identical to the batch window's
  * partitioning.
  */
object StreamSessionize {

  case class Event(user_id: Long, ts_us: Long, value_cents: Long)

  /** `nEvents == 0` is the FLUSHED sentinel: no session is open, but
    * `seq` remembers the last emitted ordinal so a returning entity's
    * next session numbers `seq + 1` — without it, a timeout flush that
    * removed state would restart the returning user at ordinal 1,
    * colliding with the already-emitted session 1 and diverging from
    * the batch twin's per-entity 1..N numbering. The cost is one tiny
    * state row per entity ever seen (the reference numbers sessions
    * over ALL history, so that memory is inherent to the contract). */
  case class SessionState(lastTsUs: Long, seq: Long, nEvents: Long,
                          startUs: Long, sumCents: Long)

  case class Session(user_id: Long, session_seq: Long, n_events: Long,
                     start_us: Long, end_us: Long, sum_cents: Long)

  private def emit(userId: Long, s: SessionState): Session =
    Session(userId, s.seq, s.nEvents, s.startUs, s.lastTsUs, s.sumCents)

  /** The core state transition shared VERBATIM by the
    * flatMapGroupsWithState and transformWithState wrappers (one body —
    * the two APIs cannot drift): (sorted events, prior state) →
    * (closed sessions, new state). `cur0` may be null (fresh entity) or
    * the flushed sentinel (resume numbering at seq + 1). */
  private[streaming] def advance(userId: Long, gapUs: Long,
      sorted: Array[Event], cur0: SessionState): (Seq[Session], SessionState) = {
    var cur = cur0
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      if (cur == null) {
        cur = SessionState(e.ts_us, 1L, 1L, e.ts_us, e.value_cents)
      } else if (cur.nEvents == 0L) {
        // flushed sentinel: nothing open to close; continue the ordinal
        cur = SessionState(e.ts_us, cur.seq + 1L, 1L, e.ts_us, e.value_cents)
      } else if (e.ts_us - cur.lastTsUs >= gapUs) {
        closed += emit(userId, cur)
        cur = SessionState(e.ts_us, cur.seq + 1L, 1L, e.ts_us, e.value_cents)
      } else {
        cur = SessionState(e.ts_us, cur.seq, cur.nEvents + 1L, cur.startUs,
          cur.sumCents + e.value_cents)
      }
    }
    (closed.result(), cur)
  }

  /** Apply to a `groupByKey(_.user_id)`-ed stream.
    *
    * @param gapUs new session when gap >= this many microseconds
    */
  def sessionize(events: Dataset[Event], gapUs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout)
      : Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ste = Encoders.product[SessionState]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        case (userId, it, state) => flatMapFn(gapUs)(userId, it, state)
      }
  }

  /** The state-transition function, exposed for unit testing. */
  def flatMapFn(gapUs: Long)(
      userId: Long, it: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (!it.hasNext && state.hasTimedOut) {
      // final open session flushes on event-time timeout; the state is
      // NOT removed — it becomes the flushed sentinel so a returning
      // entity continues its ordinal instead of restarting at 1
      val open = state.getOption.filter(_.nEvents > 0L)
      val out = open.map(emit(userId, _))
      open.foreach(s =>
        state.update(SessionState(s.lastTsUs, s.seq, 0L, 0L, 0L)))
      return out.iterator
    }
    val sorted = it.toArray.sortBy(e => (e.ts_us, e.value_cents))
    val (closed, cur) = advance(userId, gapUs, sorted, state.getOption.orNull)
    if (cur != null) {
      state.update(cur)
      // a timer only matters while a session is open; throws iff the
      // query runs without EventTimeTimeout (direct unit tests of the
      // transition function) — the final session then stays open, which
      // is the batch-equivalent behavior
      if (cur.nEvents > 0L) {
        try state.setTimeoutTimestamp(cur.lastTsUs / 1000L + gapUs / 1000L)
        catch { case _: UnsupportedOperationException => () }
      }
    }
    closed.iterator
  }

  /** The same sessionization on the modern `transformWithState` API
    * (Spark 4 StatefulProcessor). Unlike FlatMapGroupsWithStateExec, the
    * TransformWithStateExec operator plans cleanly in this environment, so
    * this variant carries the streaming e2e coverage. State shape and
    * transition rules are identical to [[flatMapFn]]. */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.value_cents))
      val (closed, cur) =
        advance(userId, gapUs, sorted, if (st.exists()) st.get() else null)
      if (cur != null) st.update(cur)
      closed.iterator
    }
  }

  /** transformWithState-based sessionize (no timers: the final open session
    * stays open until its successor arrives — batch-equivalent). */
  def sessionizeTws(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.None(), OutputMode.Append())
  }
}
