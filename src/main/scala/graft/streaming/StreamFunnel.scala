package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming ordered-conversion funnel — the Structured Streaming twin of
  * the batch q90 funnel (`QueriesBehavior`): stage k+1 counts only when
  * its event's time is strictly AFTER the user's stage-k completion, and
  * only the FIRST qualifying event completes a stage.
  *
  * State is O(1) per user — (highest completed stage index, its event
  * time) — not an event buffer; the only shuffle is the groupByKey on
  * user_id, the same partitioning the batch funnel's aggregates use. A
  * completion row is emitted the moment a stage completes, so a
  * downstream dashboard sees conversions with per-event latency instead
  * of waiting for a batch recompute.
  *
  * Ordering contract: each micro-batch's per-user rows are processed in
  * (ts_us, event_type) order (Spark does not sort the group iterator),
  * so the stream matches batch q90 whenever arrival order respects event
  * time ACROSS batches — late data that arrives after a later-timestamped
  * event already advanced the funnel is ignored (the event-time guard
  * refuses it), exactly the watermark-drop discipline the other streaming
  * ops document.
  */
object StreamFunnel {

  case class Event(user_id: Long, ts_us: Long, event_type: String)

  /** Highest completed stage (0-based) and WHEN it completed. */
  case class FunnelState(stageIdx: Int, stageTsUs: Long)

  case class Completion(user_id: Long, stage_idx: Int, stage: String,
                        ts_us: Long)

  class FunnelProcessor(stages: IndexedSeq[String])
      extends StatefulProcessor[Long, Event, Completion] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Completion] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_type))
      var cur = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[Completion]
      sorted.foreach { e =>
        val next = if (cur == null) 0 else cur.stageIdx + 1
        if (next < stages.length && e.event_type == stages(next) &&
            (cur == null || e.ts_us > cur.stageTsUs)) {
          cur = FunnelState(next, e.ts_us)
          out += Completion(userId, next, stages(next), e.ts_us)
        }
      }
      if (cur != null) st.update(cur)
      out.result().iterator
    }
  }

  /** Stage completions as they happen. `stages` is the ordered funnel,
    * e.g. Seq("view", "click", "purchase"). */
  def completions(events: Dataset[Event], stages: Seq[String])
      : Dataset[Completion] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    implicit val ce = Encoders.product[Completion]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages.toIndexedSeq),
        TimeMode.None(), OutputMode.Append())
  }
}
