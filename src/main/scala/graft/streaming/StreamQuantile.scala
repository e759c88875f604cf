package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig}
import org.apache.spark.sql.streaming.ValueState

import graft.ops.{QuantileSketch, TextOps}

/** Incrementally-maintained mergeable quantile sketch over a stream —
  * the streaming twin of the q217 batch build, reusing
  * [[QuantileSketch.mergeKept]] (the SAME closed merge whose
  * zero-mismatch property q217 oracle-verifies) as the state update:
  * state per group is the current bottom-k kept rows, each micro-batch
  * folds in as one more operand of the merge the batch path proved
  * order-insensitive.
  *
  * Why this is THE streaming quantile structure: exact streaming
  * quantiles key state by value (unbounded — one state row per distinct
  * value ever seen), while this keys state by GROUP with exactly k rows
  * FOREVER — the q138/StreamSketch fixed-state argument, for rank
  * queries. Because the kept set is a pure function of the item set,
  * re-delivered rows are no-ops (mergeKept dedups before ranking) and
  * the stream's sketch after ANY prefix equals the batch sketch over
  * that prefix — parity is structural, pinned by StreamQuantileSpec.
  *
  * Scale: one shuffle (groupByKey on the group — the same key the
  * batch window partitions by); per-batch work is sort-of-(state + new
  * rows) per touched group; output (Update mode) is the ≤ k-row current
  * sketch for touched groups, ready for q218-style serving.
  */
object StreamQuantile {

  /** Input: group, unique item key (the hash input), value. */
  case class Item(grp: String, key: Long, v: Long)
  /** Item with the shared hash attached (public: encoder codegen needs
    * accessible accessors). */
  case class HashedItem(grp: String, h: Long, key: Long, v: Long)
  /** Current sketch row; slot is the sample-order rank 1..k. */
  case class SketchRow(grp: String, slot: Int, h: Long, key: Long, v: Long)
  private case class KeptState(hs: Seq[Long], keys: Seq[Long], vs: Seq[Long])

  private class SketchProcessor(k: Int)
      extends StatefulProcessor[String, HashedItem, SketchRow] {

    @transient private var st: ValueState[KeptState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[KeptState]("kept",
        Encoders.product[KeptState], TTLConfig.NONE)

    override def handleInputRows(grp: String, rows: Iterator[HashedItem],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SketchRow] = {
      val batch = rows
        .map(r => QuantileSketch.Kept(r.h, r.key, r.v)).toSeq
      val prev: Seq[QuantileSketch.Kept] =
        if (st.exists()) {
          val s = st.get()
          s.hs.indices.map(i => QuantileSketch.Kept(s.hs(i), s.keys(i), s.vs(i)))
        } else Seq.empty
      val merged = QuantileSketch.mergeKept(prev, batch, k)
      // write state only when the sketch changed: an unchanged sketch
      // re-written per touched group would cost a state-store write per
      // batch for groups already saturated with smaller hashes
      if (merged != prev)
        st.update(KeptState(merged.map(_.h), merged.map(_.key),
          merged.map(_.v)))
      merged.iterator.zipWithIndex.map { case (r, i) =>
        SketchRow(grp, i + 1, r.h, r.key, r.v)
      }
    }
  }

  /** The live per-group sketch for a streaming `items` source; write
    * with outputMode("update") — each batch re-emits the current ≤ k
    * rows of every touched group. Hash = the batch path's
    * [[TextOps.hash60]] of the item key, so stream and batch agree on
    * which items a sketch keeps, bit-for-bit. */
  def sketch(items: Dataset[Item], k: Int): Dataset[SketchRow] = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val he = Encoders.product[HashedItem]
    implicit val se = Encoders.product[SketchRow]
    implicit val str = Encoders.STRING
    items.toDF()
      .withColumn("h", expr(TextOps.hash60("CAST(key AS STRING)")))
      .select(col("grp"), col("h"), col("key"), col("v"))
      .as[HashedItem]
      .groupByKey(_.grp)
      .transformWithState(new SketchProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
