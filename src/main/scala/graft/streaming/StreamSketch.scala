package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Cms

/** Incrementally-maintained Count-Min sketch over an event stream — the
  * streaming twin of the q138 batch counter build, sharing
  * [[graft.ops.Cms.bucketExpr]] so parity is structural (identical
  * hash, identical cells; StreamSketchSpec asserts counter-table
  * equality with the batch build on a shared fixture).
  *
  * Why this is THE streaming frequency structure: an exact streaming
  * count keys state by the item (unbounded — one state row per distinct
  * user/token/IP ever seen), while the CMS keys state by (d, bucket) —
  * exactly d·w cells FOREVER, with the one-sided estimate guarantee.
  * At 100 TB/day of events that is the difference between a state store
  * that grows without bound and one that fits in a page.
  *
  * The aggregation is a streaming keyed HashAggregate: map-side partial
  * cells per task, one shuffle on (d, bucket). COMPLETE output mode is
  * correct here precisely because the result is bounded (≤ d·w rows) —
  * the sink always holds the current whole sketch, ready for point
  * queries via [[graft.ops.Cms.estimate]].
  */
object StreamSketch {

  /** The live counter table (d, bucket, c) for a streaming `items`
    * source; write with outputMode("complete"). Delegates to
    * [[Cms.counters]] — every transformation there is streaming-safe,
    * and ONE body means the batch build, this stream, and the
    * reserved-name guard ('d'/'bucket' caller columns would silently
    * corrupt the sketch) can never drift. */
  def cmsCounters(items: DataFrame, keyExpr: String, d: Int, w: Int)
      : DataFrame =
    Cms.counters(items, keyExpr, d, w)
}
