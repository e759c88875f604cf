package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — click→purchase attribution
  * over two LIVE streams, the last big Structured Streaming primitive
  * next to the repo's stateful ops (sessionize, dedup, near-dup, meter,
  * funnel): both sides are unbounded, so the join must buffer each side
  * in state and the WATERMARK + the event-time RANGE condition together
  * bound that state.
  *
  * Semantics: every (click, purchase) pair for the same user with
  * `click.ts <= purchase.ts <= click.ts + horizon` — the bounded-window
  * attribution (all touches within the horizon get credit). This is the
  * streaming complement of batch q57 (`ops/AsofJoin`, latest-click-only):
  * a point as-of needs "no earlier unseen click can still arrive", which
  * a stream can only finalize per-watermark; the interval form is the
  * one Structured Streaming expresses natively and is itself a standard
  * attribution model.
  *
  * Scale shape: state is hash-partitioned by the join key exactly like a
  * batch shuffle join; each side retains only rows younger than
  * (watermark − horizon), so state is O(arrival rate × horizon), not
  * O(stream). Late rows older than the watermark are dropped at the scan
  * — the same admission discipline as the other streaming ops. Without
  * BOTH the watermarks and the two-sided time bound, Spark would
  * (correctly) refuse to clean state; this shape is the documented
  * contract for stream-stream joins.
  *
  * Reference seam: the reference has no streaming path (SURVEY §2.9 —
  * cron batch only); this extends its click/purchase-shaped event model
  * (events table) to continuous arrival.
  */
object StreamJoin {

  /** Join two streaming frames — `clicks(user_id, click_id, ts)` and
    * `purchases(user_id, purchase_id, ts)` — on user within
    * `[click.ts, click.ts + horizonSec]`. `delay` is the max tolerated
    * event-time lateness on each side (the watermark). Append-mode safe:
    * a pair emits once both sides admit the rows; the open interval of a
    * click stops accepting purchases once the watermark passes its
    * horizon end. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       horizonSec: Int, delay: String = "10 seconds"): DataFrame = {
    require(horizonSec > 0, s"horizonSec must be positive, got $horizonSec")
    val c = clicks.withWatermark("ts", delay).alias("c")
    val p = purchases.withWatermark("ts", delay).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts >= c.ts AND
         |p.ts <= c.ts + interval $horizonSec seconds""".stripMargin))
      .select(col("c.user_id").as("user_id"),
        col("c.click_id").as("click_id"), col("c.ts").as("click_ts"),
        col("p.purchase_id").as("purchase_id"), col("p.ts").as("purchase_ts"),
        (unix_timestamp(col("p.ts")) - unix_timestamp(col("c.ts")))
          .as("latency_s"))
  }
}
