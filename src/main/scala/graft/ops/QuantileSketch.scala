package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile summary — the bottom-k-by-hash rank sketch (the
  * q131 KMV discipline pointed at QUANTILES instead of distinct
  * counts): per group keep the k items whose shared deterministic
  * 60-bit hash ([[TextOps.hash60]] of the item's unique key) is
  * smallest. Because the hash is a fixed function of the item, the kept
  * set is a uniform-by-hash size-k sample that is a PURE FUNCTION of
  * the item SET — which buys the two properties a 100 TB owner needs
  * from a quantile summary:
  *
  *   - MERGEABLE, exactly: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  *     bottom-k(B)) for ANY partition of the data — the merge is closed
  *     with no error introduced by merging (q217 publishes this as an
  *     oracle-checked zero-mismatch column rather than asserting it).
  *     Shards, partitions, days, engines — summaries combine in any
  *     order/shape to the identical sketch.
  *   - ONE COMBINABLE PASS: the build is a per-group top-k by hash —
  *     map-side bounded heaps, a k-row-per-group reduce; all quantiles
  *     then serve from the k kept values (q218), replacing q50's
  *     one-full-aggregate-per-cut-point exact path.
  *
  * Why bottom-k and not a literal KLL: the repo's gate is CROSS-ENGINE
  * BIT-PARITY (every estimate hash-matched by the DuckDB twin), and
  * KLL's compactor coin-flips are irreproducible across engines by
  * design; a derandomized keep-even KLL loses the guarantee its
  * randomness carries. Bottom-k is the derandomized-by-hash member of
  * the mergeable-summary family (Cohen's bottom-k sketches): rank error
  * O(n·sqrt(q(1-q)/k)) whp from classical sampling bounds — the
  * 1/ε² space of a uniform sample vs KLL's 1/ε, traded for exact
  * determinism, exact mergeability, and integer-only arithmetic. q218
  * publishes the realized rank error per quantile so the tradeoff is a
  * measured column, not a claim.
  *
  * Scale shape (100 TB): rank ≤ k over (group ORDER BY h) compiles to
  * WindowGroupLimit — per-map-task bounded heaps BEFORE the shuffle, so
  * the exchange carries ≤ k rows per group per task, never the corpus;
  * the sketch table is (groups × k) rows — broadcastable state the way
  * q138's counter table is. The streaming twin
  * ([[graft.streaming.StreamQuantile]]) keys state by group with the k
  * kept rows AS the state — fixed-size forever, the CMS argument — and
  * folds each micro-batch in with [[mergeKept]], the same closed merge
  * the batch path's zero-mismatch column verifies.
  */
object QuantileSketch {

  /** One kept row: the sample-order key pair (h, then item key — a
    * total order even on hash collision) plus the value it carries. */
  final case class Kept(h: Long, key: Long, v: Long)

  /** Per-group bottom-k: input must carry (grpCol, keyCol BIGINT unique
    * within group, vCol BIGINT); output (grpCol, slot 1..k, h, keyCol,
    * vCol) in sample order. */
  def kept(items: DataFrame, grpCol: String, keyCol: String, vCol: String,
           k: Int): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col("h"), col(keyCol))
    items
      .withColumn("h", expr(TextOps.hash60(s"CAST($keyCol AS STRING)")))
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= k)
      .select(col(grpCol), col("slot"), col("h"), col(keyCol), col(vCol))
  }

  /** Re-rank a UNION of kept sets back to one bottom-k — the merge.
    * Input shape = [[kept]] output (slot ignored); same ordering. */
  def merge(sketches: DataFrame, grpCol: String, keyCol: String,
            vCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col("h"), col(keyCol))
    sketches
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= k)
      .select(col(grpCol), col("slot"), col("h"), col(keyCol), col(vCol))
  }

  /** The same merge as a pure in-memory fold — the streaming state
    * update ([[graft.streaming.StreamQuantile]] holds one Seq[Kept] per
    * group). Identical ordering to [[kept]]/[[merge]]; distinct first
    * because a re-delivered micro-batch must be idempotent. */
  def mergeKept(a: Seq[Kept], b: Seq[Kept], k: Int): Seq[Kept] =
    (a ++ b).distinct.sortBy(r => (r.h, r.key)).take(k)
}
