package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-string-match top-k — the engine counterpart of the
  * reference's fuzzy player search (`fetcher/query_player.ts:23-56`:
  * FuzzySearch over player names, cap at `limit`, then per-result
  * stats). The search itself is `topK`; the per-result stats are
  * whatever columns the caller carries on `names` or joins afterward —
  * see FuzzySearchSpec for the full reference-shaped flow.
  *
  * Determinism: ties break on (distance, name) — byte order on both
  * engines for ASCII names — so ranks are stable across runs, engines
  * and cluster sizes.
  *
  * Scale shape: `levenshtein` is a codegen'd built-in evaluated map-side
  * against the single broadcast-literal query; top-k is orderBy+limit
  * (TakeOrderedAndProject — per-partition heaps, never a full sort); the
  * rank window runs over the k survivors only. With `maxDist` set, the
  * O(1) length-difference gate prunes rows before the O(len²) distance,
  * and Spark's bounded 3-arg levenshtein early-exits the DP — at
  * dictionary scale that is the difference between scanning and
  * computing. */
object FuzzySearch {

  /** Top-k rows of `names` by edit distance from `names(nameCol)` to
    * `query`, with `dist` and dense 1-based `rank` appended.
    *
    * @param maxDist optional pruning radius: candidates farther than
    *                this are dropped (and cheaply pre-filtered by the
    *                length-difference lower bound) */
  def topK(names: DataFrame, nameCol: String, query: String, k: Int,
           maxDist: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Spark's length()/levenshtein() count CODE POINTS; String.length
    // counts UTF-16 units — a query with supplementary characters would
    // inflate the length bound and over-prune true matches
    val queryLen = query.codePointCount(0, query.length)
    val scored = maxDist match {
      case Some(md) =>
        names
          .filter(abs(length(col(nameCol)) - lit(queryLen)) <= md)
          .withColumn("dist", levenshtein(col(nameCol), lit(query), md))
          .filter(col("dist") >= 0 && col("dist") <= md) // 3-arg returns -1 past the bound
      case None =>
        names.withColumn("dist", levenshtein(col(nameCol), lit(query)))
    }
    scored
      .orderBy(col("dist"), col(nameCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("dist"), col(nameCol))))
  }
}
