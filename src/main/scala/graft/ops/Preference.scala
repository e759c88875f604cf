package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference primitives shared by the batch queries
  * (q209/q210) and the streaming twin
  * ([[graft.streaming.StreamPreference]]) — ONE body for the comparison
  * rule and ONE body for the MM iteration, so batch/stream parity is
  * structural rather than tested-for.
  *
  * The comparison corpus: per (user, item) EXACT micro-totals (per-row
  * round-half-up to micros BEFORE the sum — integer summation is
  * associative, so the comparison is summation-order-free on any engine
  * or partitioning), then within each user every item pair votes for
  * the larger total; exact ties abstain. One combinable aggregate plus
  * a user-keyed self-join whose fan-out is ≤ k(k−1)/2 rows per user
  * (k = distinct item count, dimension-sized at any corpus scale).
  */
object Preference {

  /** Exact per-(user, item) micro-totals of `value`. */
  def microTotals(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").as("v"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("v")).as("tot"))

  /** Directed win counts (winner, loser, w) from a totals table —
    * within-user pairs only, ties abstain. */
  def winsOf(totals: DataFrame): DataFrame = {
    val a = totals.select(col("user_id"), col("event_type").as("ia"),
      col("tot").as("ta"))
    val b = totals.select(col("user_id").as("ub"), col("event_type").as("ib"),
      col("tot").as("tb"))
    a.join(b, col("user_id") === col("ub") && col("ia") < col("ib"))
      .filter(col("ta") =!= col("tb"))
      .select(
        when(col("ta") > col("tb"), col("ia")).otherwise(col("ib"))
          .as("winner"),
        when(col("ta") > col("tb"), col("ib")).otherwise(col("ia"))
          .as("loser"))
      .groupBy(col("winner"), col("loser")).agg(count(lit(1)).as("w"))
  }

  /** Bradley–Terry strengths by the scaled-integer MM iteration (Hunter
    * 2004): p_i ← W_i / Σ_j n_ij/(p_i+p_j), every division a BigInt
    * floor at scale S — exact at any comparison count, bit-identical to
    * the HUGEINT oracle twin. Runs on the COLLECTED k²-matrix (the
    * KMeans/q108 dimension-collect discipline). Returns
    * (item, w_total, n_games, rating, rank) ordered by rank. */
  def mmRatings(winRows: Seq[(String, String, Long)],
                scale: Long = 1000000L, iters: Int = 8)
      : Seq[(String, Long, Long, Long, Long)] =
    if (winRows.isEmpty) Seq.empty
    else {
      val items = winRows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
      val wTot = items.map(i =>
        i -> BigInt(winRows.filter(_._1 == i).map(_._3).sum)).toMap
      val games: Map[(String, String), BigInt] = winRows
        .flatMap { case (i, j, w) =>
          Seq((i, j) -> BigInt(w), (j, i) -> BigInt(w)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      val gTot = items.map(i =>
        i -> games.collect { case ((a, _), n) if a == i => n }.sum).toMap
      val s2 = BigInt(scale) * BigInt(scale)
      var p: Map[String, BigInt] = items.map(_ -> BigInt(scale)).toMap
      for (_ <- 1 to iters) {
        val r = items.map { i =>
          val d = items.filter(j => games.contains((i, j)))
            .map(j => games((i, j)) * s2 / (p(i) + p(j))).sum
          i -> (if (d > 0) wTot(i) * s2 / d else p(i))
        }.toMap
        val qdiv = r.values.max / BigInt(scale) + 1
        p = r.map { case (i, v) => i -> v / qdiv }
      }
      items
        .map(i => (i, wTot(i).toLong, gTot(i).toLong, p(i).toLong))
        .sortBy { case (i, _, _, rating) => (-rating, i) }
        .zipWithIndex
        .map { case ((i, w, g, rt), ix) => (i, w, g, rt, (ix + 1).toLong) }
        .toSeq
    }
}
