package graft

import org.apache.spark.sql.functions.lit

/** Hand-computed fixtures for the pairwise-preference pair (q209/q210).
  *
  * The fixture is the textbook Condorcet paradox: three users whose
  * per-type value totals rank {paper, rock, scissors} in the three cyclic
  * orders, so every pairwise majority is 2–1 and the majority tournament
  * is the 3-cycle rock→scissors→paper→rock. q210 must flag every pair's
  * majority edge as on-cycle; q209's MM iteration must land on the exact
  * symmetric fixed point (every item wins 3 of its 6 games → equal
  * ratings, rank by item name).
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def rpsDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pref").toString
    // u1: paper > rock > scissors; u2: rock > scissors > paper;
    // u3: scissors > paper > rock  (one event per (user, type))
    Seq(
      (1L, 10L, "paper", 3.0), (2L, 10L, "rock", 2.0),
      (3L, 10L, "scissors", 1.0),
      (4L, 20L, "rock", 3.0), (5L, 20L, "scissors", 2.0),
      (6L, 20L, "paper", 1.0),
      (7L, 30L, "scissors", 3.0), (8L, 30L, "paper", 2.0),
      (9L, 30L, "rock", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q210: Condorcet cycle — every majority edge flagged on-cycle") {
    val got = SparkEntry.queries("q210_pref_cycles")(spark, rpsDir())
      .as[(String, String, Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      ("paper", "rock", 2L, 1L, "paper", 1L),
      ("paper", "scissors", 1L, 2L, "scissors", 1L),
      ("rock", "scissors", 2L, 1L, "rock", 1L)))
  }

  test("q209: symmetric tournament lands on the equal-rating fixed point") {
    val got = SparkEntry.queries("q209_bradley_terry")(spark, rpsDir())
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // each item wins 3 of its 6 games; MM fixed point at S/2 after the
    // first round's max-normalization (p' = S for all → qdiv = 2)
    assert(got == Seq(
      ("paper", 3L, 6L, 500000L, 1L),
      ("rock", 3L, 6L, 500000L, 2L),
      ("scissors", 3L, 6L, 500000L, 3L)))
  }

  test("q209: asymmetric tournament ranks strictly by strength") {
    val d = java.nio.file.Files.createTempDirectory("graft_pref2").toString
    // u4 agrees with u2 (rock > scissors > paper): wins become
    // rock 5 (r>s ×3, r>p ×2), scissors 4 (s>p ×3, s>r ×1),
    // paper 3 (p>r ×2, p>s ×1) over 4 games per pair — BT must order
    // rock > scissors > paper with strictly decreasing ratings
    Seq(
      (1L, 10L, "paper", 3.0), (2L, 10L, "rock", 2.0),
      (3L, 10L, "scissors", 1.0),
      (4L, 20L, "rock", 3.0), (5L, 20L, "scissors", 2.0),
      (6L, 20L, "paper", 1.0),
      (7L, 30L, "scissors", 3.0), (8L, 30L, "paper", 2.0),
      (9L, 30L, "rock", 1.0),
      (10L, 40L, "rock", 3.0), (11L, 40L, "scissors", 2.0),
      (12L, 40L, "paper", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q209_bradley_terry")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._5)) == Seq(
      ("rock", 5L, 8L, 1L),
      ("scissors", 4L, 8L, 2L), ("paper", 3L, 8L, 3L)))
    val ratings = got.map(_._4)
    assert(ratings == ratings.sorted.reverse && ratings.distinct == ratings)
  }

  test("q214: gap-band edges are exact — boundaries land in the upper " +
      "band, negatives in the inverted band, the top band clamps") {
    val W = QueriesQuant.GapBandWidth
    val cases = Seq(
      -1L -> -1L, Long.MinValue / 2 -> -1L, // any inversion
      0L -> 0L, (W - 1) -> 0L, // band 0 is [0, W)
      W -> 1L, (2 * W - 1) -> 1L, // exact edge opens band 1
      2 * W -> 2L, 3 * W -> 3L, // successive edges
      (4 * W) -> 3L, 100 * W -> 3L) // clamp at DpoMaxBand
    val got = cases.map(_._1).toDF("gap")
      .withColumn("band",
        org.apache.spark.sql.functions.expr(QueriesQuant.dpoBandExpr("gap")))
      .withColumn("rate",
        org.apache.spark.sql.functions.expr(
          s"CAST(${QueriesQuant.dpoRateCase("band")} AS BIGINT)"))
      .as[(Long, Long, Long)].collect()
      .map { case (g, b, r) => g -> (b, r) }.toMap
    val rates = QueriesQuant.DpoRates.toMap
    cases.foreach { case (gap, wantBand) =>
      val (b, r) = got(gap)
      assert(b == wantBand, s"gap $gap -> band $b, wanted $wantBand")
      assert(r == rates(wantBand), s"gap $gap -> rate $r")
    }
    // inverted pairs are dropped, and rates never decrease with the gap
    assert(rates(-1L) == 0L)
    val ordered = QueriesQuant.DpoRates.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted)
  }

  test("q214: the rps fixture's symmetric ratings put every non-tied " +
      "vote instance in band 0 and publish a deterministic keep count") {
    val got = SparkEntry.queries("q214_dpo_pairs")(spark, rpsDir())
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // equal ratings (see the q209 fixed-point test) -> every instance
    // gap 0 -> ONE band-0 row covering all 9 vote instances; the kept
    // subset is the hash rule's, pinned here against drift
    assert(got.size == 1)
    val (band, rate, nPairs, nKept, _, gapMin, gapMax) =
      (got.head._1, got.head._2, got.head._3, got.head._4, got.head._5,
        got.head._6, got.head._7)
    assert(band == 0L && rate == 125L && nPairs == 9L)
    assert(gapMin == 0L && gapMax == 0L)
    assert(nKept >= 0L && nKept <= 2L, // 9 draws at 12.5% — sanity bound
      s"implausible keep count $nKept")
  }
}
