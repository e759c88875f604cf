package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzzy name search pinned to the reference flow
  * (query_player.ts:23-56): approximate match over a name dictionary,
  * cap at k, stats carried per result. */
class FuzzySearchSpec extends SparkSpec {
  import spark.implicits._

  private val players = Seq(
    ("ShadowHunter", 1.42, 812L),
    ("ShadowHunted", 0.97, 93L),
    ("shadowhunter", 2.01, 1204L),
    ("MadowHunter", 1.10, 57L),
    ("Wildcard", 0.55, 12L),
    ("ShadowHunterX", 1.88, 440L))
    .toDF("username", "kd_ratio", "games_played")

  test("top-k by edit distance; stats ride along; ties break on name") {
    val got = FuzzySearch.topK(players, "username", "ShadowHunter", 3)
      .select("rank", "username", "dist", "kd_ratio", "games_played")
      .as[(Int, String, Int, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(
      (1, "ShadowHunter", 0),
      // dist-1 tie: 'ShadowHunted' < 'ShadowHunterX' in byte order
      (2, "ShadowHunted", 1),
      (3, "ShadowHunterX", 1)))
    assert(got.head._4 == 1.42 && got.head._5 == 812L)
  }

  test("maxDist prunes instead of ranking far names") {
    val got = FuzzySearch.topK(players, "username", "ShadowHunter", 10,
        maxDist = Some(2))
      .select("username", "dist").as[(String, Int)].collect().toSeq
    // 'Wildcard' (8 chars vs 12) fails the length gate; 'shadowhunter'
    // is 2 case-flips away and survives exactly at the bound
    assert(got.map(_._1).toSet ==
      Set("ShadowHunter", "MadowHunter", "ShadowHunted", "ShadowHunterX",
        "shadowhunter"))
    assert(got.forall(_._2 <= 2))
  }

  test("rank is dense, 1-based, and consistent with the sort") {
    val got = FuzzySearch.topK(players, "username", "Wildcard", 6)
      .select("rank", "dist").as[(Int, Int)].collect().toSeq
    assert(got.map(_._1) == (1 to 6))
    assert(got.map(_._2) == got.map(_._2).sorted)
  }
}
