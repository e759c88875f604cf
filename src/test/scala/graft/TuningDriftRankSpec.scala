package graft

/** Round-8 additions: LSH banding sweep (q188), source-profile drift
  * (q189), and the rank transform (q190) on planted fixtures. */
class TuningDriftRankSpec extends SparkSpec {
  import spark.implicits._

  test("q188: looser banding can only widen candidates; relative recall peaks at 1e6") {
    val d = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, t1), (2L, t1 + " extra"),
      (3L, "pack my box with five dozen liquor jugs every morning"),
      (4L, "sphinx of black quartz judge my vow said the wizard loudly"))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q188_lsh_tuning")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 4L))
    // r = 1 (16 single-row bands) is the loosest scheme: its candidate
    // set contains every tighter scheme's
    val candByR = got.map(t => t._1 -> t._3).toMap
    assert(candByR(1L) >= candByR(2L) && candByR(2L) >= candByR(4L))
    // the planted pair confirms under every scheme here, so relative
    // recall is exactly 1e6 across the board
    assert(got.forall(_._6 == 1000000L))
    assert(got.forall(_._4 >= 1L), "planted near-dup confirmed everywhere")
  }

  test("q189: a source matching the global profile scores 0; a skewed one pays the TV") {
    val d = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // global profile: 10 en + 10 fr. Source A mirrors it exactly
    // (tv = 0); source B is all-en: |1e6 − 500000|/2 + |0 − 500000|/2
    val rows = (1L to 5L).map(i => (i, "x", "en", "A")) ++
      (6L to 10L).map(i => (i, "x", "fr", "A")) ++
      (11L to 15L).map(i => (i, "x", "en", "B")) ++
      (16L to 20L).map(i => (i, "x", "fr", "A"))
    // adjust: A = 5 en + 10 fr, B = 5 en → global 10 en / 10 fr
    rows.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q189_source_drift")(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // A: 5/15 en vs 1/2 global → |333333−500000| + |666666−500000| = 333333 → tv 166666
    assert(got("A") == ((15L, 166666L, 166667L)))
    // B: all en → |1e6−500000| + |0−500000| = 1e6 → tv 500000
    assert(got("B") == ((5L, 500000L, 500000L)))
  }

  test("q190: the transform uniformizes a skewed planted marginal") {
    val d = java.nio.file.Files.createTempDirectory("graft_rank").toString
    // 100 rows, heavily skewed values (90 distinct small + 10 equal
    // large); decile counts of the TRANSFORMED column must be flat for
    // the distinct part, with the tied block collapsing to one rank
    val rows = (1L to 90L).map(i => (i, i.toDouble / 100)) ++
      (91L to 100L).map(i => (i, 500.0))
    rows.toDF("c_custkey", "c_acctbal")
      .write.parquet(s"$d/customer.parquet")
    val got = SparkEntry.queries("q190_rank_transform")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // deciles 0-8 hold 10 distinct values each; the tied block (rank_bp
    // = 9000 exactly) lands in decile 9 with 10 rows
    assert(got.map(t => (t._1, t._2)) ==
      (0L to 9L).map(dc => (dc, 10L)))
    val d9 = got.find(_._1 == 9L).get
    assert(d9._5 == 9000L && d9._6 == 9000L, "tied block shares one rank")
  }

}
