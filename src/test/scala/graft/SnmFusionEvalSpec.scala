package graft

import java.sql.Timestamp

/** Round-8 additions: sorted-neighborhood blocking (q179), fusion dedup
  * with canonical election (q180), batch retrieval eval (q181), and the
  * Theil–Sen robust trend (q182) on planted fixtures. */
class SnmFusionEvalSpec extends SparkSpec {
  import spark.implicits._

  test("q179: window pairs confirmed; a near pair far apart in sort order is missed by design") {
    val d = java.nio.file.Files.createTempDirectory("graft_snm").toString
    // sorted order by (16-char prefix, doc_id): doc 1 first, docs 10-15
    // (identical prefix) in the middle, doc 20 last. Docs 1 and 20 are
    // edit distance 1 apart but SEVEN ranks apart — the sorted-
    // neighborhood miss the scaladoc documents; everything within the
    // w=4 window is found.
    val mid = (10L to 15L).map(i => (i, "aaaaaaaaaaaaaaam tail " + i))
    val rows = Seq((1L, "aaaaaaaaaaaaaaaa tail")) ++ mid ++
      Seq((20L, "aaaaaaaaaaaaaaaz tail"))
    rows.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q179_sorted_neighborhood")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 18)
    assert(!got.exists(p => p._1 == 1L && p._2 == 20L),
      "the 7-rank-apart pair must be outside the window")
    // doc 1 pairs only with the first three mid docs, at distance 1
    assert(got.filter(_._1 == 1L).map(p => (p._2, p._3)).sorted ==
      Seq((10L, 1L), (11L, 1L), (12L, 1L)))
    // identical-prefix mid pairs confirm at distance 0
    assert(got.count(_._3 == 0L) == 12)
  }

  test("q180: LSH and normalization edges fuse into one cluster; longest doc elected") {
    val d = java.nio.file.Files.createTempDirectory("graft_fusion").toString
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t2 = t1 + " extra" // LSH near-dup of t1 (8 of 9 shingles shared)
    val t3 = t1.toUpperCase // normalization dup of t1, invisible to LSH
    val t4 = "completely different content with many unique words here"
    val rows = Seq((3L, t1), (5L, t2), (7L, t3), (9L, t4))
      .map { case (id, t) => (id, t, t.length.toLong) }
    rows.toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q180_fusion_dedup")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // one cluster {3,5,7}, canonical = 5 (longest), singleton 9 absent
    assert(got == Seq(
      (3L, 3L, 5L, t2.length.toLong, (t1.length + t3.length).toLong)))
  }

  test("q181: per-term metrics on a hand-scored posting list; absent terms emit no row") {
    val d = java.nio.file.Files.createTempDirectory("graft_ireval").toString
    Seq(
      (1L, "spark spark x", "en"),
      (2L, "spark y", "fr"),
      (3L, "spark z", "en"),
      (4L, "nothing here", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q181_retrieval_eval")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // ranking for 'spark': doc1 (tf 2), doc2, doc3 (tf tie → id order);
    // first relevant at rank 1, 2 of 3 relevant docs retrieved
    assert(got == Seq(
      ("spark", 1000000L, 2000000L / 3L, 2000000L / 20L, 2L, 3L)))
  }

  test("q182: the slope survives a gross outlier month (the OLS-breaking case)") {
    val d = java.nio.file.Files.createTempDirectory("graft_theilsen").toString
    def ts(s0: String): Timestamp = Timestamp.valueOf(s0)
    // months x = 0..8 follow y = 1000x cents exactly; month 9 is a
    // gross outlier. 36 of 45 pairwise slopes equal 1e9 ppm → the
    // median IS the true slope; the residual median is 0
    val rows = (0 to 8).map { x =>
      (x.toLong + 1, 10.0 * x, ts(f"1992-${x + 1}%02d-15 00:00:00"))
    } :+ ((10L, 9999.99, ts("1992-10-15 00:00:00")))
    rows.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q182_theilsen_trend")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((10L, 45L, 1000000000L, 0L)))
  }
}
