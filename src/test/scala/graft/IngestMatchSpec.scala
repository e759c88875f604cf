package graft

/** Round-8 additions: dedup-at-ingest (q186) and distribution-matching
  * resampling (q187) on planted fixtures. */
class IngestMatchSpec extends SparkSpec {
  import spark.implicits._

  test("q186: a new doc dups against the index AND against an earlier batch sibling") {
    val d = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t3 = "pack my box with five dozen liquor jugs every morning"
    Seq(
      (5L, t1),            // existing corpus (index side)
      (13L, t1 + " extra"),  // new batch: near-dup of 5 (8 of 9 shingles)
      (26L, t3),           // new batch: unique vs index
      (39L, t3 + " more"))   // new batch: dup of its EARLIER sibling 26
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q186_ingest_dedup")(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((13L, 5L, 8.0 / 9.0), (39L, 26L, 8.0 / 9.0)))
  }

  test("q187: acceptance rates derive from exact importance weights; full-keep bucket survives intact") {
    val d = java.nio.file.Files.createTempDirectory("graft_dm").toString
    // two equal-size buckets with unequal targets (100k vs 400k ppm):
    // scores 200k/800k → accepts 250000 and 1000000 ppm exactly; the
    // max-ratio bucket must keep ALL its rows
    val rows = (1L to 10L).map(i => (i, "x", 50L)) ++
      (11L to 20L).map(i => (i, "y", 500L))
    rows.toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q187_distribution_match")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSeq
    // (bucket, n_before, share_before_ppm, target_ppm, accept_ppm, n_after)
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == Seq(
      (0L, 10L, 500000L, 100000L, 250000L),
      (3L, 10L, 500000L, 400000L, 1000000L)))
    assert(got.find(_._1 == 3L).get._6 == 10L, "max-ratio bucket keeps all")
    assert(got.find(_._1 == 0L).get._6 <= 10L)
  }
}
