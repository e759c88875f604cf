package graft

import java.sql.Timestamp

/** Round-8 ML-data-prep trio: grouped K-fold splits (q195), feature
  * hashing (q196), and leave-one-out target encoding (q197). */
class MlPrepSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("q195: every user's events land in one fold; balances are exact") {
    val d = java.nio.file.Files.createTempDirectory("graft_cv").toString
    // 40 users × 3 events each (mixed types) — the audit must show 120
    // events split across folds with spanning_users = 0
    val rows = for (u <- 1L to 40L; i <- 0 until 3) yield
      (u * 10 + i, t0, u, if (i == 0) "purchase" else "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q195_group_kfold")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sum == 120L)
    assert(got.map(_._3).sum == 40L, "each user counted in exactly one fold")
    assert(got.forall(_._6 == 0L), "no user spans folds")
    // per-fold: each user contributes 1 purchase of 3 events
    assert(got.forall(r => r._4 == r._3), "purchases = users per fold")
    assert(got.forall(r => r._2 == 3 * r._3))
  }

  test("q196: collision arithmetic over a planted vocabulary") {
    val d = java.nio.file.Files.createTempDirectory("graft_fh").toString
    // 300 distinct tokens over 1024 buckets: loads sum to the vocab and
    // the collision rate is exactly (vocab - used) / vocab
    val text = (1 to 300).map(i => s"tok$i").mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q196_feature_hashing")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val used = got.head._3
    val vocab = got.head._4
    assert(vocab == 300L)
    assert(got.map(r => r._1 * r._2).sum == vocab, "loads cover the vocab")
    assert(got.map(_._2).sum == used, "bucket counts cover used buckets")
    assert(got.head._5 == 1000000L * (vocab - used) / vocab)
  }

  test("q197: the encoded value excludes the row's own target") {
    val d = java.nio.file.Files.createTempDirectory("graft_loo").toString
    // category A: targets 10, 20, 30 dollars → LOO encodes are the mean
    // of the OTHER two: 2500, 2000, 1500 cents; singleton category B is
    // dropped (n = 1 has no others to average)
    Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "B", 99.0))
      .map { case (k, c, p) => (k, c, p, t0) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q197_loo_target_encoding")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 1500L, 2500L, 6000L, 2000L)))
  }

  test("q208: group split keeps a planted near-dup cluster atomic; per-doc split leaks") {
    val d = java.nio.file.Files.createTempDirectory("graft_leak").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // ids 0..19: one 20-doc near-dup cluster (jaccard ≈ 20/21 pairwise);
    // ids 100..109: ten mutually-distinct singletons
    val cluster = (0L until 20L).map(i => (i, s"$base extra$i"))
    val singles = (0L until 10L).map(i =>
      (100L + i, (0 until 15).map(j => s"w${i}_$j").mkString(" ")))
    (cluster ++ singles).map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q208_leakage_split")(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val byGroup = got.filter(_._1 == "by_group")
    val byDoc = got.filter(_._1 == "by_doc")
    assert(byGroup.forall(_._6 == 0L), "group-wise split must never leak a pair")
    assert(byDoc.forall(_._6 > 0L),
      "the 20-doc cluster must straddle per-doc splits (hash is deterministic)")
    // docs conserved per strategy; the cluster is ONE group under by_group
    // (sum of per-split distinct groups = 1 cluster + 10 singletons), while
    // under by_doc the straddling cluster is counted once per split touched
    assert(byGroup.map(_._3).sum == 30L && byDoc.map(_._3).sum == 30L)
    assert(byGroup.map(_._4).sum == 11L, "cluster atomic under by_group")
    assert(byDoc.map(_._4).sum > 11L, "cluster straddles under by_doc")
  }

  test("q207: MMR demotes the near-duplicate of the top hit; pool < k truncates") {
    val d = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    // max-abs 127 integer vectors → int8 quantization is the identity, so
    // every score is hand-checkable: query [127,102]; v1 ≈ v2 (near-dups
    // aligned with the query), v3 orthogonal to them but relevant via the
    // query's second component. Plain rel order: v1, v2, v3 — MMR must
    // pick v3 over the near-dup v2 at rank 2 (λ=0.7 integer form).
    Seq(
      (0L, Array(127f, 102f), 0),
      (1L, Array(127f, 1f), 0),
      (2L, Array(127f, 0f), 0),
      (3L, Array(0f, 127f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q207_mmr_diversify")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 16231L, 7L * 16231L),                 // pure relevance argmax
      (2L, 3L, 12954L, 7L * 12954L - 3L * 127L),     // orthogonal beats near-dup
      (3L, 2L, 16129L, 7L * 16129L - 3L * 16129L)),  // near-dup last, penalized
      s"got $got")
    assert(got.size == 3, "pool of 3 candidates truncates k=10 to 3 rows")
  }
}
