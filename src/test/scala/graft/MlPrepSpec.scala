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
}
