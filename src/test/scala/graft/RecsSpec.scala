package graft

import org.apache.spark.sql.functions.lit

/** q172 item-based recommendations: similarity scores, the owned-part
  * anti-join, and neighbor aggregation all checked by hand on a planted
  * two-pair catalog. */
class RecsSpec extends SparkSpec {
  import spark.implicits._

  test("q172: unseen parts score by summed cosine, owned parts excluded") {
    val d = java.nio.file.Files.createTempDirectory("graft_recs").toString
    // baskets: {1,2}×2, {2,3}×2, {1} → df: 1→3, 2→4, 3→2
    // sims: (1,2) cos2 = 1e12·4/(3·4) = 333333333333
    //       (2,3) cos2 = 1e12·4/(4·2) = 500000000000
    val baskets = Seq(
      (101L, 1L, Seq(1L, 2L)), (102L, 2L, Seq(1L, 2L)),
      (103L, 3L, Seq(2L, 3L)), (104L, 4L, Seq(2L, 3L)),
      (105L, 5L, Seq(1L)))
    baskets.flatMap { case (ok, _, ps) => ps.map(p => (ok, p)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    baskets.map { case (ok, ck, _) => (ok, ck) }
      .toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderdate", lit("1995-01-01"))
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q172_item_recs")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // c1/c2 own {1,2} → only rec is 3 via the (2,3) edge; c3/c4 own
    // {2,3} → only rec is 1 via (1,2); c5 owns {1} → rec 2 via (1,2)
    assert(got == Seq(
      (1L, 1L, 3L, 500000000000L, 1L),
      (2L, 1L, 3L, 500000000000L, 1L),
      (3L, 1L, 1L, 333333333333L, 1L),
      (4L, 1L, 1L, 333333333333L, 1L),
      (5L, 1L, 2L, 333333333333L, 1L)))
  }
}
