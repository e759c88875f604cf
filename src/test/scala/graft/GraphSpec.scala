package graft

/** q129 floored random walk: masses hand-computed on a planted 2×2
  * bipartite graph, including the floor-shed arithmetic. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def graphDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_graph").toString
    // c1 buys 3 items from s1 and 1 from s2; c2 buys 1 from s2
    Seq((100L, 1L), (100L, 1L), (100L, 1L), (100L, 2L), (200L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    Seq((100L, 10L), (200L, 20L))
      .toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, "Supplier#1"), (2L, "Supplier#2"))
      .toDF("s_suppkey", "s_name")
      .write.parquet(s"$d/supplier.parquet")
    d
  }

  test("q130: K4 plus a pendant — per-node triangle counts by hand") {
    val d = java.nio.file.Files.createTempDirectory("graft_tri").toString
    // two-item baskets encode the edge list directly: K4 over parts
    // 1..4 (every node in C(3,2)=3 triangles) plus pendant edge 4–5
    // (no triangle; part 5 must not appear). Degrees 3,3,3,4,1 exercise
    // both branches of the (degree, id) orientation comparison.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    edges.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((100L + i, a), (100L + i, b)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q130_triangle_count")(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("q133: cascading peel by hand — K4 survives, a 2-step tail does not") {
    val d = java.nio.file.Files.createTempDirectory("graft_kcore").toString
    // two-item baskets encode the edge list: K4 over parts 1..4 (the
    // 3-core) plus node 5 attached to 1, 2, and 6, and leaf 6. Node 5
    // starts AT degree 3 and only falls below k when round 1 peels leaf
    // 6 — so the fixture fails unless peeling actually cascades across
    // rounds (a single-pass degree filter would keep node 5).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L), (5L, 6L))
    edges.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((100L + i, a), (100L + i, b)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q133_kcore")(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("q144: path-graph hop levels by hand; disconnected component absent") {
    val d = java.nio.file.Files.createTempDirectory("graft_bfs").toString
    // two-item baskets encode the edge list: a 5-node path seeded at one
    // end (hop = index along the path, hop 4 reached exactly at the last
    // unrolled round) plus a disconnected 6–7 edge that must NOT appear
    // (no seed reaches it).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    edges.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((100L + i, a), (100L + i, b)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    (1L to 7L).map(k => (k, if (k == 1L) "Brand#1" else "Brand#9"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q144_bfs_hops")(spark, d)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 1L, 1L), (1, 1L, 2L), (2, 1L, 3L),
      (3, 1L, 4L), (4, 1L, 5L)))
  }

  test("q154: two bridged triangles settle into two communities") {
    val d = java.nio.file.Files.createTempDirectory("graft_lpa").toString
    // triangles {1,2,3} and {4,5,6} joined by bridge 3–4; hand-running
    // the 4 synchronous min-tie-break rounds: labels converge to 1 on
    // the left triangle and 3 on the right — the bridge does NOT merge
    // them (unlike components q51, which would return one cluster).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    edges.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((100L + i, a), (100L + i, b)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", org.apache.spark.sql.functions.lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q154_label_propagation")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 6L), (3L, 3L, 15L)))
  }

  test("q129: three hops of floored mass transfer, computed by hand") {
    // edges: (c10,s1,3) (c10,s2,1) (c20,s2,1); wc: c10=4, c20=1; vs: s1=3, s2=2
    // hop1 (seed 1e6/customer):
    //   m1(s1) = floor(1e6*3/4)              = 750000
    //   m1(s2) = floor(1e6*1/4) + floor(1e6) = 1250000
    // hop2: r1(c10) = floor(750000*3/3) + floor(1250000*1/2) = 1375000
    //       r1(c20) = floor(1250000*1/2)                     = 625000
    // hop3: m2(s1) = floor(1375000*3/4)                      = 1031250
    //       m2(s2) = floor(1375000*1/4) + floor(625000*1/1)  = 968750
    val got = SparkEntry.queries("q129_supplier_walk")(spark, graphDir())
      .as[(Int, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 1L, "Supplier#1", 750000L, 1031250L),
      (2, 2L, "Supplier#2", 1250000L, 968750L)))
  }
}
