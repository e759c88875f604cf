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
