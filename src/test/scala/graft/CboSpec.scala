package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization — the statistics-driven half of the optimizer
  * story next to AQE (SkewSpec), DPP (PruningSpec) and bucketing
  * (BucketingSpec): with table/column statistics ANALYZEd into the
  * catalog and CBO + join reorder enabled, Catalyst rewrites a
  * syntactically bad multi-join order into a cost-ordered one. At 100 TB
  * this is what keeps a hand-written fact⨝fact⨝dim query from shuffling
  * the two fact tables into each other before the dim filter has cut
  * them down. */
class CboSpec extends SparkSpec {

  test("with ANALYZE stats + CBO, a 3-way join reorders off syntactic order") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_cbo")
    // big (lineitem) ⨝ mid (orders) ⨝ tiny (3-row priority dim), written
    // in the worst order: the two big tables first.
    Tables.lineitem(spark, dir).select(col("l_orderkey"))
      .write.option("path", s"$wh/c_lineitem").mode("overwrite")
      .saveAsTable("c_lineitem")
    Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
      .write.option("path", s"$wh/c_orders").mode("overwrite")
      .saveAsTable("c_orders")
    val spark2 = spark
    import spark2.implicits._
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM").toDF("pr")
      .write.option("path", s"$wh/c_pr").mode("overwrite").saveAsTable("c_pr")
    val cboPrev = spark.conf.get("spark.sql.cbo.enabled", "false")
    val reoPrev = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    try {
      Seq("c_lineitem", "c_orders", "c_pr").foreach { t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      }
      spark.sql("ANALYZE TABLE c_orders COMPUTE STATISTICS FOR COLUMNS " +
        "o_orderkey, o_orderpriority")
      spark.sql("ANALYZE TABLE c_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      spark.sql("ANALYZE TABLE c_pr COMPUTE STATISTICS FOR COLUMNS pr")
      val sql =
        """SELECT count(*) AS n
          |FROM c_lineitem
          |JOIN c_orders ON l_orderkey = o_orderkey
          |JOIN c_pr ON o_orderpriority = pr""".stripMargin
      def firstJoinTables(plan: String): String = {
        // the innermost (first-executed) join is the deepest Join node;
        // approximate by the relation order in the optimized plan text
        plan.linesIterator.filter(_.contains("Relation"))
          .map(l => Seq("c_lineitem", "c_orders", "c_pr")
            .find(l.contains).getOrElse("?"))
          .mkString(",")
      }
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val off = spark.sql(sql)
      val offOrder = firstJoinTables(off.queryExecution.optimizedPlan.toString)
      val offN = off.collect()(0).getLong(0)
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val on = spark.sql(sql)
      val onOrder = firstJoinTables(on.queryExecution.optimizedPlan.toString)
      val onN = on.collect()(0).getLong(0)
      // result identical; the leaf order must CHANGE (the tiny dim moves
      // next to orders so the priority filter cuts before the big join)
      assert(onN == offN)
      assert(offOrder == "c_lineitem,c_orders,c_pr",
        s"baseline should keep syntactic order, got $offOrder")
      assert(onOrder != offOrder,
        s"CBO should reorder the join, still got $onOrder")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboPrev)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", reoPrev)
      Seq("c_lineitem", "c_orders", "c_pr").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
