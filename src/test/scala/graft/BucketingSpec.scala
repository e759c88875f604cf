package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-partitioning technique big
  * fact⨝fact joins need at 100 TB (SURVEY §2.2 scale notes): writing both
  * sides bucketed AND sorted by the join key lets the sort-merge join read
  * the bucket layout directly, with NO shuffle exchange and NO sort at
  * query time. This spec locks the capability in against the real
  * warehouse path (external bucketed tables, in-memory catalog — no Hive
  * needed). */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join with no exchange and no sort") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed")
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").mode("overwrite").saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force the shuffle-join path: the point is that bucketing removes
      // the shuffle, not that the small side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join inputs read the bucket layout directly: the only exchange
      // allowed is the one AFTER the join for the groupBy re-key
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        "bucketed join inputs must not shuffle")
      // correctness: same result as the plain join
      val direct = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
