package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the row-level runtime filter next
  * to DPP's partition-level one (PruningSpec): when a selective dim
  * filters a shuffle join, Spark builds a bloom filter from the dim's
  * join keys and pushes a might_contain probe into the FACT scan, so
  * fact rows that can't join die before the shuffle. At 100 TB this is
  * the difference between shuffling the whole fact table and shuffling
  * the matching percent. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim side injects a bloom probe into the fact scan") {
    val dir = "/root/testdata/sf0.01"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter runtime probe in:\n$optimized")
      // correctness unchanged by the filter
      val withF = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val li2 = Tables.lineitem(spark, dir)
      val without = li2.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(withF == without)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
