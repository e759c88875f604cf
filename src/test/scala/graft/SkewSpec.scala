package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime half of the skew strategy (the
  * compile-time half is `ops/Salt`): with adaptive execution on, a
  * sort-merge join whose shuffle output has a dominant key is re-planned
  * at runtime into split sub-partitions, visible as `skew=true` on the
  * join node. This spec drives a deliberately skewed join through AQE
  * with the split thresholds lowered to test scale and pins both the
  * re-plan and the result. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying 50k rows vs 100 cold keys with 10 each
      val left = ((1 to 50000).map(i => (1L, i.toLong)) ++
        (2L to 101L).flatMap(k => (1 to 10).map(i => (k, i.toLong))))
        .toDF("k", "v")
      val right = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")
      val j = left.join(right, "k").groupBy(col("name"))
        .agg(count(lit(1)).as("n"))
      val rows = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("dim1") == 50000L && rows("dim2") == 10L && rows.size == 101)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must re-plan the hot key into split sub-partitions")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
