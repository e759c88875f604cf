package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: when a partitioned fact joins a dim whose
  * filter selects few partition-key values, Spark injects a runtime
  * `dynamicpruning` subquery into the fact scan so only the matching
  * partitions are read — the 100 TB mechanism behind "a report rebuild
  * touching 3 days reads 3 day partitions", which the day-partitioned
  * fact store ([[graft.codstats.Pipeline]]) is laid out for. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("fact scan carries a dynamicpruning filter from the dim side and prunes") {
    // test-scale knobs only (same discipline as SkewSpec): the DPP
    // cost-benefit estimator compares scan bytes, which are all tiny here;
    // production leaves these at defaults
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try dppBody() finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def dppBody(): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = (0 until 8).flatMap(d => (1 to 100).map(i => (d, d * 1000 + i)))
      .toDF("day", "v")
    fact.repartition(col("day")) // one file per day partition
      .write.partitionBy("day").parquet(s"$dir/fact")
    // Two DPP preconditions worth pinning: the dim must be a real source (a
    // Filter over a LocalRelation constant-folds away), and the predicate
    // must be "likely selective" — a literal comparison qualifies, a bare
    // boolean attribute does not (and `=== true` simplifies to one)
    (0 until 8).map(d => (d, if (d < 2) "keep" else "drop")).toDF("day", "cat")
      .coalesce(1).write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")

    val f = spark.read.parquet(s"$dir/fact")
    val joined = f.join(dim.filter(col("cat") === "keep"), Seq("day"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"))
    val res = joined.collect()
    assert(res.head.getLong(0) == 200L && res.head.getInt(1) == 1)

    // the pruning subquery must be planned into the fact scan...
    assert(joined.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
      "fact scan should carry a runtime pruning predicate on the partition column")
    // ...and the executed scan must have touched only the 2 selected
    // partitions (8 day partitions on disk, one file each). AQE wraps
    // stages as traversal leaves, so descend into them explicitly.
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }.flatten
    val scan = scans(joined.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("fact")))
      .head
    assert(scan.metrics("numFiles").value == 2,
      s"expected 2 of 8 partition files read, got ${scan.metrics("numFiles").value}")
  }
}
