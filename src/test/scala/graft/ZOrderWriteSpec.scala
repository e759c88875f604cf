package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The Z-order WRITE path — what a user actually buys the q109 layout
  * plan for: `repartitionByRange(z).sortWithinPartitions(z)` written to
  * parquet must let row-group min/max statistics skip data for a range
  * predicate on EITHER raw dimension, where a one-dimensional layout of
  * the same data (same file count, same row-group geometry) cannot.
  * Mirrors BucketingSpec's executed-plan technique: the scan node's
  * numOutputRows metric counts rows surviving parquet-level filtering,
  * so fewer rows out of the scan == row groups skipped. */
class ZOrderWriteSpec extends SparkSpec {

  // AQE wraps stages as traversal leaves; descend explicitly (PruningSpec)
  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
    }.flatten

  /** (result count, rows the parquet scan emitted after pushdown). */
  private def countAndScanned(path: String, pred: Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(pred).agg(count(lit(1)))
    val n = df.collect()(0).getLong(0)
    (n, scans(df.queryExecution.executedPlan).head.metrics("numOutputRows").value)
  }

  test("z-ordered parquet skips row groups on BOTH dims; 1-D layout does not") {
    val dir = "/root/testdata/sf0.1"
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val dayUs = 86400L * 1000000L
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("ck"),
        expr(s"unix_micros(o_orderdate) DIV $dayUs").as("dy"))
    val b = o.agg(min(col("ck")), max(col("ck")), min(col("dy")), max(col("dy")))
      .collect()(0)
    val (ck0, ck1, dy0, dy1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val zed = o
      .withColumn("x", expr(s"((ck - $ck0) * 256) DIV ${ck1 - ck0 + 1}"))
      .withColumn("y", expr(s"((dy - $dy0) * 256) DIV ${dy1 - dy0 + 1}"))
      .withColumn("z", expr(graft.ops.ZOrder.interleaveExpr("x", "y")))
      .select(col("o_orderkey"), col("ck"), col("dy"), col("z"))
    // small row groups so the 150k-row fixture has many of them — the
    // skipping mechanics are identical at production row-group sizes
    val rg = Map("parquet.block.size" -> "32768", "parquet.page.size" -> "4096")
    // THE production z-order write
    zed.repartitionByRange(4, col("z")).sortWithinPartitions(col("z"))
      .write.options(rg).mode("overwrite").parquet(s"$tmp/zorder")
    // control: same rows, files, and row-group geometry, clustered on a
    // key uncorrelated with both dims
    zed.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions(col("o_orderkey"))
      .write.options(rg).mode("overwrite").parquet(s"$tmp/plain")

    // narrow range predicate on each dim: middle ~1/16 of the span
    val ckLo = ck0 + (ck1 - ck0) / 2; val ckHi = ck0 + (ck1 - ck0) * 9 / 16
    val dyLo = dy0 + (dy1 - dy0) / 2; val dyHi = dy0 + (dy1 - dy0) * 9 / 16
    for (pred <- Seq(col("ck").between(ckLo, ckHi), col("dy").between(dyLo, dyHi))) {
      val (nZ, scannedZ) = countAndScanned(s"$tmp/zorder", pred)
      val (nP, scannedP) = countAndScanned(s"$tmp/plain", pred)
      assert(nZ == nP, "layouts must agree on the query result")
      assert(nZ > 0, "the predicate must actually select rows")
      assert(scannedP > 0 && scannedZ > 0)
      // the claim: the z layout's row-group stats confine both dims, so
      // the scan emits a fraction of what the 1-D layout emits
      assert(scannedZ * 2 <= scannedP,
        s"z-order scan should skip at least half vs 1-D layout: " +
          s"z=$scannedZ plain=$scannedP for $pred")
    }
  }
}
