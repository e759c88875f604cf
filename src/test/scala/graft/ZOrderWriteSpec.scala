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
  import spark.implicits._

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

  test("q206: zone-map hit logic on a hand grid — corner cells, both layouts") {
    // Four orders at the bucket-grid corners: (ck,dy) ∈ {0,255}².
    // Bounds make bucketing the identity (x=ck, y=dy), so the cells and
    // every block's min/max box are known exactly:
    //   lin (y DIV 4):   block 0  = {(0,0),(255,0)}   box x[0,255] y[0,0]
    //                    block 63 = {(0,255),(255,255)} box x[0,255] y[255,255]
    //   z  (z DIV 1024): four singleton blocks 0/21/42/63
    //     (z of (255,0) = Σ4^b = 21845 → 21; (0,255) → 43690 → 42;
    //      (255,255) → 65535 → 63)
    val tmp = java.nio.file.Files.createTempDirectory("graft_zonemap").toString
    Seq((1L, 0L, 0L), (2L, 255L, 0L), (3L, 0L, 255L), (4L, 255L, 255L))
      .toDF("o_orderkey", "o_custkey", "dy")
      .withColumn("o_orderdate", timestamp_seconds(col("dy") * 86400L))
      .drop("dy")
      .write.parquet(s"$tmp/orders.parquet")
    val rows = SparkEntry.queries("q206_zonemap_prune")(spark, tmp)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (l, p, bt, bh, rs, rm) => (l, p) -> ((bt, bh, rs, rm)) }
      .toMap
    // pred 0 = x ∈ [0,40], y unconstrained: the time-sorted layout's two
    // blocks both span x[0,255] → zero pruning (scan all 4 rows); the z
    // layout prunes to the two x=0 singletons
    assert(rows(("lin", 0L)) == ((2L, 2L, 4L, 2L)))
    assert(rows(("z", 0L)) == ((4L, 2L, 2L, 2L)))
    // pred 1 = y ∈ [29,69]: no cell matches; lin prunes BOTH blocks
    // (y-boxes are tight), z likewise hits nothing
    assert(rows(("lin", 1L)) == ((2L, 0L, 0L, 0L)))
    assert(rows(("z", 1L)) == ((4L, 0L, 0L, 0L)))
    // every predicate: layouts agree on true matches, and a zone-map scan
    // never reads fewer rows than it returns
    for (p <- 0L until 16L) {
      assert(rows(("lin", p))._4 == rows(("z", p))._4)
      assert(rows(("lin", p))._3 >= rows(("lin", p))._4)
      assert(rows(("z", p))._3 >= rows(("z", p))._4)
    }
  }
}
