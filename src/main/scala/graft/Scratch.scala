package graft

import org.apache.spark.sql.SparkSession

/** Local measurement scratchpad (NOT part of the driver contract, removed
  * before round close): runs the SPARK_GRAFT_ONLY-selected queries at
  * args(0), times best-of-N full materializations (toRdd.count, the Bench
  * action), and prints the FINAL adaptive plan (executedPlan after the
  * action, so AQE's runtime join/exchange decisions are visible — explain()
  * before execution only shows isFinalPlan=false).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-scratch")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = QueryFilter.fromEnv()
    val qs = SparkEntry.queries.toSeq.sortBy(_._1).filter(t => only(t._1))
    // warmup
    try {
      SparkEntry.queries("q05_daily_rollup")(spark, dir).count()
      SparkEntry.queries("q10_latest_per_user")(spark, dir).count()
    } catch { case _: Throwable => () }
    qs.foreach { case (name, fn) =>
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val t0 = System.nanoTime()
        val qe = fn(spark, dir).queryExecution
        qe.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == reps && sys.env.get("SCRATCH_PLAN").contains("1")) {
          println(s"===== FINAL PLAN $name =====")
          println(qe.executedPlan.toString.take(20000))
        }
        spark.catalog.clearCache()
        sec
      }
      println(f"SCRATCH $name%-28s best=${times.min}%7.3f all=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
