package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query plan-artifact dumper for the round's before/after evidence
  * (plans/rNN/<query>_{before,after}.txt): writes `explain("formatted")`
  * for every SPARK_GRAFT_ONLY-selected query as its own file. Same
  * session shape as [[Plans]] (the whole-ledger PLANS.md dumper).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val only = QueryFilter.fromEnv()
    SparkEntry.queries.toSeq.sortBy(_._1).filter(t => only(t._1))
      .foreach { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"## $name\n```\n$plan```\n")
        println(s"wrote $outDir/${name}_$suffix.txt")
      }
    spark.stop()
  }
}
