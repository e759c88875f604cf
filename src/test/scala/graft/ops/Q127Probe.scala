package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: attribute q127's sf1 cost across its phases. */
object Q127Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.Tables.documents(spark, dir)
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    // phase 1: candidate generation alone (fresh, uncached — as q127 runs it)
    time("candidates only") {
      val hashed = graft.ops.NearDup.shingleHashed(
        d.repartition(32), "doc_id", "text").cache()
      val n = graft.ops.NearDup.candidatePairs(hashed).count()
      hashed.unpersist()
      n
    }
    // phase 2: full q127 as shipped
    time("full q127") {
      graft.SparkEntry.queries("q127_editdist_confirm")(spark, dir)
        .queryExecution.toRdd.count()
    }
    // phase 3: q127 with the text joins + levenshtein REPLACED by a cheap marker
    time("q127 minus levenshtein") {
      val hashed = graft.ops.NearDup.shingleHashed(
        d.repartition(32), "doc_id", "text").cache()
      val texts = d.select(col("doc_id"), col("text"))
      val n = graft.ops.NearDup.candidatePairs(hashed)
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
        .withColumn("dist", (length(col("text_a")) - length(col("text_b"))).cast("long"))
        .filter(col("dist") >= -80 && col("dist") <= 80)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .orderBy(col("doc_a"), col("doc_b"))
        .queryExecution.toRdd.count()
      hashed.unpersist()
      n
    }
    // phase 4b: prefilter + WORK-repartition before the DP map
    time("q127 prefilter + repartition") {
      val hashed = graft.ops.NearDup.shingleHashed(
        d.repartition(32), "doc_id", "text").cache()
      val texts = d.select(col("doc_id"), col("text"))
      val n = graft.ops.NearDup.candidatePairs(hashed)
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
        .filter(abs(length(col("text_a")) - length(col("text_b"))) <= 80)
        .repartition(32)
        .withColumn("dist", levenshtein(col("text_a"), col("text_b"), 80).cast("long"))
        .filter(col("dist") >= 0 && col("dist") <= 80)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .orderBy(col("doc_a"), col("doc_b"))
        .queryExecution.toRdd.count()
      hashed.unpersist()
      n
    }
    // phase 5: executed (post-AQE) plan of the repartition variant
    locally {
      val hashed = graft.ops.NearDup.shingleHashed(
        d.repartition(32), "doc_id", "text").cache()
      val texts = d.select(col("doc_id"), col("text"))
      val df = graft.ops.NearDup.candidatePairs(hashed)
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
        .filter(abs(length(col("text_a")) - length(col("text_b"))) <= 80)
        .repartition(32)
        .withColumn("dist", levenshtein(col("text_a"), col("text_b"), 80).cast("long"))
        .filter(col("dist") >= 0 && col("dist") <= 80)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .orderBy(col("doc_a"), col("doc_b"))
      df.queryExecution.toRdd.count()
      println("=== executed plan (post-AQE) ===")
      println(df.queryExecution.executedPlan.toString.take(6000))
      hashed.unpersist()
    }
    spark.stop()
  }
}
