package graft

import org.apache.spark.sql.functions._

import graft.corpus.CurationPipeline

/** End-to-end CurationPipeline throughput ledger: one full 12-stage run
  * over the documents table at SPARK_GRAFT_SF_DIR with EVERY optional
  * stage enabled, per-stage wall time + surviving doc count printed as
  * one JSON line and written to PIPELINE_BENCH.json — where a real
  * curation run's time goes, measured not asserted.
  *
  * The documents table carries no URL column, so a deterministic one is
  * synthesized (500 publishers on a real registered-domain shape) to
  * exercise the PSL canonicalization, domain-cap and leakage-aware
  * split stages for real. Attribution note: each stage's time is its
  * INCREMENTAL cost on top of cached predecessors (stages forced in
  * pipeline order); `mixture_sample` carries mixture AND split-column
  * work (one cached frame), `split_assign`'s own row is the cache-hit
  * residual.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PIPE_OUT", "PIPELINE_BENCH.json")
    val spark = Bench.buildSession()
    // 100 DISTINCT registrable domains (siteN.com — each its own PSL
    // registrant; a shared-suffix shape like siteN.example.com would
    // canonicalize every doc to ONE registered domain and the cap would
    // collapse the corpus to `domainCap` rows)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("url", expr(
        "concat('https://site', CAST(pmod(doc_id, 100) AS STRING), " +
          "'.com/p/', CAST(doc_id AS STRING))"))
    val cfg = CurationPipeline.Config(
      domainCap = Some(200),
      editDistanceMax = Some(80),
      lineDedupMaxCount = Some(2),
      assignSplit = true)
    CurationPipeline.timeStages = true
    val t0 = System.nanoTime()
    val (curated, audit) = CurationPipeline.run(docs, cfg)
    audit.collect() // audit rows were already forced by the stage counts
    val total = (System.nanoTime() - t0) / 1e9
    CurationPipeline.timeStages = false
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val stages = CurationPipeline.lastStageTimes
      .map { case (name, sec, n) =>
        s"\"" + name + s"\":{\"sec\":${r3(sec)},\"docs_after\":$n}" }
      .mkString("{", ",", "}")
    // stages_sum < value: the remainder is lazy-construction and
    // driver overhead between stage actions (plan building, broadcast
    // builds, the audit's cheap re-counts) — published so the
    // unattributed share is visible, not hidden
    val stagesSum = r3(CurationPipeline.lastStageTimes.map(_._2).sum)
    val line =
      s"""{"metric":"pipeline_total","value":${r3(total)},"unit":"sec","stages_sum":$stagesSum,"stages":$stages,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[pipeline-bench] could not write: ${e.getMessage}")
    }
    curated.unpersist()
    spark.stop()
  }
}
