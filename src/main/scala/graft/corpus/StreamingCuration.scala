package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField}

import graft.sources.JsonlDocuments

/** Streaming corpus ingest — the corpus product's cron loop, mirroring
  * `codstats.Pipeline.continuousRun`: a landing directory of JSONL drops
  * drains through the hardened parse into a parquet document store, one
  * `Trigger.AvailableNow` invocation per tick, resumable from the
  * checkpoint.
  *
  * Production properties carried over from the batch reader and the
  * codstats loop:
  *  - corrupt lines and missing-required-field rows are QUARANTINED to
  *    their own sink, never dropped and never fatal (a 100 TB drop always
  *    contains garbage); both sinks are fed from ONE cached batch pass;
  *  - appends are idempotent: each batch anti-joins the store's existing
  *    doc_ids before writing, so a re-delivered file (new name, same
  *    docs) or a foreachBatch crash-replay cannot duplicate documents —
  *    at scale the key read is column-pruned to the one id column;
  *  - the store is partitioned by source, the partition key every
  *    downstream curation stage (mixture rates, per-source meters) prunes
  *    on.
  */
object StreamingCuration {

  /** One ingest tick: drain new landing files, quarantine bad lines,
    * append new documents to the store. */
  def ingestTick(spark: SparkSession, landingDir: String, checkpointDir: String,
                 storeDir: String, quarantineDir: String): Unit = {
    val raw = spark.readStream
      .schema(JsonlDocuments.schema
        .add(StructField("_corrupt_record", StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(landingDir)
    def store(): Option[DataFrame] =
      if (new java.io.File(storeDir).exists()) Some(spark.read.parquet(storeDir))
      else None
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val batch = batch0.localCheckpoint() // one pass feeds both sinks
        val bad = batch.filter(col("_corrupt_record").isNotNull ||
            col("doc_id").isNull || col("text").isNull)
          .select(coalesce(col("_corrupt_record"), to_json(struct(
            col("doc_id"), col("text"), col("lang"), col("source"))))
            .as("raw_line"))
        if (!bad.isEmpty)
          bad.write.mode("append").json(quarantineDir)
        val clean0 = batch
          .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull
            && col("text").isNotNull)
          .drop("_corrupt_record")
          .withColumn("n_chars", length(col("text")).cast("long"))
        val fresh = store() match {
          case Some(existing) => clean0.join(
            existing.select(col("doc_id")), Seq("doc_id"), "left_anti")
          case None => clean0
        }
        if (!fresh.isEmpty)
          fresh.write.mode("append").partitionBy("source").parquet(storeDir)
        batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }
}
