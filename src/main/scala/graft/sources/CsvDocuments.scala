package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV document source — the other interchange format corpus drops
  * arrive in, hardened exactly like [[JsonlDocuments]]:
  *
  *  - EXPLICIT schema (no inference pass over 100 TB, no silently
  *    unioned drifting shapes);
  *  - PERMISSIVE parsing with the corrupt record captured, so one
  *    mangled line neither kills the ingest nor vanishes — the caller
  *    gets (clean rows, quarantined raw lines);
  *  - `multiLine` stays OFF so the scan remains line-splittable (a
  *    multiline CSV forces one task per file);
  *  - derived `n_chars` recomputed, not trusted from the wire.
  */
object CsvDocuments {

  /** @return (clean documents with recomputed n_chars, quarantined lines) */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(JsonlDocuments.schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "true")
      .option("multiLine", "false")
      .csv(path)
      .cache()
    val clean = parsed
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull
        && col("text").isNotNull)
      .drop("_corrupt_record")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val quarantined = parsed
      .filter(col("_corrupt_record").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col("_corrupt_record"),
        concat_ws(",", col("doc_id"), col("text"), col("lang"), col("source")))
        .as("raw_line"))
    (clean, quarantined)
  }
}
