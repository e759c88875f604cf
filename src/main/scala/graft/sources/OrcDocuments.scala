package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC document source — the columnar interchange format next to JSONL
  * and CSV, hardened with the same admit-and-audit discipline:
  *
  *  - EXPLICIT column selection with casts to the wire schema (a
  *    columnar drop can still drift types between producers; casting is
  *    explicit, never inferred);
  *  - a columnar format has no per-line corrupt record — its failure
  *    mode is MISSING REQUIRED FIELDS (null doc_id/text), which the
  *    shared [[JsonlDocuments.split]] quarantines as re-serialized JSON
  *    rows exactly like the text readers, so repair tooling is
  *    format-independent;
  *  - derived `n_chars` recomputed, not trusted from the wire.
  *
  * Scale: ORC scans are splittable per stripe with predicate pushdown
  * and column pruning at the reader, the same properties the engine
  * relies on for parquet.
  */
object OrcDocuments {

  /** @return (clean documents with recomputed n_chars, quarantined rows) */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.orc(path)
    val projected = JsonlDocuments.schema.fields.foldLeft(
      raw.select(JsonlDocuments.schema.fieldNames.map(col): _*)) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(f.dataType))
    }
    JsonlDocuments.split(
      projected.withColumn("_corrupt_record", lit(null).cast("string")).cache())
  }
}
