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

  /** @return (clean documents with recomputed n_chars, quarantined rows).
    * A column the drop lacks entirely is admitted as typed nulls — the
    * same thing the JSONL reader does for an absent field — so a
    * missing nullable `lang`/`source` ingests cleanly and a missing
    * REQUIRED `doc_id`/`text` quarantines every row instead of killing
    * the job with an unresolved-column error. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.orc(path)
    // CASE-INSENSITIVE presence check, first occurrence wins — Spark's
    // own column resolution is case-insensitive and CsvDocuments pins
    // the same contract: a drop written as `Doc_ID`/`TEXT` must keep
    // admitting, not null out every required field and quarantine the
    // whole drop as unrecoverable '{}' rows
    val present = raw.columns.groupBy(_.toLowerCase).map {
      case (lc, cols) => lc -> cols.head
    }
    val projected = raw.select(JsonlDocuments.schema.fields.map { f =>
      val c = present.get(f.name.toLowerCase)
        .map(actual => col(s"`$actual`")).getOrElse(lit(null))
      c.cast(f.dataType).as(f.name)
    }: _*)
    // not cached — the caller decides (see JsonlDocuments.read)
    JsonlDocuments.split(
      projected.withColumn("_corrupt_record", lit(null).cast("string")))
  }
}
