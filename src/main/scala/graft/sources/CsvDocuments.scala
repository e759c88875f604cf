package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV document source — the other interchange format corpus drops
  * arrive in, hardened exactly like [[JsonlDocuments]]:
  *
  *  - EXPLICIT TYPES, header-driven columns: CSV is positional, so the
  *    parse schema is built FROM the drop's header (cheap — no value
  *    inference pass over 100 TB), with every wire column typed by
  *    [[JsonlDocuments.schema]] and unknown columns carried as strings.
  *    A drop that predates a nullable wire column (e.g. `url`) ingests
  *    unchanged with typed nulls — the same missing-column admittance
  *    as [[OrcDocuments]] — instead of quarantining every row over a
  *    token-count mismatch;
  *  - PERMISSIVE parsing with the corrupt record captured, so one
  *    mangled line neither kills the ingest nor vanishes — the caller
  *    gets (clean rows, quarantined raw lines);
  *  - `multiLine` stays OFF so the scan remains line-splittable (a
  *    multiline CSV forces one task per file);
  *  - derived `n_chars` recomputed, not trusted from the wire.
  */
object CsvDocuments {

  /** @return (clean documents with recomputed n_chars, quarantined raw
    * lines). The split (and its JSON quarantine serialization —
    * unambiguous, unlike a positional CSV reconstruction that loses
    * NULL fields) is [[JsonlDocuments.split]], shared so a hardening
    * change applies to every reader at once. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val byName = JsonlDocuments.schema.fields.map(f => f.name -> f).toMap
    // header names only — inferSchema stays off, so this touches the
    // first line, not the data (drops share one header by contract)
    val headerCols = spark.read.option("header", "true").csv(path)
      .schema.fieldNames
    val parseSchema = StructType(headerCols.map(n =>
      byName.getOrElse(n, StructField(n, StringType, nullable = true))))
    val parsed = spark.read
      .schema(parseSchema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "true")
      .option("multiLine", "false")
      .csv(path)
    val present = headerCols.toSet
    val projected = parsed.select(JsonlDocuments.schema.fields.map { f =>
      (if (present.contains(f.name)) col(f.name)
       else lit(null).cast(f.dataType)).as(f.name)
    } :+ col("_corrupt_record"): _*)
    JsonlDocuments.split(projected.cache())
  }
}
