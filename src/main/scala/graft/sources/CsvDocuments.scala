package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** @return (clean documents with recomputed n_chars, quarantined lines).
    * The split (and its JSON quarantine serialization — unambiguous,
    * unlike a positional CSV reconstruction that loses NULL fields) is
    * [[JsonlDocuments.split]], shared so a hardening change applies to
    * every reader at once. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    JsonlDocuments.split(spark.read
      .schema(JsonlDocuments.schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "true")
      .option("multiLine", "false")
      .csv(path)
      .cache())
}
