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
    // wire columns matched case-insensitively: Spark's own resolution is
    // case-insensitive and the pre-header-driven reader was positional,
    // so a drop with `Doc_ID,Text,...` must keep admitting — the parse
    // schema carries the canonical wire names (positional under the
    // default enforceSchema), unknown columns ride along as strings
    val byName =
      JsonlDocuments.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    // header names only — inferSchema stays off, so this touches the
    // first line, not the data (drops share one header by contract).
    // The probe reads the RAW first line (header=false + limit 1) rather
    // than asking Spark for the header schema: Spark's own header read
    // renames case-insensitively-colliding names (`text,TEXT` comes back
    // `text1,TEXT2`), which would hide the real wire column from the
    // byName match below and quarantine every row of the drop
    val headerCols =
      try {
        val first = spark.read.csv(path).limit(1).collect()
        if (first.isEmpty) Array.empty[String]
        else first(0).toSeq.map(v => if (v == null) "" else v.toString).toArray
      } catch {
        // an EMPTY drop (a dir with only 0-byte parts) has no header to
        // read — the hardened contract is (empty clean, empty
        // quarantine), never a dead ingest job. ONLY that case maps to
        // empty: a nonexistent/mistyped path must still FAIL the job —
        // swallowing PATH_NOT_FOUND would report a typo'd mount as a
        // clean zero-row ingest, silent total data loss
        case ae: org.apache.spark.sql.AnalysisException
            if Option(ae.getCondition).exists(_.contains("UNABLE_TO_INFER_SCHEMA")) =>
          Array.empty[String]
      }
    if (headerCols.isEmpty) {
      val cleanSchema = StructType(JsonlDocuments.schema.fields :+
        StructField("n_chars", org.apache.spark.sql.types.LongType,
          nullable = true))
      val quarSchema = StructType(
        Seq(StructField("raw_line", StringType, nullable = true)))
      return (
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          cleanSchema),
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          quarSchema))
    }
    // duplicate header names after case-folding (e.g. `text,TEXT`) would
    // put two identical canonical fields in the parse schema and make the
    // later select(col("text")) an ambiguous-reference AnalysisException —
    // a dead ingest, against the hardened-reader contract. The FIRST
    // occurrence keeps the wire name (and its type); later duplicates are
    // carried as uniquely-renamed string columns (positional parsing under
    // the default enforceSchema keeps every value attached to its column).
    val seen = scala.collection.mutable.Set.empty[String]
    val parseSchema = StructType(headerCols.zipWithIndex.map { case (n, i) =>
      val canon = n.toLowerCase
      if (seen.add(canon))
        byName.getOrElse(canon, StructField(n, StringType, nullable = true))
      else StructField(s"_dup_${i}_$n", StringType, nullable = true)
    })
    val parsed = spark.read
      .schema(parseSchema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "true")
      .option("multiLine", "false")
      .csv(path)
    val present = headerCols.map(_.toLowerCase).toSet
    val projected = parsed.select(JsonlDocuments.schema.fields.map { f =>
      (if (present.contains(f.name)) col(f.name)
       else lit(null).cast(f.dataType)).as(f.name)
    } :+ col("_corrupt_record"): _*)
    // not cached — the caller decides (see JsonlDocuments.read)
    JsonlDocuments.split(projected)
  }
}
