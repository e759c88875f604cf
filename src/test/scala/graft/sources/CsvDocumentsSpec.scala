package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** CSV source hardening: schema-first parse, malformed lines quarantined
  * not dropped, missing required fields quarantined, n_chars recomputed. */
class CsvDocumentsSpec extends SparkSpec {
  import spark.implicits._

  test("bad lines are quarantined; clean rows parse with recomputed n_chars") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("part0.csv"),
      Seq(
        "doc_id,text,lang,source",
        "1,hello world,en,s0",
        "2,ok,,s1",
        "not_a_number,broken row,xx,s9",   // doc_id fails the LongType parse
        ",orphan,en,s2"                     // missing required doc_id
      ).mkString("\n"))

    val (clean, quarantined) = CsvDocuments.read(spark, dir.toString)
    val rows = clean
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, Option[String], Option[String], Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "hello world", Some("en"), Some("s0"), 11L),
      (2L, "ok", None, Some("s1"), 2L)))
    val quar = quarantined.as[String].collect().toSeq
    assert(quar.length == 2)
    assert(quar.exists(_.contains("not_a_number")))
  }

  test("an empty drop reads as (empty clean, empty quarantine), never a " +
      "dead ingest") {
    val dir = Files.createTempDirectory("graft_csv_empty")
    Files.writeString(dir.resolve("part0.csv"), "")
    val (clean, quarantined) = CsvDocuments.read(spark, dir.toString)
    assert(clean.count() == 0L && quarantined.count() == 0L)
    assert(clean.columns.contains("doc_id") && clean.columns.contains("n_chars"))
  }

  test("a NONEXISTENT path still fails the job: a typo'd mount must not " +
      "read as a clean zero-row ingest") {
    intercept[org.apache.spark.sql.AnalysisException] {
      CsvDocuments.read(spark, "/no/such/graft/drop/path")
    }
  }

  test("case-variant headers admit: wire columns match case-insensitively") {
    val dir = Files.createTempDirectory("graft_csv_case")
    Files.writeString(dir.resolve("part0.csv"), Seq(
      "Doc_ID,Text,Lang,Source",
      "7,seven words here,en,s0").mkString("\n"))
    val (clean, quarantined) = CsvDocuments.read(spark, dir.toString)
    assert(quarantined.count() == 0L)
    val got = clean.select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((7L, "seven words here", 16L)))
  }

  test("duplicate headers after case-folding admit: first occurrence is " +
      "the wire column, later ones ride along renamed") {
    // `text,TEXT` used to build a parse schema with two identical
    // canonical fields — the select(col("text")) then died on an
    // ambiguous reference and killed the whole ingest
    val dir = Files.createTempDirectory("graft_csv_dup")
    Files.writeString(dir.resolve("part0.csv"), Seq(
      "doc_id,text,TEXT,lang,source",
      "3,first copy,second copy,en,s0").mkString("\n"))
    val (clean, quarantined) = CsvDocuments.read(spark, dir.toString)
    assert(quarantined.count() == 0L)
    val got = clean.select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((3L, "first copy", 10L)))
  }

  test("round-trip: a written corpus re-reads clean") {
    val dir = Files.createTempDirectory("graft_csv_rt").toString
    val docs = Seq(
      (10L, "alpha beta", "en", "s0"),
      (11L, "gamma, with comma", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    docs.write.option("header", "true").csv(s"$dir/out")
    val (clean, quarantined) = CsvDocuments.read(spark, s"$dir/out")
    assert(quarantined.count() == 0L)
    val got = clean.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, "alpha beta"), (11L, "gamma, with comma")))
  }
}
