package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** ORC source hardening: explicit projection + casts, required-field
  * quarantine (the columnar failure mode), n_chars recomputed. */
class OrcDocumentsSpec extends SparkSpec {
  import spark.implicits._

  test("null required fields quarantine; clean rows recompute n_chars") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Seq(
      (Some(1L), Some("hello world"), Some("en"), Some("s0")),
      (Some(2L), Some("ok"), None, Some("s1")),
      (None, Some("orphan text"), Some("en"), Some("s2")),      // no doc_id
      (Some(4L), None, Some("en"), Some("s3")))                 // no text
      .toDF("doc_id", "text", "lang", "source")
      .write.orc(s"$dir/out")
    val (clean, quarantined) = OrcDocuments.read(spark, s"$dir/out")
    val rows = clean
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, Option[String], Option[String], Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "hello world", Some("en"), Some("s0"), 11L),
      (2L, "ok", None, Some("s1"), 2L)))
    val quar = quarantined.as[String].collect().toSeq
    assert(quar.length == 2)
    assert(quar.exists(_.contains("orphan text")))
  }

  test("a drop missing a nullable column admits with nulls; a missing " +
       "required column quarantines rows instead of killing the read") {
    val dir = Files.createTempDirectory("graft_orc_miss").toString
    Seq((1L, "no lang column here", "s0"))
      .toDF("doc_id", "text", "source")
      .write.orc(s"$dir/nolang")
    val (clean, quarantined) = OrcDocuments.read(spark, s"$dir/nolang")
    assert(quarantined.count() == 0L)
    assert(clean.select("doc_id", "lang").as[(Long, Option[String])]
      .collect().toSeq == Seq((1L, None)))

    Seq((2L, "en", "s0")).toDF("doc_id", "lang", "source")
      .write.orc(s"$dir/notext") // REQUIRED text column absent entirely
    val (clean2, quarantined2) = OrcDocuments.read(spark, s"$dir/notext")
    assert(clean2.count() == 0L && quarantined2.count() == 1L)
  }

  test("an int-typed doc_id column casts up to the wire schema's long") {
    val dir = Files.createTempDirectory("graft_orc_cast").toString
    Seq((7, "typed narrow", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.orc(s"$dir/out")
    val (clean, quarantined) = OrcDocuments.read(spark, s"$dir/out")
    assert(quarantined.count() == 0L)
    assert(clean.select("doc_id", "n_chars").as[(Long, Long)].collect().toSeq
      == Seq((7L, 12L)))
  }
}
