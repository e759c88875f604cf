package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JSONL source hardening: schema-first parse, corrupt lines quarantined
  * not dropped, missing required fields quarantined, n_chars recomputed. */
class JsonlDocumentsSpec extends SparkSpec {
  import spark.implicits._

  test("bad lines are quarantined; clean rows parse with recomputed n_chars") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("part0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""",
        """{"doc_id": 2, "text": "ok", "lang": null, "source": "s1"}""",
        """{this is not json at all""",                    // corrupt line
        """{"doc_id": null, "text": "orphan"}""",          // missing required id
        """{"doc_id": 5, "lang": "de"}"""                  // missing required text
      ).mkString("\n"))

    val (clean, quarantined) = JsonlDocuments.read(spark, dir.toString)
    val rows = clean
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, Option[String], Option[String], Long)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "hello world", Some("en"), Some("s0"), 11L),
      (2L, "ok", None, Some("s1"), 2L)))
    // 3 quarantined: the unparseable line + two with missing required fields
    val quar = quarantined.as[String].collect().toSeq
    assert(quar.length == 3)
    assert(quar.exists(_.contains("this is not json")))
  }
}
