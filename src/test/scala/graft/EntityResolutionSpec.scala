package graft

/** q146 entity resolution: planted variant clusters with hand-picked edit
  * distances — a 1-edit typo merges, a 3-edit adjective swap does not, and
  * blocking keeps identical-distance names in DIFFERENT noun blocks apart. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("q146: typo variants cluster transitively; blocks and min-label canon") {
    val d = java.nio.file.Files.createTempDirectory("graft_er").toString
    Seq(
      (1L, "red widget"),   // canonical of the widget-typo cluster (min name)
      (2L, "red widget"),   // exact duplicate row — mass 2 under one name
      (3L, "red widgett"),  // 1 edit from "red widget" → merges
      (4L, "blue widget"),  // 3 edits from "red widget" → stays its own entity
      (5L, "tiny bolt"),    // 1 edit from "tin bolt" → merges, canon "tin bolt"
      (6L, "tin bolt"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q146_entity_resolution")(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("blue widget", 1L, 1L, 4L),
      ("red widget", 2L, 3L, 1L),
      ("tin bolt", 2L, 2L, 5L)))
  }
}
