package graft

/** Empty-input totality: every declared query must execute (not throw) on
  * a dataset whose every table is empty-but-schema'd. At 100 TB empty is
  * not an edge case — empty partitions, empty daily drops, empty sources
  * after a filter — and the classic traps (descending `sequence(1, 0)`,
  * argmax over no rows, division in a 0-row aggregate, explode of a
  * guard-less slice) all bite exactly here. The full inventory ran clean
  * against empty tables when this spec was introduced; it keeps that
  * true. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    // events.ts is TIMESTAMP(NANOS): read raw as epoch-nanos LONG so the
    // written empty copy round-trips through Tables.events' long branch
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query in the inventory executes on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
