package graft

/** q145 skyline: hand-built frontier exercising every domination case the
  * two-level (bucket window + bucket prefix) plan has to get right —
  * same-price strict-size domination, within-bucket strictly-lower-price
  * domination, and CROSS-bucket domination through the prefix max. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("q145: frontier by hand across price buckets, ties kept") {
    val d = java.nio.file.Files.createTempDirectory("graft_sky").toString
    Seq(
      (1L, 900.0, 10), // frontier (8 is cheaper but smaller; 3 is bigger but dearer)
      (2L, 900.0, 10), // exact duplicate of 1 — neither strictly dominates: both stay
      (9L, 900.0, 9),  // dominated by 1: same price, strictly bigger size
      (3L, 900.5, 12), // frontier; same bucket as 1 — in-bucket window case
      (4L, 901.0, 12), // dominated by 3 from the PREVIOUS bucket: prefix-max case
      (5L, 901.2, 11), // dominated by 3: strictly cheaper AND strictly bigger
      (6L, 950.0, 50), // frontier
      (7L, 960.0, 50), // dominated by 6 across distant buckets
      (8L, 899.0, 1))  // frontier: globally cheapest
      .toDF("p_partkey", "p_retailprice", "p_size")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q145_skyline")(spark, d)
      .as[(Long, Double, Int)].collect().toSeq
    assert(got == Seq((8L, 899.0, 1), (1L, 900.0, 10), (2L, 900.0, 10),
      (3L, 900.5, 12), (6L, 950.0, 50)))
  }
}
