package graft

import java.sql.Timestamp

/** Round-8 additions: portable HLL (q183), event-time disorder audit
  * (q184), and full DBSCAN (q185) on planted fixtures. */
class HllDisorderDbscanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  test("q183: the register table is duplication-insensitive (MAX algebra)") {
    // the property that makes HLL mergeable: inserting every element
    // twice must leave registers — and therefore the estimate — EXACTLY
    // unchanged (a SUM-based sketch would double)
    def mkDir(dup: Boolean): String = {
      val d = java.nio.file.Files.createTempDirectory("graft_hll").toString
      val base = (1L to 200L).map(u =>
        (u, ts("2024-01-01 00:00:00"), u, "click", 1.0, "{}"))
      val rows = if (dup) base ++ base.map { case (id, t, u, e, v, p) =>
        (id + 10000L, t, u, e, v, p) } else base
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$d/events.parquet")
      d
    }
    val once = SparkEntry.queries("q183_hll_portable")(spark, mkDir(false))
      .collect().toSeq
    val twice = SparkEntry.queries("q183_hll_portable")(spark, mkDir(true))
      .collect().toSeq
    assert(once == twice)
    assert(once.nonEmpty && once.head.getLong(4) > 0) // est_hll > 0
  }

  test("q184: a displaced event's lateness is the high-water-mark gap") {
    val d = java.nio.file.Files.createTempDirectory("graft_wm").toString
    // event 37 (displaced by the % 37 rule to arrival 5037) carries an
    // EARLY timestamp but arrives after ids 38/39 — its lateness is the
    // gap to the running max (event 39's time, 2h later = 7.2e9 µs, an
    // 10-digit bucket, above the 1h drop threshold); everything else is
    // on time
    val rows = Seq(
      (36L, ts("2024-01-01 10:00:00")),
      (37L, ts("2024-01-01 10:30:00")), // displaced; hwm will be 12:30
      (38L, ts("2024-01-01 11:30:00")),
      (39L, ts("2024-01-01 12:30:00")))
      .map { case (id, t) => (id, t, 1L, "click", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q184_disorder_audit")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val lateUs = 2L * 3600L * 1000000L // 12:30 − 10:30
    assert(got == Seq(
      (0L, 3L, 0L, 0L),
      (10L, 1L, lateUs, 1L)))
  }

  test("q185: planted core cluster, border point, and noise are classified exactly") {
    val d = java.nio.file.Files.createTempDirectory("graft_dbscan").toString
    // adaptive eps at n = 7: floor(7000·√(2000/7)) = 118322µ. Five
    // mutually-within-eps points (each with 4 neighbors → all core),
    // one point near only two of them (2 < MinPts → border, joins the
    // cluster), one far point (noise). Coordinates are exact binary
    // fractions so the micro floors are hand-computable.
    val pts = Seq(
      (2L, 0f), (3L, 1f / 64), (4L, 2f / 64), (5L, 3f / 64),
      (6L, 4f / 64),    // core cluster, micro x = 0..62500 (Δmax 62500)
      (9L, 10f / 64),   // 156250µ: within eps of 46875/62500 only → border
      (11L, 0.875f))    // 875000µ: noise
    pts.map { case (id, x) => (id, Seq(x, 0f)) }
      .toDF("vec_id", "embedding")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q185_dbscan")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((-1L, 0L, 0L, 1L), (2L, 5L, 1L, 6L)))
  }
}
