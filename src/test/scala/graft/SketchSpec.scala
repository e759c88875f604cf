package graft

import org.apache.spark.sql.functions._

/** q131 KMV bottom-k sketch: the sparse branch is exact by definition;
  * the sketch branch must land within KMV's theoretical error envelope
  * (σ ≈ 1/√(k−2) ≈ 13% at k=64 — the fixture is deterministic, so the
  * bound is a hard assert, not a flaky tolerance). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(users: Map[String, Int]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    users.toSeq
      .flatMap { case (et, n) => (1 to n).map(u => (et, u.toLong)) }
      .toDF("event_type", "user_id")
      .withColumn("event_id", col("user_id"))
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("value", lit(1.0))
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q131: sparse branch is exact, sketch branch is within 3 sigma") {
    // "sparse" has 63 users (< k=64) → the sketch IS the set, err 0;
    // "dense" has 5000 → the (k−1)·2⁶⁰/h_k estimator with its ~13% σ
    val d = eventsDir(Map("sparse" -> 63, "dense" -> 5000))
    val got = SparkEntry.queries("q131_kmv_distinct")(spark, d)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("sparse") == ((63L, 63L, 0L)))
    val (exact, est, errPpm) = got("dense")
    assert(exact == 5000L)
    assert(errPpm == 1000000L * math.abs(est - exact) / exact)
    assert(errPpm <= 390000L, s"estimate $est off by $errPpm ppm (> 3 sigma)")
  }
}
