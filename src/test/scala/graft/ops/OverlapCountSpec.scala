package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[OverlapCount]] — the pair-free distinct-overlap algebra behind q72.
  * A hand-computed planted case pins the gap-containment correction and
  * the boundary-minute arithmetic; a seeded random fleet cross-checks the
  * sweep against the brute-force inequality pair join it replaces. */
class OverlapCountSpec extends SparkSpec {
  import spark.implicits._

  private def sess(rows: Seq[(Long, Long, Long, Long)]): DataFrame =
    rows.toDF("entity", "seq", "start_us", "end_us")

  /** The r7 encoding: enumerate pairs, count distinct other entities. */
  private def brute(df: DataFrame): Seq[(Long, Long, Long)] = {
    val a = df.select(col("entity").as("ea"), col("seq").as("sa"),
      col("start_us").as("st_a"), col("end_us").as("en_a"))
    val b = df.select(col("entity").as("eb"),
      col("start_us").as("st_b"), col("end_us").as("en_b"))
    a.join(b, col("ea") =!= col("eb") &&
        col("st_a") <= col("en_b") && col("st_b") <= col("en_a"))
      .select(col("ea"), col("sa"), col("eb")).distinct()
      .groupBy("ea", "sa").agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  private def sweep(df: DataFrame, gapUs: Long): Seq[(Long, Long, Long)] =
    OverlapCount.distinctOverlaps(df, gapUs, coarseUs = 600000000L)
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("planted: contained gap collapses a two-session user to one") {
    // µs layout (minute = 6e7): u1 holds one 6-minute session that fully
    // contains u2's inter-session gap [5e7, 1.3e8] — without the gap
    // correction u2 would be double-counted. u4 starts in the SAME minute
    // u1 ends but 1e6 after it — the boundary-minute term must exclude it.
    val df = sess(Seq(
      (1L, 1L, 0L, 360000000L),
      (2L, 1L, 10000000L, 50000000L), (2L, 2L, 130000000L, 200000000L),
      (3L, 1L, 350000000L, 400000000L),
      (4L, 1L, 361000000L, 370000000L)))
    // by hand: u1s1 → {u2,u3} = 2 (4 intersecting intervals − 1 contained
    // gap − self); u2s1 → {u1}; u2s2 → {u1}; u3s1 → {u1,u4}; u4s1 → {u3}
    assert(sweep(df, gapUs = 60000000L) == Seq(
      (1L, 1L, 2L), (2L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 2L), (4L, 1L, 1L)))
  }

  test("random fleets: sweep equals the brute-force pair join") {
    val rnd = new scala.util.Random(42)
    val gapUs = 3600000000L // 1h, the same role the 2h threshold plays in q72
    for (trial <- 1 to 3) {
      val rows = (1L to 40L).flatMap { ent =>
        var t = rnd.nextInt(48) * 1800000000L // grid-aligned → cross-entity ties
        (1L to (1 + rnd.nextInt(5)).toLong).map { seq =>
          val start = t
          // durations include zero-length (single-event) sessions and
          // multi-hour spans that can contain other entities' gaps
          val dur = (rnd.nextInt(6) match {
            case 0 => 0L
            case k => k * 1800000000L
          }) + rnd.nextInt(3) * 30000000L
          val end = start + dur
          t = end + gapUs + rnd.nextInt(4) * 1800000000L
          (ent, seq, start, end)
        }
      }
      val df = sess(rows)
      assert(sweep(df, gapUs) == brute(df), s"trial $trial diverged")
    }
  }
}
