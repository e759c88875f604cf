package graft

import java.sql.Timestamp

/** Hand-computed fixtures for the round-8 pipeline-hygiene quartet:
  * q147 A/B lift (exact z² rational), q148 seasonal-naive backtest
  * (date join, not row lag — a missing day must break the pairing),
  * q149 FK/data-contract audit (planted orphans), q150 debounce. */
class PipelineAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  private def eventsDir(rows: (Long, String, Long, String)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_paudit").toString
    rows.toSeq
      .map { case (id, t, u, typ) => (id, ts(t), u, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q147: planted 2x2 split — counts, floored ppm, exact z-squared") {
    // control (even ids): user 2 converts, user 4 doesn't;
    // treatment (odd ids): users 1 and 3 both convert.
    val d = eventsDir(
      (1L, "1995-01-01 00:00:00", 1L, "purchase"),
      (2L, "1995-01-01 00:00:01", 2L, "purchase"),
      (3L, "1995-01-01 00:00:02", 3L, "view"),
      (4L, "1995-01-01 00:00:03", 3L, "purchase"),
      (5L, "1995-01-01 00:00:04", 4L, "view"))
    val got = SparkEntry.queries("q147_ab_lift")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // d = x_t·n_c − x_c·n_t = 2·2−1·2 = 2; N = 4, s = 3
    // z² = d²·N / (n_c·n_t·s·(N−s)) = 16/12
    assert(got == Seq((2L, 1L, 500000L, 2L, 2L, 1000000L, 500000L, 16.0 / 12.0)))
  }

  test("q148: seasonal-naive pairs on DATES; a missing day breaks the pair") {
    // click: day1→5, day8→7 (err +2), day15→4 (err −3 vs day8's 7).
    // view: day1→1, day9→9 — NOT 7 days apart, so no eval pair at all.
    def burst(typ: String, day: String, n: Int, base: Long) =
      (0 until n).map(i => (base + i, s"$day 00:00:${10 + i}", 777L, typ))
    val d = eventsDir(
      (burst("click", "1995-01-01", 5, 100L) ++
        burst("click", "1995-01-08", 7, 200L) ++
        burst("click", "1995-01-15", 4, 300L) ++
        burst("view", "1995-01-01", 1, 400L) ++
        burst("view", "1995-01-09", 9, 500L)): _*)
    val got = SparkEntry.queries("q148_seasonal_backtest")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 2L, 5L, -1L, 2500L)))
  }

  test("q149: planted orphans are counted; intact contracts publish zero") {
    val d = java.nio.file.Files.createTempDirectory("graft_fk").toString
    Seq((0L, "r0")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$d/region.parquet")
    Seq((0L, "n0", 0L), (1L, "n_orphan", 9L)) // region 9 doesn't exist
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((10L, "c10", 0L), (11L, "c_orphan", 5L)) // nation 5 doesn't exist
      .toDF("c_custkey", "c_name", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    Seq((20L, "s20")).toDF("s_suppkey", "s_name")
      .write.parquet(s"$d/supplier.parquet")
    Seq((30L, "p30")).toDF("p_partkey", "p_name")
      .write.parquet(s"$d/part.parquet")
    // order 101 → customer 99 (orphan) and a nonpositive total
    Seq((100L, 10L, 50.0, ts("1995-01-01 00:00:00")),
        (101L, 99L, -1.0, ts("1995-01-02 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    // line 2: orphan order 999 + orphan part 31; line 3: discount 1.5
    Seq((100L, 30L, 20L, 0.05, ts("1995-01-01 00:00:00")),
        (999L, 31L, 20L, 0.10, ts("1995-01-03 00:00:00")),
        (100L, 30L, 20L, 1.5, ts("1995-01-04 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_discount", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, ts("1995-01-01 00:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q149_fk_audit")(spark, d)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("customer_orphan_nation", 1L),
      ("events_null_user", 0L),
      ("lineitem_discount_range", 1L),
      ("lineitem_orphan_order", 1L),
      ("lineitem_orphan_part", 1L),
      ("lineitem_orphan_supplier", 0L),
      ("nation_orphan_region", 1L),
      ("orders_nonpositive_total", 1L),
      ("orders_orphan_customer", 1L)))
  }

  test("q150: burst within 5s drops; the 5s boundary itself is kept") {
    val d = eventsDir(
      (1L, "1995-01-01 00:00:00", 1L, "click"),
      (2L, "1995-01-01 00:00:03", 1L, "click"),  // 3s gap — dropped
      (3L, "1995-01-01 00:00:08", 1L, "click"),  // exactly 5s — kept
      (4L, "1995-01-01 00:00:01", 2L, "click"),  // other user: independent
      (5L, "1995-01-01 00:00:02", 1L, "view"))   // other type: independent
    val got = SparkEntry.queries("q150_debounce")(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 4L, 3L, 250000L), ("view", 1L, 1L, 0L)))
  }
}
