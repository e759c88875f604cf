package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}

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

  test("q159: first significant digits come off the cents string, zeros published") {
    val d = java.nio.file.Files.createTempDirectory("graft_benford").toString
    // digits: 150.00→1, 19.99→1, 1.00→1, 2000.00→2, 0.05→5 (sub-unit
    // price: the cents string "5" IS the first significant digit),
    // 999.99→9 → n=6: shares 3/6, 1/6, 1/6, 1/6
    Seq((1L, "150.00"), (2L, "19.99"), (3L, "1.00"), (4L, "2000.00"),
      (5L, "0.05"), (6L, "999.99"))
      .toDF("o_orderkey", "p")
      .withColumn("o_totalprice", col("p").cast("decimal(15,2)")).drop("p")
      .withColumn("o_orderdate", lit("1995-01-01"))
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q159_benford_audit")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val benford = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val n = Map(1L -> 3L, 2L -> 1L, 5L -> 1L, 9L -> 1L).withDefaultValue(0L)
    val expected = (1L to 9L).map { dgt =>
      val ppm = 1000000L * n(dgt) / 6L
      (dgt, n(dgt), ppm, benford(dgt.toInt - 1), ppm - benford(dgt.toInt - 1))
    }
    assert(got == expected)
  }

  test("q160: interval sweep counts concurrently open orders by hand") {
    val d = java.nio.file.Files.createTempDirectory("graft_sweep").toString
    // A: open Jan 1-3; B: open Jan 2 only; C: open Feb 1; D: last ship
    // BEFORE the order date (clamped to open Jan 5 only); E: no
    // lineitems (excluded). Daily active: Jan1=1 Jan2=2 Jan3=1 Jan5=1.
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-02-01"),
      (4L, "2024-01-05"), (5L, "2024-01-10"))
      .toDF("o_orderkey", "o_orderdate")
      .withColumn("o_totalprice", lit("10.00").cast("decimal(15,2)"))
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, "2024-01-02"), (1L, "2024-01-03"), (2L, "2024-01-02"),
      (3L, "2024-02-01"), (4L, "2024-01-04"))
      .toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q160_open_orders")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("2024-01", 3L, 2L), ("2024-02", 1L, 1L)))
  }

  test("q161: cohort LTV accumulates exact cents per cohort week") {
    // week 0 = 2024-01-01, week 1 = exactly +7 days (adjacent epoch-week
    // buckets regardless of phase). u1: $10 in week 0, $20 in week 1;
    // u2: $5 in week 0 only → cohort of 2 users.
    val d = java.nio.file.Files.createTempDirectory("graft_ltv").toString
    Seq((1L, "2024-01-01 12:00:00", 1L, 10.0), (2L, "2024-01-08 12:00:00", 1L, 20.0),
      (3L, "2024-01-01 13:00:00", 2L, 5.0))
      .map { case (id, t, u, v) => (id, ts(t), u, "purchase", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q161_cohort_ltv")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val w0 = got.head._1 // absolute epoch week index
    assert(got == Seq(
      (w0, 0L, 2L, 2L, 1500L, 1500L, 750000L),
      (w0, 1L, 2L, 1L, 2000L, 3500L, 1750000L)))
  }

  test("q162: skew audit reads max/median off the frequency grid") {
    val d = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // partkey: 1×4, 2×1, 3×1 (skewed); suppkey: 6 distinct (flat);
    // orderkey: two keys ×3 (flat but dense)
    Seq((1L, 1L, 10L), (1L, 1L, 20L), (1L, 1L, 30L),
      (2L, 1L, 40L), (2L, 2L, 50L), (2L, 3L, 60L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .withColumn("l_shipdate", lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q162_skew_audit")(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("l_orderkey", 2L, 6L, 3L, 3L, 500000L, 1000L),
      ("l_partkey", 3L, 6L, 4L, 1L, 666666L, 4000L),
      ("l_suppkey", 6L, 6L, 1L, 1L, 166666L, 1000L)))
  }

  test("q152: RFM quintile scores are tie-stable and hand-checkable") {
    // user k (k = 1..5) makes k purchases of 10·k dollars on day
    // 2024-01-0k. All three metric grids are 5 distinct values with one
    // user each, so quintile cutoffs land exactly on the sorted values:
    //   freq = k         → f score = k
    //   mon_d = 10·k²    → m score = k
    //   rec = 5−k days   → ascending score 6−k → r = 6−(6−k) = k
    // so each user occupies segment (k,k,k) with sum_mon_c = 1000·k².
    val d = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    (1 to 5).flatMap { k =>
      (1 to k).map(i =>
        (k * 10L + i, ts(s"2024-01-0$k 12:00:0$i"), k.toLong, "purchase",
          10.0 * k, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q152_rfm_segments")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expected = (1 to 5).map { k =>
      (k.toLong, k.toLong, k.toLong, 1L, 1000L * k * k)
    }
    assert(got == expected)
  }

  test("q158: conversion latency buckets by day; non-converters drop out") {
    val d = eventsDir(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-02 12:00:00", 1L, "purchase"), // 36 h → day 1
      (3L, "2024-01-01 00:00:00", 2L, "view"),
      (4L, "2024-01-01 01:00:00", 2L, "purchase"), // 1 h → day 0
      (5L, "2024-01-01 00:00:00", 3L, "view"),     // never purchases
      (6L, "2024-01-01 00:00:00", 4L, "purchase"), // never views
      (7L, "2024-01-05 00:00:00", 5L, "view"),     // purchase BEFORE view
      (8L, "2024-01-01 00:00:00", 5L, "purchase"))
    val got = SparkEntry.queries("q158_time_to_convert")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 500000L), (1L, 1L, 1000000L)))
  }

  test("q153: a planted 2-day lead is found as the best lag") {
    // views on day d follow a jagged pattern; purchases replay it 2 days
    // later exactly, so lag +2 correlates perfectly (corr_ppm at the
    // floor boundary of 10⁶) and every other lag scores strictly lower.
    val pattern = Seq(1, 5, 2, 8, 3, 9, 4, 7, 6, 10)
    val d = java.nio.file.Files.createTempDirectory("graft_xcorr").toString
    val rows = pattern.zipWithIndex.flatMap { case (n, i) =>
      val vday = i + 1 // views on 2024-01-(i+1)
      (1 to n).map(j => (s"v$vday-$j", f"2024-01-$vday%02d 10:00:00", "view")) ++
        (1 to n).map(j =>
          (s"p$vday-$j", f"2024-01-${vday + 2}%02d 10:00:00", "purchase"))
    }
    rows.zipWithIndex
      .map { case ((_, t, typ), i) => (i.toLong, ts(t), 1L, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q153_leadlag_xcorr")(spark, d)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val best = got.filter(_._4 == 1L)
    assert(best.map(_._1) == Seq(2), s"best lag must be +2, got $got")
    assert(best.head._3 >= 999999L, "perfect replay must score ~1e6 ppm")
    got.filter(_._1 != 2).foreach { case (lag, _, ppm, _) =>
      assert(ppm < best.head._3, s"lag $lag must score below the true lag")
    }
  }
}
