package graft

import java.sql.Timestamp

/** Round-7 change-data (q84–q86) and exact-stats (q87–q89) families on
  * planted fixtures small enough to verify by hand. (Cross-engine value
  * equality is the oracle gate's job; these pin the SEMANTICS.) */
class ChangeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  private def ordersDir(rows: (Long, Long, String, Double, String)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq
      .map { case (k, c, st, p, dt) => (k, c, st, p, ts(dt)) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    d
  }

  test("q84: intersect/except cohorts are set-semantic and disjoint") {
    // cust 1 orders in both years (twice in 1996 — set semantics must
    // collapse it), cust 2 only 1996, cust 3 only 1997, cust 4 neither.
    val dir = ordersDir(
      (1L, 1L, "O", 10.0, "1996-02-01 00:00:00"),
      (2L, 1L, "O", 10.0, "1996-03-01 00:00:00"),
      (3L, 1L, "O", 10.0, "1997-02-01 00:00:00"),
      (4L, 2L, "O", 10.0, "1996-05-01 00:00:00"),
      (5L, 3L, "O", 10.0, "1997-05-01 00:00:00"),
      (6L, 4L, "O", 10.0, "1995-05-01 00:00:00"))
    val got = SparkEntry.queries("q84_set_ops")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("both" -> 1L, "only_1996" -> 2L, "only_1997" -> 3L))
  }

  test("q85: snapshot diff classifies added/removed/changed/same") {
    // key 5: in both versions, untouched        → same
    // key 7: dated between the cuts             → added (B only)
    // key 202 = 2·101: scrubbed from version B  → removed
    // key 97: status rewritten to 'X' in B      → changed
    val dir = ordersDir(
      (5L,   1L, "F", 11.0, "1998-01-01 00:00:00"),
      (7L,   1L, "O", 12.0, "1999-06-01 00:00:00"),
      (202L, 2L, "F", 13.0, "1998-02-01 00:00:00"),
      (97L,  3L, "F", 14.0, "1998-03-01 00:00:00"))
    val got = SparkEntry.queries("q85_snapshot_diff")(spark, dir)
      .select("cls", "n", "min_key", "max_key")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("added", 1L, 7L, 7L),
      ("changed", 1L, 97L, 97L),
      ("removed", 1L, 202L, 202L),
      ("same", 1L, 5L, 5L)))
  }

  private def eventsDir(rows: (Long, String, Long, String)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq
      .map { case (id, t, u, typ) => (id, ts(t), u, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q86: SCD2 collapses runs; closed durations exclude the open version") {
    // user 1: A A B B A → versions open at t1(A), t3(B), t5(A);
    // closed span = (t3−t1) + (t5−t3) = t5−t1 = 4 h; version 3 stays open.
    // user 2: single event → one open version, zero closed duration.
    val dir = eventsDir(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (2L, "2024-01-01 01:00:00", 1L, "A"),
      (3L, "2024-01-01 02:00:00", 1L, "B"),
      (4L, "2024-01-01 03:00:00", 1L, "B"),
      (5L, "2024-01-01 04:00:00", 1L, "A"),
      (6L, "2024-01-01 00:00:00", 2L, "C"))
    val got = SparkEntry.queries("q86_scd2_history")(spark, dir)
      .select("user_id", "n_versions", "closed_dur_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 4L * 3600L * 1000000L), (2L, 1L, 0L)))
  }

  private def lineitemDir(rows: (String, Double)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq.zipWithIndex
      .map { case ((f, q), i) =>
        (i.toLong + 1L, f, q, ts("1995-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q87: variance numerator/denominator are exact integers") {
    // flag A: {2, 4, 6} → n=3, Σ=12, Σ²=56, var_num = 3·56 − 144 = 24,
    // var_den = 6 (sample variance 4 exactly), mean_c = 400.
    val dir = lineitemDir(("A", 2.0), ("A", 4.0), ("A", 6.0), ("B", 5.0))
    val got = SparkEntry.queries("q87_exact_moments")(spark, dir)
      .select("l_returnflag", "n", "var_num", "var_den", "mean_c")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 24.0, 6.0, 400L), ("B", 1L, 0.0, 0.0, 500L)))
  }

  private def docsDir(rows: (Long, String, Long)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq
      .map { case (id, src, nc) => (id, "t", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q88: histogram buckets are fixed-width with a capped tail") {
    val dir = docsDir(
      (1L, "s0", 10L), (2L, "s0", 49L),  // bucket 0
      (3L, "s0", 50L),                   // bucket 1
      (4L, "s0", 9999L))                 // DIV gives 199 → capped to 11
    val got = SparkEntry.queries("q88_length_histogram")(spark, dir)
      .select("bucket", "n", "share_pm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 500L), (1L, 1L, 250L), (11L, 1L, 250L)))
  }

  test("q90: funnel steps must complete strictly in order") {
    // user 1 converts fully in order; user 2 clicked BEFORE viewing (the
    // click must not count) and never purchases; user 3 purchases before
    // clicking (stage 3 requires a post-click purchase — none exists).
    val dir = eventsDir(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      (4L, "2024-01-01 00:00:00", 2L, "click"),
      (5L, "2024-01-01 01:00:00", 2L, "view"),
      (6L, "2024-01-01 00:00:00", 3L, "view"),
      (7L, "2024-01-01 01:00:00", 3L, "purchase"),
      (8L, "2024-01-01 02:00:00", 3L, "click"))
    val got = SparkEntry.queries("q90_funnel")(spark, dir)
      .select("stage", "n_users")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("q91: retention counts users per (cohort week, offset)") {
    // Weeks are absolute epoch-week indices; 2024-01-04 and 2024-01-11
    // land in consecutive epoch weeks (Thursday boundary). User 1 active
    // both weeks, user 2 only the first, user 3 starts in the second.
    val dir = eventsDir(
      (1L, "2024-01-04 12:00:00", 1L, "view"),
      (2L, "2024-01-11 12:00:00", 1L, "view"),
      (3L, "2024-01-04 12:00:00", 2L, "view"),
      (4L, "2024-01-11 12:00:00", 3L, "view"))
    val got = SparkEntry.queries("q91_retention")(spark, dir)
      .select("offset_w", "n_users")
      .as[(Long, Long)].collect().toSeq
      .groupBy(identity).map { case (k, v) => (k, v.size) } // (offset,n)→count
    // cohort week W: offset 0 has 2 users (1, 2), offset 1 has 1 (user 1);
    // cohort week W+1: offset 0 has 1 user (user 3)
    assert(got == Map((0L, 2L) -> 1, (1L, 1L) -> 1, (0L, 1L) -> 1))
  }

  test("q92: transition matrix counts ordered pairs per user") {
    // user 1: A→B→A gives A→B, B→A; user 2: A→B gives A→B.
    val dir = eventsDir(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (2L, "2024-01-01 01:00:00", 1L, "B"),
      (3L, "2024-01-01 02:00:00", 1L, "A"),
      (4L, "2024-01-01 00:00:00", 2L, "A"),
      (5L, "2024-01-01 01:00:00", 2L, "B"))
    val got = SparkEntry.queries("q92_transitions")(spark, dir)
      .select("from_type", "to_type", "n", "share_pm")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 2L, 1000L), ("B", "A", 1L, 1000L)))
  }

  test("q93: negative week-over-week change truncates like the positive side") {
    // weeks: 100c → 50c → 150c; the -500pm row is the Spark-DIV vs
    // DuckDB-floor trap this query's sign/abs discipline exists for.
    val dir = ordersDir(
      (1L, 1L, "O", 1.00, "2024-01-01 00:00:00"),
      (2L, 1L, "O", 0.50, "2024-01-08 00:00:00"),
      (3L, 1L, "O", 1.50, "2024-01-15 00:00:00"))
    val got = SparkEntry.queries("q93_weekly_delta")(spark, dir)
      .select("revenue_c", "delta_c", "change_pm")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (100L, None, None),
      (50L, Some(-50L), Some(-500L)),
      (150L, Some(100L), Some(2000L))))
  }

  private def custDir(base: String,
                      rows: (Long, Long)*): String = {
    // (c_custkey, c_nationkey) + a single-nation nation table, written
    // next to an existing orders fixture dir
    rows.toSeq.map { case (ck, nk) => (ck, nk, "SEG") }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.parquet(s"$base/customer.parquet")
    Seq((0L, "N0"), (1L, "N1"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$base/nation.parquet")
    base
  }

  test("q94: CUBE emits the cross-marginals ROLLUP lacks") {
    val base = ordersDir(
      (1L, 1L, "O", 1.00, "1996-02-01 00:00:00"),
      (2L, 1L, "O", 2.00, "1996-03-01 00:00:00"),
      (3L, 2L, "O", 4.00, "1996-04-01 00:00:00"))
    // priorities default absent from ordersDir — add them via overwrite
    Seq((1L, 1L, "O", 1.00, ts("1996-02-01 00:00:00"), "1-URGENT"),
        (2L, 1L, "O", 2.00, ts("1996-03-01 00:00:00"), "2-HIGH"),
        (3L, 2L, "O", 4.00, ts("1996-04-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$base/orders.parquet")
    custDir(base, (1L, 0L), (2L, 0L))
    val got = SparkEntry.queries("q94_cube_marginals")(spark, base)
      .select("segment", "priority", "n_orders")
      .as[(String, String, Long)].collect().toSeq
    // 2 dims × (detail, marginal) = 4 grouping sets; the (all, priority)
    // rows are the CUBE-only cross-marginals
    assert(got.contains(("(all)", "1-URGENT", 2L)))
    assert(got.contains(("(all)", "2-HIGH", 1L)))
    assert(got.contains(("(all)", "(all)", 3L)))
    assert(got.contains(("SEG", "(all)", 3L)))
  }

  test("q95: membership is exact integer cross-multiplication") {
    // nation N0: customers 1 (3 orders), 2 (0 orders) → avg 1.5;
    // only customer 1 exceeds it (3·2 > 3; 0·2 > 3 is false).
    val base = ordersDir(
      (1L, 1L, "O", 1.00, "1996-02-01 00:00:00"),
      (2L, 1L, "O", 1.00, "1996-03-01 00:00:00"),
      (3L, 1L, "O", 1.00, "1996-04-01 00:00:00"))
    custDir(base, (1L, 0L), (2L, 0L))
    val got = SparkEntry.queries("q95_above_nation_avg")(spark, base)
      .select("c_custkey", "n_orders", "nat_orders", "nat_custs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 3L, 2L)))
  }

  test("random cross-check: behavioral queries match naive per-user folds") {
    // 400 seeded-random events over 20 users × 5 types: the distributed
    // funnel/SCD2/retention/transition queries must agree with direct
    // Scala folds over each user's (ts, event_id)-ordered sequence.
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "signup", "error")
    val events = (1 to 400).map { i =>
      (i.toLong,
        f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00",
        1L + rnd.nextInt(20), types(rnd.nextInt(5)))
    }
    val dir = eventsDir(events: _*)
    def us(e: (Long, String, Long, String)): Long = ts(e._2).getTime * 1000L
    val byUser = events.groupBy(_._3).map { case (u, es) =>
      u -> es.toSeq.sortBy(e => (us(e), e._1))
    }

    // funnel: first view, first click strictly after it, first purchase after that
    val naiveFunnel = byUser.values.map { seq =>
      def first(typ: String, after: Long): Option[Long] =
        seq.collectFirst { case e if e._4 == typ && us(e) > after => us(e) }
      first("view", Long.MinValue).map { t1 =>
        (1, first("click", t1).map(t2 =>
          (1, first("purchase", t2).map(_ => 1).getOrElse(0))).getOrElse((0, 0)))
      }.map { case (v, (c, p)) => (v, c, p) }.getOrElse((0, 0, 0))
    }.toSeq
    val expFunnel = Seq(naiveFunnel.map(_._1).sum.toLong,
      naiveFunnel.map(_._2).sum.toLong, naiveFunnel.map(_._3).sum.toLong)
    val gotFunnel = SparkEntry.queries("q90_funnel")(spark, dir)
      .select("n_users").as[Long].collect().toSeq
    assert(gotFunnel == expFunnel)
    assert(expFunnel(0) >= expFunnel(1) && expFunnel(1) >= expFunnel(2))

    // SCD2: versions = runs of equal consecutive types
    val expVersions = byUser.map { case (u, seq) =>
      u -> (1L + seq.map(_._4).sliding(2).count {
        case Seq(a, b) => a != b; case _ => false })
    }
    val gotVersions = SparkEntry.queries("q86_scd2_history")(spark, dir)
      .select("user_id", "n_versions").as[(Long, Long)].collect().toMap
    assert(gotVersions == expVersions)

    // retention: per (min-week cohort, offset) distinct users
    val WeekUs = 7L * 86400L * 1000000L
    val expRet = byUser.toSeq.flatMap { case (u, seq) =>
      val weeks = seq.map(e => us(e) / WeekUs).distinct
      val cohort = weeks.min
      weeks.map(w => ((cohort, w - cohort), u))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size.toLong }
    val gotRet = SparkEntry.queries("q91_retention")(spark, dir)
      .select("cohort_week", "offset_w", "n_users")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotRet == expRet)

    // transitions: consecutive (from, to) pair counts
    val expTrans = byUser.values.flatMap { seq =>
      seq.map(_._4).sliding(2).collect { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val gotTrans = SparkEntry.queries("q92_transitions")(spark, dir)
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotTrans == expTrans)
  }

  test("q96: churn counts users absent the following week; last week excluded") {
    // weeks W, W+1, W+2: user 1 active all three (never churns in W..W+1),
    // user 2 active only W (churns at W), user 3 active W+1 only (churns
    // at W+1). W+2 is the final week — not assessable, excluded.
    val dir = eventsDir(
      (1L, "2024-01-04 12:00:00", 1L, "view"),
      (2L, "2024-01-11 12:00:00", 1L, "view"),
      (3L, "2024-01-18 12:00:00", 1L, "view"),
      (4L, "2024-01-04 12:00:00", 2L, "view"),
      (5L, "2024-01-11 12:00:00", 3L, "view"))
    val got = SparkEntry.queries("q96_weekly_churn")(spark, dir)
      .select("n_active", "n_churned", "churn_pm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L, 500L), (2L, 1L, 500L)))
  }

  test("q97: latency percentiles are actual elements from completers only") {
    // user 1 converts with latency 2h; user 2 converts with latency 4h;
    // user 3 clicks but never purchases — excluded.
    val dir = eventsDir(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      (4L, "2024-01-01 00:00:00", 2L, "view"),
      (5L, "2024-01-01 01:00:00", 2L, "click"),
      (6L, "2024-01-01 04:00:00", 2L, "purchase"),
      (7L, "2024-01-01 00:00:00", 3L, "view"),
      (8L, "2024-01-01 01:00:00", 3L, "click"))
    val h = 3600L * 1000000L
    val got = SparkEntry.queries("q97_conversion_latency")(spark, dir)
      .select("n_converted", "min_us", "p50_us", "p90_us", "max_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L * h, 2L * h, 4L * h, 4L * h)))
  }

  test("q98: melt emits one row per (group, measure) with exact cents") {
    val base = ordersDir() // unused orders fixture dir for the lineitem write
    Seq((1L, "A", 2.0, ts("1995-01-01 00:00:00"), 10.00, 0.05),
        (2L, "A", 3.0, ts("1995-01-02 00:00:00"), 20.00, 0.10))
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate",
        "l_extendedprice", "l_discount")
      .write.parquet(s"$base/lineitem.parquet")
    val got = SparkEntry.queries("q98_unpivot")(spark, base)
      .select("measure", "value").as[(String, Long)].collect().toSeq
    assert(got == Seq(("discount_c", 15L), ("price_c", 3000L), ("qty", 5L)))
  }

  test("q99: the dense spine zero-fills days with no orders") {
    val dir = ordersDir(
      (1L, 1L, "O", 1.00, "1996-02-01 00:00:00"),
      (2L, 1L, "O", 1.00, "1996-02-03 00:00:00"))
    // ordersDir lacks o_orderpriority — rewrite with it
    Seq((1L, 1L, "O", 1.00, ts("1996-02-01 00:00:00"), "1-URGENT"),
        (2L, 1L, "O", 1.00, ts("1996-02-03 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q99_gap_fill")(spark, dir)
      .select("day", "n_orders").as[(String, Long)].collect().toSeq
    assert(got == Seq(("1996-02-01", 1L), ("1996-02-02", 0L),
      ("1996-02-03", 1L)))
  }

  private def lineitemXYDir(rows: (String, Double, Double)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq.zipWithIndex
      .map { case ((f, q, disc), i) =>
        (i.toLong + 1L, f, q, disc, ts("1995-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_discount",
        "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q100: correlation numerators are exact; perfect lines hit ±1e6 ppm") {
    // A: y = 100·x exactly → corr_ppm = +1000000. B: reversed → −1000000.
    // C: constant x → var_x_num = 0 → corr_ppm = 0, not a NaN/div-by-zero.
    val dir = lineitemXYDir(
      ("A", 1.0, 0.01), ("A", 2.0, 0.02), ("A", 3.0, 0.03),
      ("B", 1.0, 0.03), ("B", 2.0, 0.02), ("B", 3.0, 0.01),
      ("C", 5.0, 0.01), ("C", 5.0, 0.02))
    val got = SparkEntry.queries("q100_exact_corr")(spark, dir)
      .select("l_returnflag", "cov_num", "var_x_num", "var_y_num", "corr_ppm")
      .as[(String, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 600.0, 6.0, 60000.0, 1000000L),
      ("B", -600.0, 6.0, 60000.0, -1000000L),
      ("C", 0.0, 0.0, 10000.0, 0L)))
  }

  test("q101: only the spike day crosses the 2-sigma integer test") {
    // 11 quiet days at $1,000 (x = 1 k$) and one at $100,000 (x = 100):
    // dev_spike = 12·100 − 111 = 1089; dev²·11 ≈ 1.30e7 >
    // 4·12·var_num ≈ 5.17e6 — flagged; quiet days (dev = −99,
    // dev²·11 ≈ 1.1e5) are not.
    val quiet = (1 to 11).map(i =>
      (i.toLong, i.toLong, "O", 1000.0, f"1995-01-$i%02d 00:00:00"))
    val dir = ordersDir(quiet :+
      ((12L, 12L, "O", 100000.0, "1995-01-12 00:00:00")): _*)
    val got = SparkEntry.queries("q101_outlier_days")(spark, dir)
      .select("day", "rev_kusd", "dev")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("1995-01-12", 100L, 1089L)))
  }

  test("q100: cross-products beyond int64 stay exact (the q120 class)") {
    // 100 rows of y = 100·x with every discount pinned to 0.1 (y = 1000):
    // syy = 1e8, small — so scale x instead: x = quantity is capped at
    // 50 by the data model, so drive n up via repetition: 4000 rows of a
    // perfect line through repeated (x, y) points. n·syy = 4000·Σ(y²):
    // with y = 1000 per row, Σy² = 4e9, n·Σy² = 1.6e13 — still inside
    // int64, so ALSO verify the decimal path agrees exactly where int64
    // was correct (regression for the refactor), and rely on the sf1+
    // sweeps for the beyond-int64 leg (real data crosses at ~3e6
    // rows/group, which a unit fixture can't reach with y <= 1000).
    val rows = (1 to 4000).map { i =>
      val x = (i % 3 + 1).toDouble          // 1, 2, 3 cycling
      ("A", x, x * 0.01)                    // y = 100·x basis points
    }
    val dir = lineitemXYDir(rows: _*)
    val got = SparkEntry.queries("q100_exact_corr")(spark, dir)
      .select("l_returnflag", "corr_ppm").as[(String, Long)].collect().toSeq
    assert(got == Seq(("A", 1000000L)))     // perfect line survives exactly
  }

  test("q105: snake packing balances a strictly decreasing size run perfectly") {
    // One source, 16 docs sized 16..1, k = 8 shards: block 0 deals
    // 16..9 to shards 0..7, block 1 snakes 8..1 back to shards 7..0 —
    // every shard gets size (17 − s) + s pairing = 17 chars exactly.
    val dir = docsDir((1L to 16L).map(i => (i, "s0", 17L - i)): _*)
    val got = SparkEntry.queries("q105_shard_plan")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == (0L to 7L).map(sh => (sh, 2L, 17L, 125L)))
  }

  test("q105: sources rank independently (no global sort)") {
    // s0 has 2 docs (sizes 9, 5 → shards 0, 1); s1 has 3 docs
    // (sizes 8, 7, 2 → shards 0, 1, 2). Shard masses: 17, 12, 2.
    val dir = docsDir(
      (1L, "s0", 9L), (2L, "s0", 5L),
      (3L, "s1", 8L), (4L, "s1", 7L), (5L, "s1", 2L))
    val got = SparkEntry.queries("q105_shard_plan")(spark, dir)
      .select("shard", "n_docs", "chars")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 17L), (1L, 2L, 12L), (2L, 1L, 2L)))
  }

  test("q106: only deviations beyond 3x the MAD flag; medians are elements") {
    // Days at $10, $11, $12, $13, $100 (cents 1000..1300, 10000).
    // Sorted daily cents: [1000,1100,1200,1300,10000] → med = 1200
    // (disc: element at ceil(0.5·5) = 3rd). adev = [200,100,0,100,8800]
    // → sorted [0,100,100,200,8800] → MAD = 100. Threshold 300:
    // only the $100 day (adev 8800) flags.
    val dir = ordersDir(
      (1L, 1L, "O", 10.0, "1995-01-01 00:00:00"),
      (2L, 2L, "O", 11.0, "1995-01-02 00:00:00"),
      (3L, 3L, "O", 12.0, "1995-01-03 00:00:00"),
      (4L, 4L, "O", 13.0, "1995-01-04 00:00:00"),
      (5L, 5L, "O", 100.0, "1995-01-05 00:00:00"))
    val got = SparkEntry.queries("q106_mad_outliers")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("1995-01-05", 10000L, 1200L, 8800L, 100L)))
  }

  test("q107: merged base+delta aggregates equal the direct recompute") {
    // Months straddling the 1999-01-01 cutoff, one month on each side
    // plus one with rows in NEITHER split beyond its own (the merge's
    // full-outer legs): base-only 1998-05, delta-only 1999-03, and a
    // month is never split (orders carry one date each).
    val dir = ordersDir(
      (1L, 1L, "O", 10.0, "1998-05-01 00:00:00"),
      (2L, 2L, "O", 20.0, "1998-05-15 00:00:00"),
      (3L, 3L, "O", 40.0, "1999-03-02 00:00:00"))
    val got = SparkEntry.queries("q107_incremental_agg")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1998-05", 2L, 3000L, 2L, 3000L, 1500L),
      ("1999-03", 1L, 4000L, 1L, 4000L, 4000L)))
  }

  test("q109: every z-block confines BOTH dims to <= 1/8 of their span") {
    // 64 custkeys x 64 days, one order per cell. A z-range block fixes
    // the top 3 bits of each bucketed dim, so raw spans stay <= 8 cells
    // per dim — the both-dims skipping bound a single-column sort can't
    // give (its blocks span the full other dim).
    val d0 = java.time.LocalDate.parse("1995-01-01")
    val rows = for (ck <- 1L to 64L; d <- 0 to 63) yield
      (ck * 1000 + d, ck, "O", 1.0, s"${d0.plusDays(d)} 00:00:00")
    val dir = ordersDir(rows: _*)
    val got = SparkEntry.queries("q109_zorder_layout")(spark, dir)
      .select("n", "ck_span", "dy_span")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.map(_._1).sum == 64L * 64L)
    assert(got.forall { case (_, ckSpan, _) => ckSpan <= 8L })
    assert(got.forall { case (_, _, dySpan) => dySpan <= 8L })
  }

  test("q110: trigram search reaches only words sharing a gram; Jaccard exact") {
    // query "widgt" → grams {wid, idg, dgt}. "widget" shares {wid, idg}
    // → 2/(4+3−2) = 400 pm. "red"/"gear"/"blue" share none → unreachable
    // through the gram index, exactly like a real trigram index.
    val d = java.nio.file.Files.createTempDirectory("graft_search").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "red widget"), (2L, "blue widget"), (3L, "red gear"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q110_trigram_search")(spark, d)
      .as[(Int, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1, "widget", 400L, 2L, 4L, 2L)))
  }

  test("q111: chi-square cell terms from a hand-computed 2x2 table") {
    // A/P=3, A/Q=1, B/P=1, B/Q=3 → N=8, all marginals 4.
    // num = O·N − R·C = ±8; term = 64/(8·4·4) = 0.5 → 500000 micro.
    val d = java.nio.file.Files.createTempDirectory("graft_chisq").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((0L, "A"), (1L, "B")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    val orders = Seq.tabulate(3)(i => (10L + i, 1L, "P")) ++ Seq((13L, 1L, "Q")) ++
      Seq((14L, 2L, "P")) ++ Seq.tabulate(3)(i => (15L + i, 2L, "Q"))
    orders.map { case (k, c, p) => (k, c, p, ts("1995-01-01 00:00:00")) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q111_chisq_audit")(spark, d)
      .select("n_name", "priority", "o", "num", "term_micro")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("A", "P", 3L, 8.0, 500000L), ("A", "Q", 1L, -8.0, 500000L),
      ("B", "P", 1L, -8.0, 500000L), ("B", "Q", 3L, 8.0, 500000L)))
  }

  test("q112: decile shares and the Lorenz cumulative are exact integers") {
    // 10 customers, revenues 1.00..10.00 → each value-decile holds one
    // customer; total 5500 cents.
    val dir = ordersDir((1L to 10L).map(i =>
      (i, i, "O", i.toDouble, "1995-01-01 00:00:00")): _*)
    val got = SparkEntry.queries("q112_revenue_concentration")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val cum = Seq(100L, 300L, 600L, 1000L, 1500L, 2100L, 2800L, 3600L, 4500L, 5500L)
    val expected = (1 to 10).map { d =>
      (d.toLong, 1L, d * 100L, (1000L * d * 100L) / 5500L, (1000L * cum(d - 1)) / 5500L)
    }
    assert(got == expected)
  }

  test("q113: each purchase sees the dimension version valid at ITS time") {
    val dir = eventsDir(
      (1L, "1995-01-01 00:00:01", 1L, "browse"),
      (2L, "1995-01-01 00:00:02", 1L, "purchase"),  // state = browse
      (3L, "1995-01-01 00:00:03", 1L, "view"),
      (4L, "1995-01-01 00:00:04", 1L, "purchase"),  // state = view (not today's!)
      (5L, "1995-01-01 00:00:00", 2L, "purchase"))  // no prior version
    val got = SparkEntry.queries("q113_scd2_lookup")(spark, dir)
      .select("purchase_id", "state", "ver_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (2L, "browse", 1L), (4L, "view", 3L), (5L, "none", -1L)))
  }

  test("q114: histogram counts clusters by size; singletons via complement") {
    val dup = "the exact same duplicated template text appears here verbatim"
    val dir = textDocsDir(
      (1L, dup), (2L, dup), (3L, dup),
      (4L, "a completely different document about ships and harbors"),
      (5L, "unrelated prose concerning mountain weather patterns today"))
    val got = SparkEntry.queries("q114_dup_cluster_histogram")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (3L, 1L, 3L)))
  }

  test("q115: credit splits per-mille, remainder to the earliest click") {
    val dir = eventsDir(
      // user 1: two clicks in the hour → 500/500
      (1L, "1995-01-01 10:00:00", 1L, "click"),
      (2L, "1995-01-01 10:30:00", 1L, "click"),
      (3L, "1995-01-01 10:59:00", 1L, "purchase"),
      // user 2: one click outside the hour, three inside → 334/333/333
      (4L, "1995-01-01 09:00:00", 2L, "click"),
      (5L, "1995-01-01 10:20:00", 2L, "click"),
      (6L, "1995-01-01 10:40:00", 2L, "click"),
      (7L, "1995-01-01 10:50:00", 2L, "click"),
      (8L, "1995-01-01 10:55:00", 2L, "purchase"),
      // user 4: a click EXACTLY one hour before is out (strict >), one
      // at the purchase instant is in (inclusive <=)
      (9L, "1995-01-01 10:00:00", 4L, "click"),
      (11L, "1995-01-01 11:00:00", 4L, "click"),
      (10L, "1995-01-01 11:00:00", 4L, "purchase"))
    val got = SparkEntry.queries("q115_linear_attribution")(spark, dir)
      .select("purchase_id", "click_id", "gap_us", "n", "credit_pm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (3L, 1L, 3540L * 1000000, 2L, 500L),
      (3L, 2L, 1740L * 1000000, 2L, 500L),
      (8L, 5L, 2100L * 1000000, 3L, 334L),
      (8L, 6L, 900L * 1000000, 3L, 333L),
      (8L, 7L, 300L * 1000000, 3L, 333L),
      (10L, 11L, 0L, 1L, 1000L)))
    assert(got.groupBy(_._1).values.forall(_.map(_._5).sum == 1000L))
  }

  test("q116: each observation weighs by its duration; the open tail drops") {
    val d = java.nio.file.Files.createTempDirectory("graft_twap").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "1995-01-01 00:00:00", 1L, "view", 1.0),
        (2L, "1995-01-01 00:00:10", 1L, "view", 3.0),
        (3L, "1995-01-01 00:00:30", 1L, "view", 99.0)) // open tail — dropped
      .map { case (id, t, u, typ, v) => (id, ts(t), u, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q116_twap")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // wsum = 1000·10 + 3000·20 = 70000 over 30 s → 2333 milli-units
    assert(got == Seq((1L, 2L, 30L, 2333L)))
  }

  test("q117: bounces are single-event sessions; median duration is discrete") {
    val dir = eventsDir(
      // user 1, day 1: a 2-event session (30 min) then a bounce 10h later
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:30:00", 1L, "click"),
      (3L, "2024-01-01 10:30:00", 1L, "view"),
      // user 2, day 2: one bounce
      (4L, "2024-01-02 09:00:00", 2L, "view"))
    val got = SparkEntry.queries("q117_session_stats")(spark, dir)
      .select("day", "n_sessions", "bounces", "n_events", "p50_dur_s", "bounce_pm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // day 1 durations {1800, 0} → disc median picks the 1st element (0)
    assert(got == Seq(
      ("2024-01-01", 2L, 1L, 3L, 0L, 500L),
      ("2024-01-02", 1L, 1L, 1L, 0L, 1000L)))
  }

  test("q118: co-purchase pairs are distinct-per-order and canonical") {
    val d = java.nio.file.Files.createTempDirectory("graft_basket").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, 1L), (1L, 2L), (1L, 3L),
        (2L, 2L), (2L, 1L),       // reversed arrival — pair stays (1,2)
        (3L, 5L), (3L, 5L))       // duplicate line: no self-pair
      .map { case (ok, pk) => (ok, pk, ts("1995-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q118_copurchase")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("q120: slope numerator/denominator are exact; a perfect line is exact") {
    // One supplier in nation A, points (x, y cents): (1, 200), (2, 400),
    // (3, 600) — slope exactly 200 cents/unit.
    // num = 3·2800 − 6·1200 = 1200; den = 3·14 − 36 = 6 → 200.0 → 200000 milli.
    val d = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((0L, "A")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$d/supplier.parquet")
    Seq((1L, 1.0, 2.0), (1L, 2.0, 4.0), (1L, 3.0, 6.0))
      .map { case (sk, q, p) => (sk, q, p, ts("1995-01-01 00:00:00")) }
      .toDF("l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q120_group_trend")(spark, d)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 1200.0, 6.0, 200000L)))
  }

  test("q120: cross-products beyond int64 stay exact (the sf1 overflow)") {
    // 100 points on the perfect line y = 1e12·x cents: Σxy = 1e12·Σx² ≈
    // 3.4e17 (sums fit int64), but n·Σxy ≈ 3.4e19 — past int64, the
    // exact overflow the sf1 sweep hit. The decimal cross-product path
    // must deliver the exact slope 1e12 → slope_milli 1e15, and
    // num = 1e12·(100·Σx² − (Σx)²) = 8.3325e18 exactly.
    val d = java.nio.file.Files.createTempDirectory("graft_trendbig").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((0L, "A")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$d/supplier.parquet")
    (1 to 100)
      .map(i => (1L, i.toDouble, i * 1e10, ts("1995-01-01 00:00:00")))
      .toDF("l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q120_group_trend")(spark, d)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    val sx = 5050L                       // Σx, x = 1..100
    val sx2 = (1 to 100).map(i => i.toLong * i).sum // Σx² = 338350
    val den = 100L * sx2 - sx * sx       // 8,332,500 — fits double exactly
    val num = BigDecimal(den) * BigDecimal(1e12.toLong)
    assert(got == Seq(("A", 100L, num.toDouble, den.toDouble, 1000L * 1e12.toLong)))
  }

  test("q120: a zero-variance group reports slope 0, not a NaN cast") {
    val d = java.nio.file.Files.createTempDirectory("graft_trend0").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((0L, "A")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$d/supplier.parquet")
    // both points share x = 2 → slope_den = 0 (also covers n = 1 nations)
    Seq((1L, 2.0, 3.0), (1L, 2.0, 5.0))
      .map { case (sk, q, p) => (sk, q, p, ts("1995-01-01 00:00:00")) }
      .toDF("l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q120_group_trend")(spark, d)
      .select("n_name", "slope_den", "slope_milli")
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("A", 0.0, 0L)))
  }

  test("q121: the weighted median picks by duration mass, not row count") {
    // user 1 intervals: value 1.0 held 100 s, then value 9.0 held 1 s,
    // then 9.0 again 1 s (open tail after). Row-median of {1,9,9} is 9,
    // but 100 of 102 weight-seconds sit on 1.0 → weighted median 1000.
    val d = java.nio.file.Files.createTempDirectory("graft_wmed").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "1995-01-01 00:00:00", 1.0),
        (2L, "1995-01-01 00:01:40", 9.0),
        (3L, "1995-01-01 00:01:41", 9.0),
        (4L, "1995-01-01 00:01:42", 5.0)) // open tail — dropped
      .map { case (id, t, v) => (id, ts(t), 1L, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q121_weighted_median")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("view", 1000L, 102L)))
  }

  test("q122: systematic sampling picks exactly total DIV step per source") {
    // The cumulative intervals partition (0, total], so the pick count
    // is exactly the number of step-multiples in it — order-independent
    // even though WHICH docs are picked follows the hash order.
    val d = java.nio.file.Files.createTempDirectory("graft_sys").toString
    val spark2 = spark
    import spark2.implicits._
    // s0: 9 docs x 1000 tokens = 9000 -> 9000 DIV 4000 = 2 picks;
    // s1: 3 docs x 700 tokens = 2100 -> 0 picks.
    val rows =
      (1L to 9L).map(i => (i, (1 to 1000).map(_ => "w").mkString(" "), "s0")) ++
      (10L to 12L).map(i => (i, (1 to 700).map(_ => "w").mkString(" "), "s1"))
    rows.map { case (id, t, src) => (id, t, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q122_systematic_sample")(spark, d)
      .select("source", "n_picked")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("s0", 2L)))
    // determinism: a second run picks the identical docs
    val sig1 = SparkEntry.queries("q122_systematic_sample")(spark, d)
      .select("pick_sig").as[Long].collect().toSeq
    val sig2 = SparkEntry.queries("q122_systematic_sample")(spark, d)
      .select("pick_sig").as[Long].collect().toSeq
    assert(sig1 == sig2)
  }

  test("q123: each activity day supports the 7 report days it trails") {
    // user 1 active epoch-day D, user 2 active D+3; report days run to
    // the last observed activity day. WAU(D..D+2) = {1}, WAU(D+3) = {1,2}.
    val dir = eventsDir(
      (1L, "1970-01-01 12:00:00", 1L, "view"),
      (2L, "1970-01-04 12:00:00", 2L, "view"))
    val got = SparkEntry.queries("q123_wau")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("q124: scores halve per whole week of age; sums stay integer") {
    val d = java.nio.file.Files.createTempDirectory("graft_decay").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "2024-01-15 00:00:00", 1L, 8.0),  // age 0 w  → 8000
        (2L, "2024-01-08 00:00:00", 1L, 8.0),  // age 1 w  → 4000
        (3L, "2024-01-01 00:00:00", 2L, 8.0))  // age 2 w  → 2000
      .map { case (id, t, u, v) => (id, ts(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q124_decayed_engagement")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 12000L), (2L, 1L, 2000L)))
  }

  test("q124: negative values decay by the sign-split rule (magnitude DIV)") {
    val d = java.nio.file.Files.createTempDirectory("graft_decay_neg").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "2024-01-15 00:00:00", 1L, 1.0),      // pins last_us; +1000
        (2L, "2024-01-08 00:00:00", 1L, -0.5005))  // mval −501, age 1 w → −250
      .map { case (id, t, u, v) => (id, ts(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q124_decayed_engagement")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 750L)))
  }

  /** The engine's own 60-bit md5-prefix hash (TextOps.hash60) recomputed
    * so fixtures can plant docs into known hash halves. */
  private def half(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("q125: drift is the L1 share delta; one-sided tokens read as 0") {
    // Half-0 docs say "x y", half-1 docs say "x z": x is stable
    // (500 pm in both halves), y and z are one-sided (500 vs 0).
    val ids = (1L to 12L)
    assert(ids.exists(half(_) == 0) && ids.exists(half(_) == 1))
    val dir = textDocsDir(ids.map(i =>
      (i, if (half(i) == 0) "x y" else "x z")): _*)
    val got = SparkEntry.queries("q125_vocab_drift")(spark, dir)
      .select("tok", "share_a_pm", "share_b_pm", "delta_pm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("y", 500L, 0L, 500L), ("z", 0L, 500L, 500L), ("x", 500L, 500L, 0L)))
  }

  test("q126: latency percentiles are actual day counts per order month") {
    val d = java.nio.file.Files.createTempDirectory("graft_lat").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, 1L, "O", 10.0, ts("1995-01-10 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, ts("1995-01-12 00:00:00")), (1L, ts("1995-01-15 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q126_ship_latency")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // latencies {2, 5} days → disc p50 = 2 (1st element), p90 = 5, max 5
    assert(got == Seq(("1995-01", 2L, 2L, 5L, 5L)))
  }

  private def textDocsDir(rows: (Long, String)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_change").toString
    rows.toSeq
      .map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q102: fluency averages corpus bigram counts; 1-token docs drop") {
    // Corpus bigram counts: "a b" → 2, "b c" → 1, "b d" → 1, "x y" → 1.
    // Docs 1/2 score (1000·(2+1)) DIV 2 = 1500; doc 3 scores 1000;
    // doc 4 has no bigram and must vanish, not divide by zero.
    val dir = textDocsDir(
      (1L, "a b c"), (2L, "a b d"), (3L, "x y"), (4L, "z"))
    val got = SparkEntry.queries("q102_bigram_fluency")(spark, dir)
      .select("doc_id", "n_bigrams", "total_freq", "fluency_pm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 1500L), (2L, 2L, 3L, 1500L), (3L, 1L, 1L, 1000L)))
  }

  test("q103: paths take the first 3 events per 2h-gap session") {
    // u1 session 1 has FOUR events — the path stops at 3; 3h later a
    // fresh session opens with a lone view. u2 contributes another lone
    // view, so path 'view' counts 2 sessions across 2 users.
    val dir = eventsDir(
      (1L, "1995-01-01 10:00:00", 1L, "view"),
      (2L, "1995-01-01 10:01:00", 1L, "click"),
      (3L, "1995-01-01 10:02:00", 1L, "purchase"),
      (4L, "1995-01-01 10:03:00", 1L, "click"),
      (5L, "1995-01-01 14:00:00", 1L, "view"),
      (6L, "1995-01-01 09:00:00", 2L, "view"))
    val got = SparkEntry.queries("q103_session_paths")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("view", 2L, 2L), ("view>click>purchase", 1L, 1L)))
  }

  test("q89: the heaviest source keeps everything; lighter sources thin") {
    // mass(s0)=400, mass(s1)=100 → keep_rate(s0)=10000 (every bucket
    // passes), keep_rate(s1)=floor(10000·√(1/4))=5000.
    val dir = docsDir(
      (1L, "s0", 100L), (2L, "s0", 100L), (3L, "s0", 100L), (4L, "s0", 100L),
      (5L, "s1", 25L), (6L, "s1", 25L), (7L, "s1", 25L), (8L, "s1", 25L))
    val got = SparkEntry.queries("q89_temperature_mixture")(spark, dir)
      .select("source", "n_docs", "keep_rate", "kept_n")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("s0") == (("s0", 4L, 10000L, 4L)))
    assert(got("s1")._3 == 5000L)
    assert(got("s1")._4 <= 4L)
  }
}
