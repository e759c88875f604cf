package graft

import java.sql.Timestamp
import java.time.LocalDate

/** q194 time-respecting reachability: a planted adoption network where
  * one node is STATICALLY reachable but temporally NOT — the edge fires
  * before the walker arrives. */
class TemporalReachSpec extends SparkSpec {
  import spark.implicits._

  test("q194: arrivals follow the adoption chains; a pre-arrival edge is unusable") {
    val d = java.nio.file.Files.createTempDirectory("graft_treach").toString
    val base = LocalDate.parse("1995-01-01")
    def ts(day: Long): Timestamp =
      Timestamp.valueOf(base.plusDays(day).atStartOfDay())
    // (orderkey, cust, day, part):
    //  part 100 chain: A(0) → C(400) → B(500)  — A is the only seed
    //  part 200 chain: E(50) → D(600)          — E seeds (50 < 365)
    //  part 300: F alone (700)                  — unreachable
    //  part 400 chain: C(380) → H(390): C's earliest ARRIVAL is 400
    //    (via A), after the edge fired at 390 → H stays unreachable
    //    even though a static BFS would reach it
    val sales = Seq(
      (10L, 1L, 0L, 100L), (11L, 3L, 400L, 100L), (12L, 2L, 500L, 100L),
      (13L, 5L, 50L, 200L), (14L, 4L, 600L, 200L),
      (15L, 6L, 700L, 300L),
      (16L, 3L, 380L, 400L), (17L, 7L, 390L, 400L))
    sales.map { case (ok, c, day, _) => (ok, c, ts(day)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    sales.map { case (ok, _, day, pk) => (ok, pk, ts(day)) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q194_temporal_reach")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    // arrivals: A@0, E@50, C@400, B@500, D@600 (days relative to the
    // 1995 base = 1095 + Δ from the query's fixed 1992 epoch); F and H
    // never arrive
    val m = (d0: Long) => (1095L + d0) / 30
    assert(got == Seq(
      (m(0), 1L, 1L), (m(50), 1L, 5L), (m(400), 1L, 3L),
      (m(500), 1L, 2L), (m(600), 1L, 4L)))
  }
}
