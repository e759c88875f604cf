package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the windowed/grouping operator helpers (SURVEY.md §2.5,
  * §2.4, §2.6): sessionization boundaries, streak islands, frame edges,
  * top-k, deterministic team keys. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def sessions(tsSeconds: Seq[Long], gap: Long) = {
    val df = tsSeconds.zipWithIndex
      .map { case (t, i) => (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), i.toLong) }
      .toDF("uid", "ts", "eid")
    Sessionize.assign(df, col("uid"), col("ts"), col("eid"), gap)
      .select($"eid", $"session_seq").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
  }

  test("gap exactly at threshold starts a new session; below does not") {
    // gaps: 7199 (same session), 7200 (new), 7201 (new)
    assert(sessions(Seq(0L, 7199L, 14399L, 21600L), 7200L).toSeq == Seq(1L, 1L, 2L, 3L))
  }

  test("first event of each entity opens session 1") {
    assert(sessions(Seq(100L), 7200L).toSeq == Seq(1L))
  }

  test("every event lands in exactly one session; count = gaps + 1") {
    val ts = Seq(0L, 10L, 8000L, 8010L, 8020L, 20000L)
    val got = sessions(ts, 7200L)
    assert(got.length == ts.length)
    assert(got.max == 3L) // 2 qualifying gaps => 3 sessions
    assert(got.toSeq.sorted == got.toSeq) // non-decreasing in time order
  }

  test("per-session rollup aggregates the assigned events") {
    val df = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)), 1L, 100L),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10L)), 2L, 50L),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(9000L)), 3L, 25L)
    ).toDF("uid", "ts", "eid", "cents")
    val got = Sessionize.sessions(df, col("uid"), col("ts"), col("eid"), 7200L, col("cents"))
      .orderBy("session_seq").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_events") == 2L)
    assert(got(0).getAs[Double]("sum_value") == 1.5)
    assert(got(1).getAs[Long]("n_events") == 1L)
  }
}

class StreaksSpec extends SparkSpec {
  import spark.implicits._

  test("islands split on state change and count run lengths") {
    // user 1: W W L W  -> runs [W,2],[L,1],[W,1]
    val df = Seq(
      (1L, "W", 1L), (1L, "W", 2L), (1L, "L", 3L), (1L, "W", 4L)
    ).map { case (u, st, t) =>
      (u, st, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), t)
    }.toDF("uid", "state", "ts", "eid")
    val got = Streaks.streaks(df, col("uid"), col("state"), col("ts"), col("eid"))
      .select($"state", $"streak_len").as[(String, Long)].collect()
    assert(got.toSeq.sorted == Seq(("L", 1L), ("W", 1L), ("W", 2L)))
  }
}

class FramesSpec extends SparkSpec {
  import spark.implicits._

  test("sliding mean uses the actual frame row count at series head") {
    val df = Seq((1L, "d1", 100L), (1L, "d2", 300L), (1L, "d3", 500L))
      .toDF("uid", "day", "cents")
    val got = Frames.smoothedAndCumulative(df, col("uid"), col("day"),
        Seq("v" -> col("cents")), Seq(3), 100.0)
      .orderBy("day").select("v_sma3", "v_cum").as[(Double, Double)].collect()
    // sma3: 1.0, (100+300)/2/100=2.0, (100+300+500)/3/100=3.0
    assert(got.toSeq == Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0)))
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("global top-k equals prefix of the full sort") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 100).toLong)).toDF("id", "v")
    val top = TopK.global(df, 5, desc("v"), col("id")).select("id").as[Long].collect().toSeq
    val full = df.orderBy(desc("v"), col("id")).select("id").as[Long].collect().take(5).toSeq
    assert(top == full)
  }

  test("per-group top-k keeps k rows per group with rank") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L)).toDF("g", "v")
    val got = TopK.perGroup(df, 2, Seq(col("g")), Seq(desc("v")))
      .select("g", "v", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 30L, 1), (1L, 20L, 2), (2L, 5L, 1)))
  }
}

class TeamKeySpec extends SparkSpec {
  import spark.implicits._

  test("team key is order-independent and distinct") {
    val a = Seq((1L, 30L), (1L, 10L), (1L, 10L), (1L, 20L)).toDF("g", "m")
    val b = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L)).toDF("g", "m")
    val ka = TeamKey.teamKey(a, col("g"), col("m")).select("team_key").as[String].head()
    val kb = TeamKey.teamKey(b, col("g"), col("m")).select("team_key").as[String].head()
    assert(ka == "10,20,30" && kb == ka)
  }

  test("n_members counts distinct members, not rows") {
    // 4 rows, member 10 duplicated -> 3 distinct members
    val a = Seq((1L, 30L), (1L, 10L), (1L, 10L), (1L, 20L)).toDF("g", "m")
    val n = TeamKey.teamKey(a, col("g"), col("m")).select("n_members").as[Long].head()
    assert(n == 3L)
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping ranges multiply rows (reference 'lifetime' semantics)") {
    val fact = Seq((1L, 5L), (2L, 15L)).toDF("id", "t")
    val ranges = Seq(("a", 0L, 10L), ("b", 10L, 20L), ("all", 0L, 100L))
      .toDF("name", "lo", "hi")
    val got = RangeJoin.broadcastRange(fact, ranges, col("t"), col("lo"), col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (1L, "all"), (2L, "b"), (2L, "all")))
  }
}
