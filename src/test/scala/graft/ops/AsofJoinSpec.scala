package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join operator: inclusive at-or-before pick, tie rule, left-join
  * nulls, and atomic payload carry. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("picks the latest right row at-or-before each left row") {
    val left = Seq((1L, ts(10), "p1"), (1L, ts(5), "p2"), (2L, ts(7), "p3"))
      .toDF("k", "ts", "pid")
    val right = Seq((1L, ts(4), "c1"), (1L, ts(10), "c2"), (1L, ts(9), "c3"),
                    (2L, ts(99), "c4"))
      .toDF("k", "ts", "cid")
    val got = AsofJoin.latestAtOrBefore(left, right, "k", "ts", Seq("cid"), "cid")
      .select("pid", "asof_cid").as[(String, String)].collect().toMap
    assert(got("p1") == "c2") // inclusive: right row AT ts 10 wins over ts 9
    assert(got("p2") == "c1")
    assert(got("p3") == null) // no right row at-or-before -> left-join null
  }

  test("ties on (key, ts) resolve to the max tie-break, payload carried atomically") {
    val left = Seq((1L, ts(10), "p1")).toDF("k", "ts", "pid")
    // two right rows at the same ts: id order decides; c9's payload value is
    // NULL — the null must be carried AS c9's value, not backfilled from c2
    val right = Seq((1L, ts(3), "c2", "v2"), (1L, ts(3), "c9", null))
      .toDF("k", "ts", "cid", "v")
    val got = AsofJoin.latestAtOrBefore(left, right, "k", "ts", Seq("cid", "v"), "cid")
      .select("asof_cid", "asof_v").as[(String, String)].head()
    assert(got == (("c9", null)))
  }

  test("null-key/null-ts right rows never match; bad payload names fail fast") {
    val left = Seq((1L, ts(10), "p1")).toDF("k", "ts", "pid")
    val right = Seq(
      (Some(1L), None, "cNullTs"),            // null ts: droppable
      (None, Some(ts(3)), "cNullKey"))        // null key: droppable
      .map { case (k, t, c) => (k.map(Long.box).orNull, t.orNull, c) }
      .toDF("k", "ts", "cid")
    val got = AsofJoin.latestAtOrBefore(left, right, "k", "ts", Seq("cid"), "cid")
      .select("asof_cid").as[String].head()
    assert(got == null) // neither null row is "at or before" anything
    intercept[IllegalArgumentException] {
      AsofJoin.latestAtOrBefore(left, right, "k", "ts", Seq("nope"), "cid")
    }
  }

  test("reserved internal column names on either side fail fast") {
    val left = Seq((1L, ts(10), "p1")).toDF("k", "ts", "pid")
    val right = Seq((1L, ts(3), "c1")).toDF("k", "ts", "cid")
    intercept[IllegalArgumentException] { // left column collides with internals
      AsofJoin.latestAtOrBefore(left.withColumnRenamed("pid", "_carried"),
        right, "k", "ts", Seq("cid"), "cid")
    }
    intercept[IllegalArgumentException] { // payload column collides too
      AsofJoin.latestAtOrBefore(left,
        right.withColumnRenamed("cid", "_kind"), "k", "ts", Seq("_kind"), "_kind")
    }
  }
}
