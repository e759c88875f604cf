package graft

import java.sql.Timestamp

/** q198 negative sampling: the whole pipeline replayed independently in
  * plain Scala on a tiny fixture — buckets, probes, anti-join, ranking
  * — so a drift in any stage (including sampling an OWNED part, the
  * property the digest alone can't show) fails loudly. */
class NegSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s0: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s0.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
  private def mix(c: Long, p: Long): Long = {
    val v1 = ((c * 104729 + p * 7919) % 1000000007L) * 2654435761L % 1000000007L
    v1 * (v1 + 1) / 2 % 1000000007L
  }

  test("q198: digest equals a full independent replay; owned parts never sampled") {
    val d = java.nio.file.Files.createTempDirectory("graft_neg").toString
    val nParts = 40L
    val owned = Map(1L -> (1L to 30L).toSet, 2L -> Set(5L))
    val t0 = Timestamp.valueOf("1995-06-01 00:00:00")
    val rows = owned.toSeq.flatMap { case (c, ps) =>
      ps.toSeq.map(p => (c * 1000 + p, c, p))
    }
    rows.map { case (ok, c, _) => (ok, c, t0) }.distinct
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    rows.map { case (ok, _, p) => (ok, p, t0) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    (1L to nParts).map(p => Tuple1(p)).toDF("p_partkey")
      .write.parquet(s"$d/part.parquet")

    // independent replay
    val b = math.max(16L, nParts / 2)
    def bucket(p: Long) = hash60(s"pb:$p") % b
    def probes(c: Long) = (0 until 4).map(j => hash60(s"nb:$c:$j") % b).toSet
    val expected = owned.keys.toSeq.sorted.map { c =>
      val cand = (1L to nParts)
        .filter(p => probes(c).contains(bucket(p)))
        .filterNot(owned(c).contains)
        .map(p => (mix(c, p), p)).sorted.take(3)
      (c, cand.size.toLong, cand.map(_._1 % 1000000000L).sum)
    }
    // owned-exclusion is structural in the replay; the engine must agree
    val expHist = expected.groupBy(_._2).map { case (k, xs) =>
      (k, xs.size.toLong, xs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q198_negative_sampling")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expHist)
  }
}
