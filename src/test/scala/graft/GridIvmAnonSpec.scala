package graft

import java.sql.Timestamp

import graft.ops.Multimodal

/** Round-8 additions: grid-cell neighbor density (q175), incremental
  * join-view maintenance (q176), k-anonymity audit (q177), and audio
  * activity segmentation (q178) on planted fixtures small enough to
  * verify by hand. (Cross-engine value equality is the oracle gate's
  * job; these pin the SEMANTICS.) */
class GridIvmAnonSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s0: String): Timestamp = Timestamp.valueOf(s0)

  test("q175: neighbors across a cell boundary are found; isolated points keep count 0") {
    // exact binary fractions so the micro-coordinate floor is hand-
    // computable: 7/1024 → 6835µ (cell 0), 14/1024 → 13671µ (cell 1) —
    // DIFFERENT cells, |Δ| = 6836 ≤ eps 7000, so only the 3×3 probe
    // join can pair them; 0.25 → 250000µ is isolated
    val d = java.nio.file.Files.createTempDirectory("graft_grid").toString
    Seq(
      (1L, Seq(0.0068359375f, 0f)),
      (2L, Seq(0.013671875f, 0f)),
      (3L, Seq(0.25f, 0.25f)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q175_grid_density")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 0L), (1L, 2L, 0L)))
  }

  test("q176: delta-join algebra partitions the new rows exactly (no loss, no double count)") {
    val d = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    // O1 old with one old + one new lineitem (the O⋈ΔL leg), O2 new
    // with a new lineitem (the ΔO⋈ΔL leg must count it ONCE), O3 old
    // entirely old (stays in the stored view term)
    Seq(
      (1L, "1-URGENT", ts("1998-01-01 00:00:00")),
      (2L, "1-URGENT", ts("1998-07-02 00:00:00")),
      (3L, "2-HIGH", ts("1997-05-01 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      (1L, 10.0, ts("1998-02-01 00:00:00")),
      (1L, 20.0, ts("1998-07-01 00:00:00")),
      (2L, 40.0, ts("1998-08-01 00:00:00")),
      (3L, 80.0, ts("1997-06-01 00:00:00")))
      .toDF("l_orderkey", "l_extendedprice", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("q176_ivm_join_view")(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1-URGENT", 1L, 1000L, 2L, 6000L, 3L, 7000L),
      ("2-HIGH", 1L, 8000L, 0L, 0L, 1L, 8000L)))
  }

  test("q177: class sizes histogram with the negative-balance band edge") {
    val d = java.nio.file.Files.createTempDirectory("graft_anon").toString
    // six customers share a quasi-id class (not risky at K=5); one
    // customer with a NEGATIVE balance lands in band -1 (the positive-
    // mod floor-division edge) and is a singleton risky class
    val rows = (1L to 6L).map(i => (i, 1L, "AUTOMOBILE", 500.0)) :+
      (7L, 2L, "BUILDING", -500.0)
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$d/customer.parquet")
    val got = SparkEntry.queries("q177_kanonymity")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1L), (6L, 1L, 6L, 0L)))
  }

  test("q178: decoded window energies and islands match an independent replay") {
    // independent re-derivation: recompute each window's activity and
    // energy straight from the waveform formula, then fold run-lengths
    // in plain Scala — pins decode, threshold, AND the islands window
    val d = java.nio.file.Files.createTempDirectory("graft_seg").toString
    val ids = Seq(5L, 6L, 7L)
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    def expectedDigest(id: Long): (Long, Long, Long) = {
      val energies = (0 until 32).map { w =>
        (w * 32 until w * 32 + 32).map { i =>
          val av0 = (id * 13 + w.toLong * 7) % 65536
          val av1 = (av0 * 2654435761L) % 65536
          val active = (av1 * (av1 + 1)) / 4096 % 256 < 154
          val v0 = (id * 104729 + i.toLong * 17) % 65536
          val v1 = (v0 * 2654435761L) % 65536
          val nv = (v1 * (v1 + 1)) / 4096 % 2048 - 1024
          math.abs(if (active) nv else nv % 16)
        }.sum
      }
      val act = energies.map(_ > 4096L)
      var segs = List.empty[Long]
      var prev = false
      act.foreach { a =>
        if (a && prev) segs = (segs.head + 1) :: segs.tail
        else if (a) segs = 1L :: segs
        prev = a
      }
      (segs.length.toLong, if (segs.isEmpty) 0L else segs.max,
        segs.sum)
    }
    // build the expected histogram from the per-doc digests
    val perDoc = ids.map(expectedDigest)
    val expected = perDoc.groupBy(_._1).map { case (n, ds) =>
      (n, ds.size.toLong, ds.map(_._3).sum, ds.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q178_audio_segments")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
