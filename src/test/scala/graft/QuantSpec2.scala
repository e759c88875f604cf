package graft

import org.apache.spark.sql.functions.lit

/** Hand-computed fixtures for the round-8 inference quartet:
  * q167 weighted shortest paths (a cheaper 2-hop route must beat an
  * expensive direct edge), q168 calibration bins (exact integer bin and
  * score arithmetic, cap bin at 9), q169 Cohen's kappa (all four
  * agreement cells planted; chance-level raters must score κ = 0),
  * q170 Poisson bootstrap (degenerate-population CI collapses to the
  * point estimate; replicate means are bounded by the population).
  */
class QuantSpec2 extends SparkSpec {
  import spark.implicits._

  test("q167: min-plus relaxation picks the cheap 2-hop route over the direct edge") {
    val d = java.nio.file.Files.createTempDirectory("graft_wsp").toString
    // two-item baskets encode edges with support = multiplicity:
    //   (1,2) ×4 → w = 1 + 1e6/4 = 250001
    //   (2,3) ×4 → w = 250001
    //   (1,3) ×1 → w = 1000001  (direct, but expensive)
    // seed = part 1 (Brand#1). d(2) = 250001; d(3) = min(1000001,
    // 2×250001 = 500002) = 500002 — the relaxation MUST take the 2-hop
    // path. Buckets (DIV 1e5): 0→{1}, 2→{2}, 5→{3}.
    val baskets =
      Seq.fill(4)(Seq(1L, 2L)) ++ Seq.fill(4)(Seq(2L, 3L)) ++ Seq(Seq(1L, 3L))
    baskets.zipWithIndex
      .flatMap { case (ps, i) => ps.map(p => (100L + i, p)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", lit("1995-01-01"))
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, "Brand#1"), (2L, "Brand#2"), (3L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q167_weighted_paths")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 0L, 0L), (2L, 1L, 2L, 250001L, 250001L),
      (5L, 1L, 3L, 500002L, 500002L)))
  }

  test("q168: integer bin/score arithmetic, top bin capped at 9") {
    val d = java.nio.file.Files.createTempDirectory("graft_cal").toString
    // "a b": score 2.0 → bin 10 capped to 9, score_ppm 2000000, pos(en)
    // "a a a b": score 1.0 → bin 5, ppm 1000000, neg
    // "a a a a a b": 2·2/6 → bin (20 DIV 6)=3, ppm 666666, pos
    Seq((1L, "a b", "en"), (2L, "a a a b", "fr"), (3L, "a a a a a b", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q168_calibration_bins")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 1L, 1L, 666666L, 1000000L),
      (5L, 1L, 0L, 1000000L, 0L), (9L, 1L, 1L, 2000000L, 1000000L)))
  }

  test("q169: all four agreement cells planted; chance-level raters score zero") {
    val d = java.nio.file.Files.createTempDirectory("graft_kappa").toString
    // A = (≥2 en stopwords), B = (en strictly dominates es/fr/de):
    //   "the a of x"    → A=1 B=1
    //   "the x y"       → A=0 B=1
    //   "the a de los"  → A=1 B=0 (en=2 ties es=2 — not strict)
    //   "x y z"         → A=0 B=0
    // n=4 a₁=2 b₁=2 agree=2 → S=8, po=pe=500000, κ = (8−8)/(16−8) = 0.
    Seq((1L, "the a of x"), (2L, "the x y"), (3L, "the a de los"),
      (4L, "x y z"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q169_rater_kappa")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((4L, 2L, 2L, 2L, 500000L, 500000L, 0L)))
  }

  test("q170: degenerate population collapses the CI to the point estimate") {
    val d = java.nio.file.Files.createTempDirectory("graft_boot").toString
    // every order is 10.00 → every replicate mean is exactly 1000 cents
    // regardless of which Poisson weights the hash draws
    (1L to 50L).map(k => (k, "10.00"))
      .toDF("o_orderkey", "p")
      .selectExpr("o_orderkey", "CAST(p AS DOUBLE) AS o_totalprice")
      .withColumn("o_orderdate", lit("1995-01-01"))
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q170_bootstrap_ci")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((50L, 1000L, 1000L, 1000L, 1000L)))
  }

  test("q170: replicate quantiles are ordered and bounded by the population") {
    val d = java.nio.file.Files.createTempDirectory("graft_boot2").toString
    (1L to 200L).map(k => (k, if (k % 2 == 0) "10.00" else "30.00"))
      .toDF("o_orderkey", "p")
      .selectExpr("o_orderkey", "CAST(p AS DOUBLE) AS o_totalprice")
      .withColumn("o_orderdate", lit("1995-01-01"))
      .write.parquet(s"$d/orders.parquet")
    val (n, point, p05, p50, p95) =
      SparkEntry.queries("q170_bootstrap_ci")(spark, d)
        .as[(Long, Long, Long, Long, Long)].collect().head
    assert(n == 200L && point == 2000L)
    assert(p05 <= p50 && p50 <= p95)
    assert(p05 >= 1000L && p95 <= 3000L)
    // the bootstrap CI should bracket the point estimate here
    assert(p05 <= point && point <= p95)
  }

  test("q170: the middle-square pair mix draws uniform basis points " +
      "and Poisson-correct weight frequencies") {
    // independent Scala replay of the draw (the md5 replacement must
    // still be a fair uniform source — a biased u skews every
    // replicate's Poisson weights): u over keys × replicates should
    // fill each decile of [0, 10000) with ~10%, and the CDF thresholds
    // should recover Poisson(1) pmf — P(w=0) ≈ 36.8%, P(w=1) ≈ 36.8%.
    // The replay is sqMix COMPOSED TWICE, matching bootMix — the single
    // round's within-key draws walk a quadratic in b (sqMix's documented
    // arithmetic-progression weakness).
    val P = 1000000007L
    def sq(x: Long): Long = {
      val v1 = (x % P) * 2654435761L % P
      (v1 * (v1 + 1) / 2) % P
    }
    def u(key: Long, rep: Long): Long =
      sq(sq(key * 104729 + rep * 7919)) % 10000
    val n = 50000
    val draws = (1 to n).map(k => u(k.toLong, k.toLong % 100))
    val dec = draws.groupBy(_ / 1000).view.mapValues(_.size).toMap
    (0L to 9L).foreach { d =>
      val share = dec.getOrElse(d, 0).toDouble / n
      assert(share > 0.092 && share < 0.108,
        s"decile $d share $share outside uniformity band")
    }
    val w0 = draws.count(_ < 3679).toDouble / n
    val w1 = draws.count(x => x >= 3679 && x < 7358).toDouble / n
    assert(w0 > 0.355 && w0 < 0.38, s"P(w=0) = $w0, want ~0.368")
    assert(w1 > 0.355 && w1 < 0.38, s"P(w=1) = $w1, want ~0.368")
  }

  test("q170: within-key draws are decorrelated across replicates") {
    // the failure mode the double composition exists to kill: for a
    // FIXED order key the 100 replicate draws walk an arithmetic
    // progression in b, and one sqMix round leaves them on a single
    // quadratic — consecutive replicate draws carry structure that
    // correlates the Poisson weights within a key and narrows the
    // bootstrap CI. Checks on the composed draw: (a) lag-1 serial
    // correlation of u(k, b) across b, pooled over keys, is ~0;
    // (b) consecutive-draw pairs fill a 10×10 decile grid uniformly
    // (each cell ~1% ± 0.35pp over 49,500 pairs).
    val P = 1000000007L
    def sq(x: Long): Long = {
      val v1 = (x % P) * 2654435761L % P
      (v1 * (v1 + 1) / 2) % P
    }
    def u(key: Long, rep: Long): Long =
      sq(sq(key * 104729 + rep * 7919)) % 10000
    val keys = (1 to 500).map(_.toLong)
    val pairs = keys.flatMap { k =>
      val d = (0L until 100L).map(b => u(k, b))
      d.dropRight(1).zip(d.drop(1))
    }
    val xs = pairs.map(_._1.toDouble); val ys = pairs.map(_._2.toDouble)
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    val r = cov / (sx * sy)
    assert(math.abs(r) < 0.02, s"lag-1 within-key correlation $r, want ~0")
    val grid = pairs.groupBy { case (a, b) => (a / 1000, b / 1000) }
      .view.mapValues(_.size).toMap
    for (i <- 0L to 9L; j <- 0L to 9L) {
      val share = grid.getOrElse((i, j), 0).toDouble / pairs.size
      assert(share > 0.0065 && share < 0.0135,
        s"joint decile cell ($i,$j) share $share outside band")
    }
  }
}
