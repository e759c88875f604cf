package graft

import org.apache.spark.sql.functions._

import graft.ops.NearDup

/** Query-level specs for the retrieval/confirm additions: q127
  * (edit-distance confirm over LSH candidates) and q128 (BM25-style
  * ranked retrieval). Fixtures are planted documents.parquet dirs; the
  * cross-engine exactness itself is covered by the DuckDB oracle gate at
  * three scale factors — here we pin the SEMANTICS: which pairs survive
  * the confirm, and that the published scores equal the formula evaluated
  * in the same IEEE shape.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: (Long, String)*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_retrieval").toString
    rows.toSeq
      .map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  // one appended 100-char word: shingle overlap stays 18/19 (high Jaccard,
  // certain LSH candidate) but edit distance = 101 (far past EditMax = 80)
  private val farWord = "z" * 100

  test("q127: LSH candidate with small edit distance survives with the exact distance") {
    val dir = docsDir(
      (1L, base),
      (2L, base + " phi"), // 4 edits away
      (3L, "one two three four five six seven eight nine ten eleven " +
           "twelve thirteen fourteen fifteen sixteen"))
    val got = SparkEntry.queries("q127_editdist_confirm")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L)))
  }

  test("q127: high-Jaccard candidate past EditMax is generated then rejected") {
    val dir = docsDir((1L, base), (5L, base + " " + farWord))
    val docs = Tables.documents(spark, dir)
    val cand = NearDup
      .candidatePairs(NearDup.shingleHashed(docs, "doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 5L))) // recall stage: the pair IS a candidate
    val confirmed = SparkEntry.queries("q127_editdist_confirm")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(confirmed.isEmpty) // precision stage: 101 edits > 80 rejects it
  }

  /** The q128 per-term micro-score evaluated in the SAME IEEE shape as
    * the SQL on both engines (each op correctly rounded, so bit-equal). */
  private def bm25Micro(tf: Long, df: Long, dl: Long,
                        nDocs: Long, sumDl: Long): Long =
    math.floor(1000000.0 *
      (((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)) *
      (tf.toDouble * 2.2) /
      (tf.toDouble + 1.2 * (0.25 + 0.75 *
        (dl.toDouble * nDocs.toDouble / sumDl.toDouble)))).toLong

  test("q128: scores equal the shape-identical formula and rank by relevance") {
    // terms are (spark, vector, merge); plant distinct tf/dl profiles
    val dir = docsDir(
      (1L, "spark spark vector"),     // tf (2,1,0), dl 3
      (2L, "merge line"),             // tf (0,0,1), dl 2
      (3L, "row scan table"),         // tf (0,0,0), dl 3
      (4L, "spark vector merge row")) // tf (1,1,1), dl 4
    val got = SparkEntry.queries("q128_bm25_topk")(spark, dir)
      .select("rank", "doc_id", "score_micro")
      .as[(Int, Long, Long)].collect().toSeq
    val n = 4L; val sumDl = 12L
    def score(tf: Seq[Long], dl: Long): Long =
      Seq(2L, 2L, 2L).zip(tf).map { case (df, t) =>
        bm25Micro(t, df, dl, n, sumDl) }.sum
    val expected = Map(
      1L -> score(Seq(2L, 1L, 0L), 3L),
      2L -> score(Seq(0L, 0L, 1L), 2L),
      4L -> score(Seq(1L, 1L, 1L), 4L))
    // doc 4 matches all three terms, doc 1 two with repetition, doc 2 one,
    // doc 3 none (score 0, ranked last by doc_id tiebreak)
    assert(got.map(_._2) == Seq(4L, 1L, 2L, 3L))
    assert(got.map(r => r._2 -> r._3).toMap ==
      expected + (3L -> 0L))
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
  }

  test("q143: RRF rewards agreement across retrievers, scores match the formula") {
    // doc 4 covers all three terms (top of BOTH retrievers); doc 1 is
    // BM25-strong (repetition) but coverage-weak; doc 2 coverage-tied
    // with 1 but shorter, so retriever B ranks it above 1 — fusion must
    // place 4 first, and every score must recompute from the published
    // ranks: 1000000/(60+ra) + 1000000/(60+rb), integer-floored.
    val dir = docsDir(
      (1L, "spark spark spark spark vector line row table scan"),
      (2L, "vector merge"),
      (3L, "row scan table"),
      (4L, "spark vector merge row"))
    val got = SparkEntry.queries("q143_rrf_fusion")(spark, dir)
      .as[(Int, Long, Long, Int, Int)].collect().toSeq
    assert(got.head._2 == 4L, "the doc both retrievers rank highest must fuse first")
    got.foreach { case (_, id, micro, ra, rb) =>
      val exp = (if (ra > 0) 1000000L / (60 + ra) else 0L) +
                (if (rb > 0) 1000000L / (60 + rb) else 0L)
      assert(micro == exp, s"doc $id fused score $micro != recomputed $exp")
    }
    // doc 3 matches no term: present only through retriever A's pool
    // (BM25 score 0 still ranks by doc_id) with rank_b = -1
    val d3 = got.find(_._2 == 3L).get
    assert(d3._5 == -1, "no-term doc must not appear in the coverage retriever")
  }

  /** q205 rows keyed for assertion: (n, bucket) → the five count columns. */
  private def rougeRows(dir: String): Map[(Long, Long), (Long, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("q205_rouge_bleu")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map { case (n, b, np, sig, clip, cand, ref, f1) =>
        (n, b) -> ((np, sig, clip, cand, ref, f1)) }.toMap

  test("q205: clipped counts, ppm metrics, and buckets match hand computation") {
    // pair 0: ref "the cat sat on the mat" / cand "the cat the cat mat"
    //   1-grams: clip = min-count overlap the:2 cat:1 mat:1 = 4 of cand 5,
    //   ref 6 → p = 800000 (bucket 8), r = 666666, f1 = 727272
    //   2-grams: cand has "the cat"x2, ref x1 → clip CLIPPED to 1 (not 2)
    //   of cand 4, ref 5 → p = 250000 (bucket 2), r = 200000, f1 = 222222
    // pair 1: zero overlap → bucket 0 at both n
    // doc 4: even id with no odd partner → must not appear in any pair
    val dir = docsDir(
      (0L, "the cat sat on the mat"),
      (1L, "the cat the cat mat"),
      (2L, "aaa bbb"),
      (3L, "ccc ddd"),
      (4L, "xxx yyy"))
    val got = rougeRows(dir)
    assert(got((1L, 8L)) == ((1L, 0L, 4L, 5L, 6L, 727272L)))
    assert(got((2L, 2L)) == ((1L, 0L, 1L, 4L, 5L, 222222L)))
    assert(got((1L, 0L)) == ((1L, 1L, 0L, 2L, 2L, 0L)))
    assert(got((2L, 0L)) == ((1L, 1L, 0L, 1L, 1L, 0L)))
    assert(got.keySet == Set((1L, 8L), (1L, 0L), (2L, 2L), (2L, 0L)),
      "unpaired doc 4 must contribute no row")
  }

  test("q205: identical one-token pair hits bucket 10; empty bigram sets guard the division") {
    val dir = docsDir((0L, "alpha"), (1L, "alpha"))
    val got = rougeRows(dir)
    // 1-gram: perfect overlap → p = r = f1 = 1000000, bucket 10
    assert(got((1L, 10L)) == ((1L, 0L, 1L, 1L, 1L, 1000000L)))
    // 2-gram: both gram sets empty → totals 0, metrics 0 (no divide-by-zero)
    assert(got((2L, 0L)) == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("q205 property: histogram equals a STRING-level multiset reference on a 5-token vocab") {
    // tokens from a 5-word vocabulary → heavy within-doc repetition, so
    // the clip genuinely clips (min of counts > 1 both sides). The
    // reference implementation counts grams AS STRINGS — independent of
    // the query's 60-bit hashing — and rebuilds the whole histogram.
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(30)
      (id, (1 to n).map(_ => vocab(rnd.nextInt(5))).mkString(" "))
    }
    val dir = docsDir(docs: _*)
    def grams(toks: Seq[String], k: Int): Map[Seq[String], Long] =
      toks.sliding(k).filter(_.size == k).toSeq.groupBy(identity)
        .map { case (g, o) => g -> o.size.toLong }
    val byId = docs.toMap.map { case (id, t) => id -> t.split(" ").toSeq }
    val expect = (for {
      pid <- 0L until 30L
      n <- Seq(1, 2)
      ref = byId.get(pid * 2); cand = byId.get(pid * 2 + 1)
      if ref.isDefined && cand.isDefined
    } yield {
      val (gr, gc) = (grams(ref.get, n), grams(cand.get, n))
      val clip = gc.map { case (g, c) => math.min(c, gr.getOrElse(g, 0L)) }.sum
      val (ct, rt) = (gc.values.sum, gr.values.sum)
      val p = if (ct == 0) 0L else 1000000L * clip / ct
      val r = if (rt == 0) 0L else 1000000L * clip / rt
      val f1 = if (p + r == 0) 0L else 2 * p * r / (p + r)
      (n.toLong, p / 100000L, pid, clip, ct, rt, f1)
    }).groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      k -> ((rows.size.toLong, rows.map(_._3).sum, rows.map(_._4).sum,
        rows.map(_._5).sum, rows.map(_._6).sum, rows.map(_._7).sum))
    }
    assert(rougeRows(dir) == expect)
  }
}
