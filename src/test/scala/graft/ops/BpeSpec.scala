package graft.ops

import graft.SparkSpec

/** The iterative BPE trainer against an INDEPENDENT in-memory reference
  * implementation (same semantics, written naively over Scala
  * collections), plus pinned hand-checked first merges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference BPE: word-frequency map → n merges. Greedy
    * left-to-right non-overlapping merge application; argmax ties break
    * on (count DESC, left, right). */
  private def refBpe(words: Map[String, Long], n: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.split("").toVector, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) =
          counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
      }
      round += 1
    }
    out.result()
  }

  test("train matches the naive reference on a mixed corpus (10 merges)") {
    val texts = Seq(
      "low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest low lower",
      "the cat sat on the mat the cat ran the end",
      "banana bandana ban banana")
    val words = texts.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val expected = refBpe(words, 10)

    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 10)
      .map(m => (m.left, m.right, m.freq))
    assert(got == expected)
    assert(got.size == 10)
  }

  test("first merges are the hand-checked ones; merged symbols compound") {
    // "aaab aaab aaab ab" → pairs: aa 2/word ×3 = 6, ab 1×3 + 1 = 4
    // merge 1 = (a,a) 6. After: [aa,a,b]×3, [a,b]. Pairs: (aa,a) 3,
    // (a,b) 4 → merge 2 = (a,b) 4. After: [aa,ab]×3, [ab].
    // merge 3 = (aa,ab) 3 — a multi-char compound on both sides.
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 3).map(m => (m.left, m.right, m.freq))
    assert(got == Seq(("a", "a", 6L), ("a", "b", 4L), ("aa", "ab", 3L)))
  }

  test("train stops early when the vocab runs out of pairs") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 10)
    // merges: (a,b) 2, (c,d) 1 — then every word is one symbol
    assert(got.map(m => (m.left, m.right, m.freq)) ==
      Seq(("a", "b", 2L), ("c", "d", 1L)))
  }

  test("q104: corpus encode under 3 learned merges, hand-computed") {
    // Distinct words: "abab" wf=3, "cd" wf=3.
    // Round 1 pairs: (a,b) 6, (b,a) 3, (c,d) 3 → merge (a,b).
    // Round 2: (ab,ab) 3 ties (c,d) 3 → "ab" < "c" → merge (ab,ab).
    // Round 3: only (c,d) 3 left → merge (c,d).
    // Encoded: "abab" → [abab] = 1 token, "cd" → [cd] = 1 token.
    val d = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "abab abab cd", "en", "s0", 12L),
        (2L, "abab cd cd", "en", "s1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q104_bpe_encode")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // s0: 3 words, 10 chars, 3 tokens → 300 tokens per 1000 chars
      ("s0", 1L, 3L, 10L, 3L, 300L),
      ("s1", 1L, 3L, 8L, 3L, 375L)))
  }
}
