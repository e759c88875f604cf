package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Perceptual-hash image dedup (q171 / Multimodal.dhashPng):
  * the codec-path hash itself is pinned cross-engine by the analytic
  * oracle; these specs pin the two properties the oracle can't see —
  * brightness invariance of the gradient bits, and that the banded
  * candidate join loses NOTHING against brute force (pigeonhole: ≤ 3
  * flipped bits leave at least one of the 4 bands exact). */
class PhashSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  import spark.implicits._

  private def hamming(a: Multimodal.ImageHash, b: Multimodal.ImageHash): Int =
    java.lang.Long.bitCount(a.h1 ^ b.h1) + java.lang.Long.bitCount(a.h2 ^ b.h2)

  test("dHash is invariant under the +1 exposure shift (modulo channel wraps)") {
    // a uniform +1 shift cancels in every gradient sign EXCEPT where a
    // sampled channel sits at 255 and wraps to 0 — so most planted pairs
    // must hash IDENTICALLY and nearly all must land within the join
    // threshold (the same distribution the sf0.01 oracle run shows:
    // 155/250 exact, 247/250 within Hamming 3)
    val dists = (0L until 100L by 2).map { k =>
      val a = Multimodal.dhashPng(k, Multimodal.syntheticPairPng(k))
      val b = Multimodal.dhashPng(k + 1, Multimodal.syntheticPairPng(k + 1))
      hamming(a, b)
    }
    val exact = dists.count(_ == 0)
    val close = dists.count(_ <= 3)
    assert(exact >= 25, s"only $exact/50 planted pairs hash identically")
    assert(close >= 45, s"only $close/50 planted pairs within Hamming 3")
  }

  test("q171's banded join equals brute force over the hash table") {
    val d = java.nio.file.Files.createTempDirectory("graft_phash").toString
    val ids = (0L until 40L)
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val hs = ids.map(i =>
      i -> Multimodal.dhashPng(i, Multimodal.syntheticPairPng(i))).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      hd = hamming(hs(a), hs(b)) if hd <= 3
    } yield (a, b, hd.toLong)).sorted
    val got = SparkEntry.queries("q171_phash_neardup")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
