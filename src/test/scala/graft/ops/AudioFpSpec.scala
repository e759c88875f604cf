package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Audio-fingerprint near-dup (q174 / Multimodal.audioFingerprint):
  * the codec-path fingerprint is pinned cross-engine by the analytic
  * oracle; these specs pin what the oracle can't see — gain invariance
  * of the energy-gradient bits, and that the banded candidate join
  * loses NOTHING against brute force (pigeonhole: ≤ 3 flipped bits
  * leave at least one of the 4 bands exact). */
class AudioFpSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  import spark.implicits._

  private def fp(id: Long): (Long, Long) = {
    val f = Multimodal.audioFingerprint(id, Multimodal.syntheticPairWav(id))
    (f.fp1, f.fp2)
  }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("fingerprint is invariant under the 9/8 re-gain (modulo floor dust)") {
    // scaling every sample by 9/8 scales every window energy by ~9/8,
    // which preserves every energy-gradient SIGN except where two
    // windows are so close that per-sample truncation flips the
    // comparison — so most planted pairs must hash identically and
    // nearly all must land within the join threshold; at 126 bits the
    // per-bit dust-flip budget is wider than the 31-bit version's, so
    // the identical-hash bar relaxes while the within-threshold bar
    // stays strict
    val dists = (0L until 100L by 2).map(k => ham(fp(k), fp(k + 1)))
    val exact = dists.count(_ == 0)
    val close = dists.count(_ <= 3)
    assert(exact >= 40, s"only $exact/50 planted pairs hash identically")
    assert(close >= 48, s"only $close/50 planted pairs within Hamming 3")
  }

  test("wide fingerprint separates non-pairs: no incidental collisions " +
      "among 200 distinct base waveforms") {
    // the 31-bit word incidentally collided at n²/2³¹ — the whole point
    // of the 126-bit upgrade is that unrelated docs land ≥ 4 apart
    val hs = (0L until 400L by 2).map(fp)
    val incidental = (for {
      i <- hs.indices; j <- hs.indices if i < j
      if ham(hs(i), hs(j)) <= 3
    } yield (i, j)).size
    assert(incidental == 0,
      s"$incidental incidental near-collisions among distinct bases")
  }

  test("q174's banded join equals brute force over the fingerprint table") {
    val d = java.nio.file.Files.createTempDirectory("graft_audiofp").toString
    val ids = (0L until 40L)
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val hs = ids.map(i => i -> fp(i)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      hd = ham(hs(a), hs(b)) if hd <= 3
    } yield (a, b, hd.toLong)).sorted
    val got = SparkEntry.queries("q174_audiofp_neardup")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
