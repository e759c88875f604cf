package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Audio-fingerprint near-dup (q174 / Multimodal.audioFingerprint):
  * the codec-path fingerprint is pinned cross-engine by the analytic
  * oracle; these specs pin what the oracle can't see — gain invariance
  * of the energy-gradient bits, and that the banded candidate join
  * loses NOTHING against brute force (pigeonhole: ≤ 2 flipped bits
  * leave at least one of the 3 bands exact). */
class AudioFpSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  import spark.implicits._

  private def fp(id: Long): Long =
    Multimodal.audioFingerprint(id, Multimodal.syntheticPairWav(id)).fp

  test("fingerprint is invariant under the 9/8 re-gain (modulo floor dust)") {
    // scaling every sample by 9/8 scales every window energy by ~9/8,
    // which preserves every energy-gradient SIGN except where two
    // windows are so close that per-sample truncation flips the
    // comparison — so most planted pairs must hash identically and
    // nearly all must land within the join threshold
    val dists = (0L until 100L by 2).map { k =>
      java.lang.Long.bitCount(fp(k) ^ fp(k + 1))
    }
    val exact = dists.count(_ == 0)
    val close = dists.count(_ <= 2)
    assert(exact >= 35, s"only $exact/50 planted pairs hash identically")
    assert(close >= 45, s"only $close/50 planted pairs within Hamming 2")
  }

  test("q174's banded join equals brute force over the fingerprint table") {
    val d = java.nio.file.Files.createTempDirectory("graft_audiofp").toString
    val ids = (0L until 40L)
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val hs = ids.map(i => i -> fp(i)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 2
    } yield (a, b, hd.toLong)).sorted
    val got = SparkEntry.queries("q174_audiofp_neardup")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
