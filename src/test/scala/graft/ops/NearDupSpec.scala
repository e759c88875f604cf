package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NearDup library operator: LSH finds the planted near-dup pair, exact
  * Jaccard gates it, survivor selection keeps the lowest id. */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  private lazy val docs = Seq(
    (1L, base),
    (2L, base + " phi"),                        // near-dup of 1
    (3L, "one two three four five six seven eight nine ten eleven twelve " +
         "thirteen fourteen fifteen sixteen"),  // unrelated
    (4L, "tiny")                                // below min length, filtered
  ).toDF("doc_id", "text")

  private lazy val hashed = NearDup.shingleHashed(docs, "doc_id", "text").cache()

  test("LSH + exact Jaccard finds exactly the planted pair") {
    val got = NearDup.pairs(hashed, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("jaccard value is the exact shingle-set overlap") {
    val j = NearDup.pairs(hashed, 0.5).select("jaccard").as[Double].head()
    // doc1: 18 3-shingles, doc2: 19; 18 shared -> 18/19
    assert(math.abs(j - 18.0 / 19.0) < 1e-12)
  }

  test("survivors keep the lowest id of each duplicate group") {
    val kept = NearDup.survivors(docs, col("doc_id"), NearDup.pairs(hashed, 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // 2 dropped as dup of 1
  }

  test("one-hop vs transitive survivors on a planted a~c~b chain") {
    // chain through the HIGHEST id: 10~30 and 20~30 are pairs, 10~20 is not
    val chain = Seq((10L, 30L), (20L, 30L)).toDF("doc_a", "doc_b")
    val cdocs = Seq(10L, 20L, 30L, 99L).toDF("doc_id")
    // greedy one-hop keeps BOTH 10 and 20: 20's only direct near-dup (30)
    // has a higher id, so nothing drops it — the known flaw
    val oneHop = NearDup.survivors(cdocs, col("doc_id"), chain)
      .select("doc_id").as[Long].collect().toSet
    assert(oneHop == Set(10L, 20L, 99L))
    // transitive closure sees {10,20,30} as one group -> one survivor
    val transitive = NearDup.transitiveSurvivors(cdocs, col("doc_id"), chain)
      .select("doc_id").as[Long].collect().toSet
    assert(transitive == Set(10L, 99L))
  }

  test("components assign min reachable id across multiple groups") {
    val pairs = Seq(
      (2L, 1L), (2L, 3L),           // component 1 (unordered pair input)
      (7L, 8L), (8L, 9L), (9L, 10L) // component 7: diameter-3 chain
    ).toDF("doc_a", "doc_b")
    val comp = Components.minLabel(pairs, "doc_a", "doc_b")
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L))
  }
}

/** Embedding-space near-dup: same-bucket LSH candidates + exact cosine. */
class VectorNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("finds a planted near-identical vector pair and keeps the survivor") {
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(64)(rnd.nextFloat())
    val nearDup = base.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.001f else x }
    val others = (3L to 30L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(64)(r.nextFloat() - 0.5f))
    }
    val vecs = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("vec_id", "embedding")
    val prep = VectorNearDup.prepared(vecs, "vec_id", "embedding", 8, 64).cache()
    val got = VectorNearDup.pairs(prep, 0.999)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // near-identical vectors share every sign bit
    val kept = VectorNearDup.survivors(vecs, col("vec_id"),
        VectorNearDup.pairs(prep, 0.999))
      .select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(2L) && kept.contains(1L) && kept.size == 29)
  }

  test("multiprobe finds every single-bucket pair plus Hamming-1 neighbors, once") {
    val vecs = (1L to 40L).map { i =>
      val r = new scala.util.Random(i % 7) // collisions -> identical vectors
      (i, Seq.fill(64)(r.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val prep = VectorNearDup.prepared(vecs, "vec_id", "embedding", 8, 64).cache()
    val single = VectorNearDup.pairs(prep, 0.0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    val multi = VectorNearDup.pairsMultiprobe(prep, 0.0, 8)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    // no duplicate candidate pairs (each pair matches exactly one probe)
    assert(multi.distinct.size == multi.size)
    assert(single.toSet.subsetOf(multi.toSet))
    // identical vectors (same seed) share a bucket -> found by both
    assert(single.toSet.contains((1L, 8L)))
  }

  test("adaptiveNPlanes sizes bits to corpus, clamped to [floor, cap]") {
    // below floor·target the floor holds; then ceil(log2(n/target))
    assert(VectorNearDup.adaptiveNPlanes(1000) == 8)
    assert(VectorNearDup.adaptiveNPlanes(50000) == 10)   // sf1 embeddings
    assert(VectorNearDup.adaptiveNPlanes(5000000) == 17)
    assert(VectorNearDup.adaptiveNPlanes(Long.MaxValue) == 20) // cap
    assert(VectorNearDup.adaptiveNPlanes(0) == 8)        // empty corpus
  }

  test("buckets REFINE as planes grow: candidates only shrink, dups survive") {
    // VectorOps.planes is a fixed sequence, so bucket@8 = bucket@12 mod 2^8:
    // the same-bucket pair set at 12 planes must be a subset of the set at
    // 8, while a near-identical pair (all sign bits agree) survives any
    // plane count — the invariant that makes the adaptive knob safe to
    // turn on a live corpus.
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(64)(rnd.nextFloat())
    val nearDup = base.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.001f else x }
    val others = (3L to 60L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(64)(r.nextFloat() - 0.5f))
    }
    val vecs = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("vec_id", "embedding")
    val at8 = VectorNearDup.pairs(
        VectorNearDup.prepared(vecs, "vec_id", "embedding", 8, 64), 0.0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val at12 = VectorNearDup.pairs(
        VectorNearDup.prepared(vecs, "vec_id", "embedding", 12, 64), 0.0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(at12.subsetOf(at8))
    assert(at12.contains((1L, 2L)) && at8.contains((1L, 2L)))
    val (prepA, nA) = VectorNearDup.preparedAdaptive(
      vecs, "vec_id", "embedding", 64, targetPerBucket = 64)
    assert(nA == 8) // 60 vectors -> floor
    val adaptive = VectorNearDup.pairsMultiprobe(prepA, 0.999, nA)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(adaptive == Set((1L, 2L)))
  }
}
