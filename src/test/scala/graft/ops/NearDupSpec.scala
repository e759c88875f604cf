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
}
