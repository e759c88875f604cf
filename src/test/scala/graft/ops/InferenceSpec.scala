package graft.ops

import graft.SparkSpec

/** Batched inference plumbing: exact batch slicing, row preservation, and
  * fail-fast on a misbehaving model. */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("partition iterator is sliced into exact batches, remainder last") {
    val ds = (1L to 20L).map(i => Inference.DocIn(i, s"t$i"))
      .toDS().repartition(1)
    // a 'model' that reports the batch size it saw: with 20 rows and
    // batchSize 8 the slices must be 8, 8, 4
    val sizes = Inference.scoreBatched(ds, 8, b => b.map(_ => b.length.toDouble))
      .collect().toSeq
    assert(sizes.map(_.score).groupBy(identity).view.mapValues(_.size).toMap ==
      Map(8.0 -> 16, 4.0 -> 4))
    // every doc scored exactly once
    assert(sizes.map(_.doc_id).sorted == (1L to 20L))
  }

  test("stub scorer matches its closed form; bad model sizes fail fast") {
    val ds = Seq(Inference.DocIn(1L, "a b a"), Inference.DocIn(2L, "x y z"))
      .toDS().repartition(1)
    val got = Inference.scoreBatched(ds, 10, Inference.stubModel)
      .collect().map(r => r.doc_id -> r.score).toMap
    assert(got(1L) == 2.0 * 2 / 3) // 2 distinct of 3 tokens
    assert(got(2L) == 2.0)         // all distinct
    val err = intercept[org.apache.spark.SparkException] {
      Inference.scoreBatched(ds, 10, _ => Seq(1.0)).collect()
    }
    assert(err.getMessage != null)
  }
}
