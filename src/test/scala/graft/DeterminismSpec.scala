package graft

import org.apache.spark.sql.Row

/** Shuffle-order determinism: the engine's cross-engine exactness story
  * rests on results not depending on HOW rows are partitioned — integer
  * aggregates commute, float columns are derived from exact integers in a
  * fixed expression shape, ties break on total orders. This spec actually
  * permutes the partitioning (different shuffle-partition counts send
  * keys to different tasks in different orders) and asserts bit-identical
  * results, float columns included, for one representative query per
  * risk family. At cluster scale the partition count is never in the
  * user's control (AQE retunes it mid-query), so anything that fails
  * here would be nondeterministic in production.
  */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // one per family where an ordering bug could hide: float-from-integer
  // stats (q100), windowed smoothing (q08), double division in dedup
  // scoring (q27), BM25 float scoring + top-k ties (q128), ratio-of-sums
  // (q23), percentile element selection (q121)
  // ... plus the r10 additions whose determinism is load-bearing: the
  // greedy MMR argmax over a TakeOrdered pool (q207 — pool-boundary and
  // in-loop ties), and the leakage audit whose group keys come from an
  // iterative component loop (q208)
  private val targets = Seq(
    "q100_exact_corr",
    "q08_smoothed_series",
    "q27_minhash_lsh",
    "q128_bm25_topk",
    "q23_guarded_ratios",
    "q121_weighted_median",
    "q207_mmr_diversify",
    "q208_leakage_split")

  private def runAt(name: String, partitions: Int): Seq[Row] = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", partitions)
    try SparkEntry.queries(name)(spark, sfDir).collect().toSeq
    finally conf.set("spark.sql.shuffle.partitions", prev)
  }

  targets.foreach { name =>
    test(s"$name is bit-identical under 2 vs 29 shuffle partitions") {
      val a = runAt(name, 2)
      val b = runAt(name, 29)
      assert(a == b, s"$name diverged under repartitioning")
      assert(a.nonEmpty, s"$name returned no rows — vacuous check")
    }
  }
}
