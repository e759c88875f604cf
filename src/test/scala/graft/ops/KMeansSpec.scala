package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd's trainer on planted clusters: convergence to the true
  * centers, deterministic retrains, and empty-cell carryover. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // 30 vectors in 3 well-separated axis clusters; id % 3 = cluster, so
  // the deterministic seed (lowest 3 ids) starts one centroid per
  // cluster. Deterministic jitter keeps members distinct.
  private def planted() = {
    val rows = (0 until 30).map { i =>
      val c = i % 3
      val jit = (i / 3) % 5 * 0.1
      val v = Array.tabulate(4)(d => if (d == c) 10.0 + jit else jit * 0.5)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "v")
      .withColumn("q", expr(KMeans.codesExpr("v")))
  }

  test("converges to the planted centers; members split evenly") {
    val cents = KMeans.train(planted(), "vec_id", "q", k = 3, iters = 3)
    assert(cents.map(_.cnt).sum == 30L)
    assert(cents.forall(_.cnt == 10L))
    // each trained centroid dominates exactly one axis, near full code
    // scale (the cluster's axis quantizes to ~127, off-axes to ~0)
    val axes = cents.map(c => c.means.zipWithIndex.maxBy(_._1)._2)
    assert(axes.toSet == Set(0, 1, 2))
    cents.foreach { c =>
      val m = c.means
      val axis = m.zipWithIndex.maxBy(_._1)._2
      assert(m(axis) > 120.0, s"cell ${c.cell} mean $m")
      m.zipWithIndex.filter(_._2 != axis)
        .foreach { case (x, _) => assert(math.abs(x) < 10.0) }
    }
  }

  test("training is deterministic across runs") {
    val a = KMeans.train(planted(), "vec_id", "q", 3, 3)
    val b = KMeans.train(planted(), "vec_id", "q", 3, 3)
    assert(a == b)
  }

  test("an emptied cell keeps its previous centroid") {
    // 5 identical vectors, k=2: both seeds identical, every point ties
    // and goes to the lowest cell; cell 1 never gets members and must
    // keep its (count 1) seed state instead of dividing by zero
    val docs = (0 until 5).map(i => (i.toLong, Array(1.0, 2.0, 3.0)))
      .toDF("vec_id", "v")
      .withColumn("q", expr(KMeans.codesExpr("v")))
    val cents = KMeans.train(docs, "vec_id", "q", 2, 2)
    assert(cents(0).cnt == 5L)
    assert(cents(1).cnt == 1L)
    assert(cents(1).sums == cents(0).sums.map(_ / 5))
  }
}
