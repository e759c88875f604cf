package graft

/** Hand-computed fixtures for the round-8 quantitative quartet:
  * q163 Nelson–Aalen hazard (censoring must keep at-risk counts honest),
  * q164 Mann–Whitney AUC (tie-averaged ranks doubled to stay integral),
  * q165 FIFO lot allocation (cumulative-interval intersection — matched
  * quantities and signed lags checked against a by-hand FIFO walk),
  * q166 Heaps' curve (first-occurrence grain: a re-seen type must not
  * count again at a later checkpoint).
  */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  test("q163: censored customers stay at-risk, hazard is the floored recurrence") {
    val d = java.nio.file.Files.createTempDirectory("graft_km").toString
    // horizon = 2024-06-01 (c4's last order). Lifetimes (weeks) and fate:
    //   c1: Jan01→Jan15 = w2, gap 138d > 60 → churn at w2
    //   c2: Jan01→Jan08 = w1, gap 145d > 60 → churn at w1
    //   c3: May20 only  = w0, gap 12d  ≤ 60 → censored at w0
    //   c4: Jan01→Jun01 = w21, gap 0   ≤ 60 → censored at w21
    // risk sets: w1 → 3 (c3 left at w0), w2 → 2.
    // hazard: w1 = 1e6/3 = 333333, w2 = 1e6/2 = 500000; cum = 333333, 833333.
    Seq((1L, "2024-01-01"), (1L, "2024-01-15"),
      (2L, "2024-01-01"), (2L, "2024-01-08"),
      (3L, "2024-05-20"),
      (4L, "2024-01-01"), (4L, "2024-06-01"))
      .toDF("o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val got = SparkEntry.queries("q163_survival_hazard")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 3L, 333333L, 333333L),
      (2L, 1L, 2L, 500000L, 833333L)))
  }

  test("q164: tied ranks average, one-sided nations drop, AUC spans [0,1000]") {
    val d = java.nio.file.Files.createTempDirectory("graft_mw").toString
    // ALPHA: A={10,20}, B={15,20} → U1 = 1.5 (the 20-20 tie contributes
    // half a win) → 2U1 = 3, AUC‰ = ⌊1000·3/8⌋ = 375.
    // BETA: A={50}, B={40} → A always wins: U1 = 1 = n1·n2, AUC‰ = 1000.
    // GAMMA: A only → no B sample → excluded.
    Seq((0, "10.00", "BUILDING"), (0, "20.00", "BUILDING"),
      (0, "15.00", "MACHINERY"), (0, "20.00", "MACHINERY"),
      (1, "50.00", "BUILDING"), (1, "40.00", "MACHINERY"),
      (2, "5.00", "BUILDING"),
      (0, "99.00", "FURNITURE")) // other segment: ignored
      .toDF("c_nationkey", "bal", "c_mktsegment")
      .selectExpr("c_nationkey", "CAST(bal AS DOUBLE) AS c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq((0, "ALPHA"), (1, "BETA"), (2, "GAMMA"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$d/nation.parquet")
    val got = SparkEntry.queries("q164_mannwhitney_auc")(spark, d)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(("ALPHA", 2L, 2L, 3.0, 375L),
      ("BETA", 1L, 1L, 2.0, 1000L)))
  }

  test("q165: interval intersection reproduces the by-hand FIFO walk") {
    val d = java.nio.file.Files.createTempDirectory("graft_fifo").toString
    // part 1: supply lots (R) [0,5) Jan10 and [5,10) Jan20; demand lots
    // (A) [0,3) Jan05, [3,7) Jan12, [7,10) Jan25. FIFO matches:
    //   s1→d1: 3 units, lag +5   s1→d2: 2 units, lag −2
    //   s2→d2: 2 units, lag +8   s2→d3: 3 units, lag −5
    // → 4 pairs, 10 units, Σ(units·lag) = 15−4+16−15 = 12.
    // part 2: supply only → no pairs, brand absent. 'N' rows ignored.
    Seq((1L, 101L, 1, "R", "2024-01-10", 5.0),
      (1L, 102L, 1, "R", "2024-01-20", 5.0),
      (1L, 201L, 1, "A", "2024-01-05", 3.0),
      (1L, 202L, 1, "A", "2024-01-12", 4.0),
      (1L, 203L, 1, "A", "2024-01-25", 3.0),
      (1L, 301L, 1, "N", "2024-01-02", 9.0),
      (2L, 401L, 1, "R", "2024-01-02", 7.0))
      .toDF("l_partkey", "l_orderkey", "l_linenumber", "l_returnflag",
        "l_shipdate", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, "Brand#1"), (2L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$d/part.parquet")
    val got = SparkEntry.queries("q165_fifo_allocation")(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("Brand#1", 4L, 10L, 12L)))
  }

  test("q166: types count once, at their first checkpoint") {
    val d = java.nio.file.Files.createTempDirectory("graft_heaps").toString
    // mx=3 → bucket = doc_id·20 DIV 4 = 5·doc_id. Types a,b first at
    // bucket 0; c at 5; doc 2 re-sees a (no new type); d at 15.
    Seq((0L, "a b a"), (1L, "b c"), (2L, "a"), (3L, "d d"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q166_heaps_curve")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 3L, 2L), (5L, 2L, 1L, 5L, 3L),
      (10L, 1L, 0L, 6L, 3L), (15L, 2L, 1L, 8L, 4L)))
  }
}
