package graft

import org.apache.spark.sql.functions.lit

/** q173 nDCG eval: endpoint and mid-curve gains checked against the
  * discount-table formula recomputed independently here. With no query
  * term present every BM25 score is 0 and the ranking is doc_id order —
  * which makes the rank assignment exact and the DCG hand-computable. */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  private def w(r: Int): Long =
    math.floor(1e6 * math.log(2) / math.log(r + 1)).toLong

  private def mkDocs(d: String, langs: Seq[String]): Unit =
    langs.zipWithIndex.map { case (l, i) => (i + 1L, "x y", l) }
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")

  test("q173: perfectly ordered relevance gives nDCG = 1e6 exactly") {
    val d = java.nio.file.Files.createTempDirectory("graft_ndcg1").toString
    mkDocs(d, Seq.fill(5)("en"))
    val got = SparkEntry.queries("q173_ndcg_eval")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val dcg = 2L * (1 to 5).map(w).sum
    assert(got == ((5L, 0L, dcg, dcg, 1000000L)))
  }

  test("q173: relevant docs ranked last earn the tail discounts only") {
    val d = java.nio.file.Files.createTempDirectory("graft_ndcg2").toString
    // ranking = doc_id order (all scores 0): 10 irrelevant docs first,
    // 5 relevant at ranks 11-15; ideal puts them at ranks 1-5
    mkDocs(d, Seq.fill(10)("fr") ++ Seq.fill(5)("en"))
    val got = SparkEntry.queries("q173_ndcg_eval")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val dcg = 2L * (11 to 15).map(w).sum
    val idcg = 2L * (1 to 5).map(w).sum
    assert(got == ((5L, 0L, dcg, idcg, 1000000L * dcg / idcg)))
  }
}
