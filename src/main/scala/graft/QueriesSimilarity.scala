package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{KMeans, VectorOps}

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §7.2 "scale ops" / training-data extensions).
  *
  * q31 is the exact baseline: brute-force cosine top-k per query vector.
  * q32 is the scale path: deterministic random-hyperplane LSH buckets turn
  * the O(N·Q) scan into an equi-join on bucket id.
  *
  * Cross-engine exactness: cosine is the deterministic sequential fold of
  * [[VectorOps]] — identical doubles, so per-query ranking (incl. the
  * rank column itself) hash-matches the DuckDB oracle.
  *
  * Scale shapes (100 TB): the query side is small (broadcast); the corpus
  * side never shuffles in q31 (map-side cross product of a broadcast query
  * set + per-partition top-k heap via window-limit). q32 additionally
  * prunes the corpus scan to matching buckets; at real scale the bucket id
  * becomes the table's partition key so bucket pruning happens at the scan.
  */
object QueriesSimilarity {

  type Q = (SparkSession, String) => DataFrame

  private val NQueries = 10
  private val NPlanes  = 8
  private val Dim      = 64
  private[graft] val KmIters = 3

  /** Trained IVF centroids, memoized per (sf dir, k) so q41/q64/q83 and
    * repeated bench runs train once. Training is deterministic, so the
    * memo is a pure cache — PROVIDED the parquet at `dir` is immutable
    * for the JVM's lifetime (true of the read-only driver testdata this
    * contract targets). A caller regenerating data in place at the same
    * path must restart the JVM (or this memo would serve centroids
    * trained on the old bytes). */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), IndexedSeq[KMeans.Centroid]]
  private[graft] def trainedCents(s: SparkSession, dir: String,
                                  k: Int): IndexedSeq[KMeans.Centroid] =
    centCache.getOrElseUpdate((dir, k), {
      val em = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(VectorOps.toDoubleExpr("embedding")).as("v"))
        .select(col("vec_id"), expr(KMeans.codesExpr("v")).as("q"))
      KMeans.train(em, "vec_id", "q", k, KmIters)
    })

  // --- q31: brute-force cosine top-k per query (exact ANN baseline) ----------
  private val q31: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val em = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(VectorOps.toDoubleExpr("embedding")).as("v"))
      .withColumn("nrm", expr(VectorOps.normExpr("v")))
    val queries = em.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val corpus = em.filter(col("vec_id") >= NQueries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    corpus.join(broadcast(queries))
      .withColumn("cosine",
        expr(VectorOps.fastDot("qv", "v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q31Sql = {
    val X = VectorOps.sql
    s"""WITH e AS (
       |  SELECT vec_id, embedding AS v, ${X.norm("embedding")} AS nrm FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${X.dot("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
       |  FROM e q JOIN e c ON q.vec_id < $NQueries AND c.vec_id >= $NQueries
       |), ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // --- q32: LSH-bucketed ANN — search only the query's sign-bit bucket -------
  private val q32: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val bucket = VectorOps.hyperplaneBucketExpr("v", NPlanes, Dim)
    val em = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(VectorOps.toDoubleExpr("embedding")).as("v"))
      .withColumn("nrm", expr(VectorOps.normExpr("v")))
      .withColumn("bucket", expr(bucket))
    val queries = em.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
              col("nrm").as("qn"), col("bucket"))
    val corpus = em.filter(col("vec_id") >= NQueries)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .withColumn("cosine",
        expr(VectorOps.fastDot("qv", "v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              col("bucket"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q32Sql = {
    val X = VectorOps.sql
    s"""WITH e AS (
       |  SELECT vec_id, embedding AS v, ${X.norm("embedding")} AS nrm,
       |    CAST(${X.hyperplaneBucket("embedding", NPlanes, Dim)} AS BIGINT) AS bucket
       |  FROM embeddings
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
       |    ${X.dot("q.v", "c.v")} / (q.nrm * c.nrm) AS cosine
       |  FROM e q JOIN e c ON q.bucket = c.bucket
       |   AND q.vec_id < $NQueries AND c.vec_id >= $NQueries
       |), ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, bucket, cosine, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // --- q41: IVF-style ANN — probe the 2 nearest centroid cells ---------------
  // Cells come from REAL offline k-means ([[graft.ops.KMeans]] — Lloyd's
  // over int8-quantized codes, deterministic seed, fixed 3 iterations;
  // q83 oracle-verifies the trained centroids themselves). Assignment is
  // the Euclidean argmin in code space (argmax of dot − |m|²/2); queries
  // probe nprobe=2 cells. At scale the cell id is the table partition
  // key, so probing prunes the scan to ~2/NCells of the corpus.
  private val NCells = 8
  private val q41: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val cents = trainedCents(s, dir, NCells)
    val em = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(VectorOps.toDoubleExpr("embedding")).as("v"))
      .withColumn("nrm", expr(VectorOps.normExpr("v")))
      .withColumn("cd",
        expr(s"transform(${KMeans.codesExpr("v")}, x -> CAST(x AS DOUBLE))"))
    val scoreCols = KMeans.scoreExprs("cd", cents)
      .zipWithIndex.map { case (e, i) => expr(e).as(s"s$i") }
    val withCell = em.select(col("vec_id") +: col("v") +: col("nrm") +: scoreCols: _*)
      .withColumn("cell", expr(VectorOps.argmaxCase(NCells)))
    val corpus = withCell.filter(col("vec_id") >= NQueries)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val probes = withCell.filter(col("vec_id") < NQueries)
      .withColumn("cell2", expr(VectorOps.argmaxCase(NCells, Some("cell"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
              col("nrm").as("qn"),
              explode(array(col("cell"), col("cell2"))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("vec_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine",
        expr(VectorOps.fastDot("qv", "v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              col("cell"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val q41Sql = {
    val X = VectorOps.sql
    val scores = KMeans.sql.cellScores("q", NCells)
      .zipWithIndex.map { case (e, i) => s"$e AS s$i" }.mkString(",\n")
    s"""WITH ${KMeans.sql.embeddingTrainingCtes(NCells, KmIters)},
       |e AS (
       |  SELECT vec_id, v, ${X.norm("v")} AS nrm,
       |$scores
       |  FROM qkm CROSS JOIN cl
       |), c1 AS (
       |  SELECT *, ${VectorOps.argmaxCase(NCells)} AS cell FROM e
       |), probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn,
       |    unnest([cell, ${VectorOps.argmaxCase(NCells, Some("cell"))}]) AS cell
       |  FROM c1 WHERE vec_id < $NQueries
       |), corpus AS (
       |  SELECT vec_id, v, nrm, cell FROM c1 WHERE vec_id >= $NQueries
       |), scored AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id, c.cell,
       |    ${X.dot("p.qv", "c.v")} / (p.qn * c.nrm) AS cosine
       |  FROM probes p JOIN corpus c ON c.cell = p.cell
       |), ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cell, cosine, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // --- q83: the k-means training itself, cross-engine ------------------------
  // Dumps the trained centroid state (per-cell, per-dim integer code sums
  // + member counts) after the fixed Lloyd's iterations — the oracle
  // proves BOTH engines learn bit-identical centroids, which is what lets
  // q41/q64 embed them. Integer state means no float tolerance games:
  // the hash match is exact.
  private val q83: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    // padded (unseeded) cells are excluded: they exist only so q41/q64's
    // fixed-arity argmax expressions analyze on tiny corpora — the
    // DuckDB twin's LIMIT-k seed never materializes them
    val cents = trainedCents(s, dir, NCells).filter(_.seeded)
    cents.flatMap(c => c.sums.zipWithIndex.map { case (sv, d) =>
      (c.cell, d + 1, sv, c.cnt)
    }).toDF("cell", "d", "s", "cnt").orderBy(col("cell"), col("d"))
  }
  private val q83Sql =
    s"""WITH ${KMeans.sql.embeddingTrainingCtes(NCells, KmIters)}
       |SELECT cell, CAST(d AS INTEGER) AS d, sums[d] AS s, cnt
       |FROM cent$KmIters
       |CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS d)
       |ORDER BY cell, d""".stripMargin

  // --- q108: exact-integer power iteration (dominant spectral direction) -----
  // The top eigenvector direction of the embedding set's UNCENTERED
  // second-moment (Gram) matrix by fixed-count power iteration — the
  // one-component PCA a curation pipeline uses to spot a degenerate
  // embedding space (a dominant direction everything projects onto).
  // Float power iteration can't cross-engine-hash (each iteration
  // compounds summation-order differences), so this one never leaves
  // int64: vectors are the int8 codes (q68 formula), v₀ is the
  // lowest-id vector's codes, and each round computes
  //   s_i = qᵢ·v   (per-row integer dot, v broadcast as a literal)
  //   w_d = Σᵢ qᵢd·s_i  (posexplode + one 64-row combinable aggregate)
  // then RESCALES v back into int8 range with sign-split integer
  // division — sign(w)·(|w| DIV (max|w| DIV 127 + 1)) — so magnitudes
  // stay bounded (|w| ≤ n·127²·64·127 ≈ 1.3e18 even at n = 10¹⁰
  // vectors) and truncation direction agrees across engines (Spark DIV
  // truncates toward zero, DuckDB // floors; they only agree on
  // non-negatives — the q93 discipline). Per iteration: ONE scan of the
  // cached codes, a 64-row shuffle, a 64-long driver collect (the
  // dimension-sized collect discipline, exactly KMeans.train's loop).
  private val PowerIters = 3
  private val q108: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val codes = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(VectorOps.toDoubleExpr("embedding")).as("v"))
      .select(col("vec_id"), expr(KMeans.codesExpr("v")).as("q"))
      .cache()
    val seedRows = codes.orderBy(col("vec_id")).limit(1).select(col("q")).collect()
    val out: Seq[(Long, Long)] = if (seedRows.isEmpty) Seq.empty
    else {
      var v: IndexedSeq[Long] = seedRows(0).getSeq[Long](0).toIndexedSeq
      for (_ <- 1 to PowerIters) {
        val vlit = v.map(x => s"${x}L").mkString("array(", ", ", ")")
        val w = codes
          .withColumn("s", expr(
            s"""aggregate(zip_with(q, $vlit, (x, y) -> x * y),
               |  CAST(0 AS BIGINT), (acc, p) -> acc + p)""".stripMargin))
          .select(posexplode(col("q")).as(Seq("d", "c")), col("s"))
          .groupBy(col("d")).agg(sum(col("c") * col("s")).as("w"))
          .orderBy(col("d"))
          .collect().map(_.getLong(1)).toIndexedSeq
        val qdiv = w.map(math.abs).max / 127L + 1L
        v = w.map(x => math.signum(x) * (math.abs(x) / qdiv))
      }
      v.zipWithIndex.map { case (x, i) => ((i + 1).toLong, x) }
    }
    codes.unpersist()
    out.toDF("d", "val").orderBy(col("d"))
  }
  private val q108Sql = {
    def iter(k: Int): String = {
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s"""s$k AS (
         |  SELECT cr.vec_id, CAST(SUM(cr.c * $prev.val) AS BIGINT) AS s
         |  FROM cr JOIN $prev ON cr.d = $prev.d GROUP BY cr.vec_id
         |),
         |w$k AS (
         |  SELECT cr.d, CAST(SUM(cr.c * s$k.s) AS BIGINT) AS w
         |  FROM cr JOIN s$k ON cr.vec_id = s$k.vec_id GROUP BY cr.d
         |),
         |m$k AS (SELECT MAX(abs(w)) // 127 + 1 AS qd FROM w$k),
         |v$k AS (
         |  SELECT d, (CASE WHEN w < 0 THEN -1 WHEN w > 0 THEN 1 ELSE 0 END)
         |    * (abs(w) // qd) AS val
         |  FROM w$k, m$k
         |)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |),
       |qz AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> CAST(floor(x *
       |      (CASE WHEN list_max(list_transform(v, y -> abs(y))) = 0.0 THEN 1.0
       |            ELSE 127.0 / list_max(list_transform(v, y -> abs(y))) END)
       |      + 0.5) AS BIGINT)) AS q
       |  FROM e
       |),
       |dims AS (SELECT unnest(generate_series(1, $Dim)) AS d),
       |cr AS (SELECT vec_id, d, q[d] AS c FROM qz CROSS JOIN dims),
       |v0 AS (
       |  SELECT d, q[d] AS val
       |  FROM (SELECT q FROM qz ORDER BY vec_id LIMIT 1) CROSS JOIN dims
       |),
       |${(1 to PowerIters).map(iter).mkString(",\n")}
       |SELECT CAST(d AS BIGINT) AS d, val FROM v$PowerIters ORDER BY d""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q31_cosine_topk" -> q31,
    "q32_ann_lsh_bucket" -> q32,
    "q41_ann_ivf_probe" -> q41,
    "q83_kmeans_train" -> q83,
    "q108_power_iteration" -> q108)

  val oracleSql: Map[String, String] = Map(
    "q31_cosine_topk" -> q31Sql,
    "q32_ann_lsh_bucket" -> q32Sql,
    "q41_ann_ivf_probe" -> q41Sql,
    "q83_kmeans_train" -> q83Sql,
    "q108_power_iteration" -> q108Sql)
}
