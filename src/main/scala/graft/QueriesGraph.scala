package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-analysis family: iterative random-walk importance over the
  * customer–supplier bipartite purchase graph — the PageRank-shaped
  * member of the iterative set (alongside q51 components, q83 k-means,
  * q108 power iteration), with the iteration expressed as a fixed unroll
  * so the whole walk stays one declarative Catalyst plan.
  *
  * Exactness: node masses are integers; each edge transfer is
  * floor(mass·w / out_weight) computed in DECIMAL(19,0)×DECIMAL(19,0) →
  * DECIMAL(38,0) with integral DIV (HUGEINT `//` in the DuckDB twin —
  * truncation agrees on nonnegative values), so every hop is
  * shuffle-order-proof and bit-identical cross-engine. The floored
  * transfer deterministically sheds < 1 mass unit per edge per hop —
  * a documented property of the operator, not engine noise.
  *
  * Scale shape (100 TB): edges = one fact⨝fact equi-join collapsed to
  * (customer, supplier, weight) — strictly smaller than lineitem; each
  * hop is one edge-keyed shuffle join against a node-sized mass table
  * and one map-side-combinable sum — the standard distributed PageRank
  * step. Hop count is fixed (3), so plan depth is bounded; high-degree
  * hubs are ordinary AQE skew-join work. The edge table is cached
  * because every hop and both out-weight tables read it.
  */
object QueriesGraph {

  type Q = (SparkSession, String) => DataFrame

  /** Seed mass per customer. Headroom: total mass is conserved (minus
    * floor shed), so any node mass ≤ n_cust·1e6 ≈ 1.5e15 at 1e9
    * customers — inside int64; per-edge products run in DECIMAL(38,0). */
  private val Scale = 1000000L
  private val TopK  = 20

  /** Floored per-edge mass transfer, exact past int64 (q120 pattern). */
  private def flow(r: String, w: String, tot: String): String =
    s"(CAST($r AS DECIMAL(19,0)) * CAST($w AS DECIMAL(19,0))) DIV " +
      s"CAST($tot AS DECIMAL(19,0))"

  // --- q129: supplier importance via a 3-hop floored random walk -------------
  // Uniform seed on customers → suppliers → customers → suppliers.
  // m1 is the first-hop supplier mass (pure purchase share); m2 folds in
  // second-order structure (suppliers favored by customers who favor
  // strong suppliers) — the two columns make the walk's effect auditable.
  private val q129: Q = (s, dir) => {
    val li  = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
      .agg(count(lit(1)).as("w"))
      .cache()
    val wC = edges.groupBy("c").agg(sum("w").as("wc"))
    val vS = edges.groupBy("sup").agg(sum("w").as("vs"))
    val m1 = edges.join(wC, "c")
      .select(col("sup"), expr(flow(Scale.toString, "w", "wc")).as("t"))
      .groupBy("sup").agg(sum("t").as("m1"))
    val r1 = edges.join(vS, "sup").join(m1, "sup")
      .select(col("c"), expr(flow("m1", "w", "vs")).as("t"))
      .groupBy("c").agg(sum("t").as("r1"))
    val m2 = edges.join(wC, "c").join(r1, "c")
      .select(col("sup"), expr(flow("r1", "w", "wc")).as("t"))
      .groupBy("sup").agg(sum("t").as("m2"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    val w = Window.orderBy(desc("m2"), col("s_suppkey"))
    m2.join(m1, "sup").join(sup, col("sup") === col("s_suppkey"))
      .orderBy(desc("m2"), col("s_suppkey")).limit(TopK)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("s_suppkey"), col("s_name"),
        col("m1"), col("m2"))
      .orderBy(col("rank"))
  }
  private def flowSql(r: String, w: String, tot: String): String =
    s"CAST((CAST($r AS HUGEINT) * $w) // $tot AS BIGINT)"
  private val q129Sql =
    s"""WITH edges AS (
       |  SELECT o_custkey AS c, l_suppkey AS sup, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2
       |), wc_t AS (SELECT c, CAST(SUM(w) AS BIGINT) AS wc FROM edges GROUP BY c),
       |vs_t AS (SELECT sup, CAST(SUM(w) AS BIGINT) AS vs FROM edges GROUP BY sup),
       |m1_t AS (
       |  SELECT sup, CAST(SUM(${flowSql(Scale.toString, "w", "wc")}) AS BIGINT) AS m1
       |  FROM edges JOIN wc_t USING (c) GROUP BY sup
       |), r1_t AS (
       |  SELECT c, CAST(SUM(${flowSql("m1", "w", "vs")}) AS BIGINT) AS r1
       |  FROM edges JOIN vs_t USING (sup) JOIN m1_t USING (sup) GROUP BY c
       |), m2_t AS (
       |  SELECT sup, CAST(SUM(${flowSql("r1", "w", "wc")}) AS BIGINT) AS m2
       |  FROM edges JOIN wc_t USING (c) JOIN r1_t USING (c) GROUP BY sup
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY m2 DESC, s_suppkey) AS INTEGER)
       |    AS rank,
       |  s_suppkey, s_name, m1, m2
       |FROM (
       |  SELECT s_suppkey, s_name, m1, m2
       |  FROM m2_t JOIN m1_t USING (sup) JOIN supplier ON sup = s_suppkey
       |  ORDER BY m2 DESC, s_suppkey LIMIT $TopK
       |)
       |ORDER BY rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "q129_supplier_walk" -> q129)

  val oracleSql: Map[String, String] = Map(
    "q129_supplier_walk" -> q129Sql)
}
