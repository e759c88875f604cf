package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.FuzzySearch

/** Round-7 approximate-search queries: the fuzzy-name lookup the
  * reference exposes as its player search (`fetcher/query_player.ts:
  * 23-56` — FuzzySearch + cap + per-result stats), re-expressed over the
  * driver's tables: the candidate dictionary is the distinct word
  * vocabulary of part names, the "stats" carried per result are the
  * part count and min part key bearing the word.
  */
object QueriesSearch {

  type Q = (SparkSession, String) => DataFrame

  private val FuzzyQuery = "choclate" // deliberate misspelling
  private val FuzzyK     = 10

  // --- q81: fuzzy dictionary search, top-k by edit distance ------------------
  // One vocab-sized shuffle builds the (word, stats) dictionary; the
  // levenshtein scan + TakeOrdered top-k is ops/FuzzySearch verbatim.
  private val q81: Q = (s, dir) => {
    val words = Tables.part(s, dir)
      .select(explode(split(col("p_name"), " ")).as("word"), col("p_partkey"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("first_key"))
    FuzzySearch.topK(words, "word", FuzzyQuery, FuzzyK)
      .select(col("rank"), col("word"), col("dist"),
        col("n_parts"), col("first_key"))
      .orderBy(col("rank"))
  }
  private val q81Sql =
    s"""WITH words AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_parts,
       |    MIN(p_partkey) AS first_key
       |  FROM (SELECT unnest(string_split(p_name, ' ')) AS word, p_partkey
       |        FROM part)
       |  GROUP BY word
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist, word) AS INTEGER) AS rank,
       |  word, CAST(dist AS INTEGER) AS dist, n_parts, first_key
       |FROM (
       |  SELECT word, levenshtein(word, '$FuzzyQuery') AS dist,
       |    n_parts, first_key
       |  FROM words
       |  ORDER BY dist, word LIMIT $FuzzyK
       |)
       |ORDER BY rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "q81_fuzzy_search" -> q81)

  val oracleSql: Map[String, String] = Map(
    "q81_fuzzy_search" -> q81Sql)
}
