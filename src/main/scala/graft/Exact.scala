package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric-exactness helpers for cross-engine (Spark ↔ DuckDB oracle)
  * hash-matching.
  *
  * Floating-point SUM/AVG results depend on summation order, which differs
  * between Spark's partial/final hash aggregation and DuckDB's vectorized
  * (and, for windows, segment-tree) aggregation. To make results bit-identical
  * regardless of order, all money-like 2-decimal measures are summed as exact
  * integers ("cents": value × 100 as BIGINT via an intermediate
  * DECIMAL(18,2) rounding), and only converted to DOUBLE at the very end.
  * Integer sums are associative+commutative exactly, and a BIGINT < 2^53
  * converts to the same DOUBLE in every IEEE-754 engine; a final division by
  * a power-of-ten literal is then a single identical IEEE operation on both
  * sides.
  *
  * The same expressions are mirrored verbatim in the DuckDB `oracleSql`
  * strings (see [[SparkEntry]]), e.g.
  * `CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)`.
  *
  * At 100 TB this is also the *faster* plan: integer hash aggregation beats
  * decimal aggregation, stays inside whole-stage codegen, and partial
  * (map-side) aggregation loses nothing to rounding.
  */
object Exact {
  private val Dec2 = DecimalType(18, 2)

  /** value → exact integer cents (value rounded to 2 decimals × 100). */
  def cents(c: Column): Column = (c.cast(Dec2) * 100).cast("long")

  /** Sum a 2-decimal measure exactly; emit DOUBLE. */
  def sumMoney(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Exact mean of a 2-decimal measure; emit DOUBLE.
    * (sum as cents, single double division — avoids engine-dependent AVG.) */
  def avgMoney(c: Column): Column =
    sum(cents(c)).cast("double") / (count(lit(1)) * 100.0).cast("double")

  /** lineitem discounted revenue in exact 1e-4 units:
    * extendedprice(2dp) × (1 − discount(2dp)) → scale-4 decimal × 10000. */
  def rev4(price: Column, discount: Column): Column =
    (price.cast(Dec2) * (lit(1) - discount.cast(Dec2)) * 10000).cast("long")

  /** Scale-4 integer sum back to DOUBLE. */
  def sumRev4(price: Column, discount: Column): Column =
    sum(rev4(price, discount)).cast("double") / 10000.0

  /** SQL fragments for the DuckDB oracle, kept next to their Spark twins. */
  object sql {
    def cents(x: String): String = s"CAST(CAST($x AS DECIMAL(18,2)) * 100 AS BIGINT)"
    def sumMoney(x: String): String = s"CAST(SUM(${cents(x)}) AS DOUBLE) / 100.0"
    def avgMoney(x: String): String =
      s"CAST(SUM(${cents(x)}) AS DOUBLE) / CAST(COUNT(*) * 100.0 AS DOUBLE)"
    def rev4(p: String, d: String): String =
      s"CAST(CAST($p AS DECIMAL(18,2)) * (1 - CAST($d AS DECIMAL(18,2))) * 10000 AS BIGINT)"
    def sumRev4(p: String, d: String): String =
      s"CAST(SUM(${rev4(p, d)}) AS DOUBLE) / 10000.0"
  }
}
