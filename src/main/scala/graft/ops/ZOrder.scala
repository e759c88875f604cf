package graft.ops

/** Z-order (Morton) key construction — the multi-dimensional layout
  * primitive behind `q109_zorder_layout` and the write-path proof
  * (ZOrderWriteSpec): interleave the bits of two range-bucketed
  * dimensions into one key, so data sorted by that ONE key clusters BOTH
  * dims and parquet row-group min/max statistics skip for range
  * predicates on either dimension.
  *
  * The interleave is plain integer div/mod/multiply so the SAME formula
  * runs as a Spark SQL expression and as the DuckDB oracle twin
  * (`div` = "DIV" vs "//"); semantics are identical for non-negative
  * inputs. At 100 TB the write is
  * `repartitionByRange(z).sortWithinPartitions(z)` — range partitioning
  * makes files disjoint in z, the within-partition sort makes row groups
  * disjoint in z, and disjoint z-blocks confine both raw dimensions
  * (the q109 span audit proves the confinement bound).
  */
object ZOrder {

  /** Bits per dimension in the interleave (dims are bucketed to [0, 2^Bits)). */
  val Bits = 8

  /** SQL expression interleaving the low [[Bits]] bits of `x` (even
    * positions) and `y` (odd positions). `div` is the integer-divide
    * operator spelling: "DIV" for Spark, "//" for DuckDB. */
  def interleaveExpr(x: String, y: String, div: String = "DIV"): String =
    (0 until Bits).map { b =>
      val p = 1L << b; val q4 = 1L << (2 * b)
      s"((($x) $div $p) % 2) * $q4 + ((($y) $div $p) % 2) * ${2 * q4}"
    }.mkString("(", " + ", ")")
}
