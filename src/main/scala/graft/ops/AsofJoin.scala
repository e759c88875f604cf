package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the latest right row of the same key
  * at-or-before the left row's time. Spark has no native ASOF JOIN
  * (DuckDB, Pandas and kdb do); the naive encodings are an inequality
  * join (quadratic per key) or a per-row range probe. This is the
  * scale-correct composition: tag both sides, UNION, and carry the most
  * recent right payload forward in ONE window pass — a single shuffle on
  * the key and a single ordered scan, identical in cost to
  * sessionization.
  *
  * Semantics details:
  *  - right rows sort BEFORE left rows at equal ts (kind 0 < 1), so the
  *    join is inclusive (at-or-before), matching DuckDB `ON l.ts >= r.ts`;
  *  - among right rows tied on (key, ts), the LAST in `tieBreakCol` order
  *    wins — equivalent to deduping the right side to max(tieBreak) per
  *    (key, ts); mirror that rule in any cross-engine oracle. The caller
  *    must guarantee tieBreakCol is UNIQUE per (key, ts) (an id column) —
  *    with duplicate tie-breaks the carried payload is shuffle-order
  *    nondeterministic;
  *  - NULL semantics follow the SQL join: right rows with a null key or
  *    null ts can never be "at or before" anything and are dropped here
  *    (a left row therefore gets a null payload rather than matching
  *    them, exactly as DuckDB's `ON l.ts >= r.ts AND l.k = r.k` never
  *    matches NULLs);
  *  - the right payload is carried as ONE struct, so all carried fields
  *    come from the SAME right row even when individual fields are null;
  *  - left rows with no prior right row keep a null payload (left-join
  *    semantics; filter `asof_<col> IS NOT NULL` for inner).
  */
object AsofJoin {

  /** @param payloadCols right columns to carry (emitted as `asof_<name>`,
    *                    in this order); must all exist on `right`
    * @param tieBreakCol right column ordering ties on equal (key, ts);
    *                    must be unique per (key, ts)
    */
  def latestAtOrBefore(left: DataFrame, right0: DataFrame,
                       keyCol: String, tsCol: String,
                       payloadCols: Seq[String],
                       tieBreakCol: String): DataFrame = {
    val missing = payloadCols.filterNot(right0.columns.contains)
    require(missing.isEmpty, s"payload columns absent from right side: $missing")
    val reserved = Set("_kind", "_tb", "_asof", "_carried")
    val clash = (left.columns ++ payloadCols).filter(reserved)
    require(clash.isEmpty,
      s"column names ${clash.toSeq} are reserved by AsofJoin internals; rename them first")
    // output-name collisions too: a left column literally named
    // asof_<payload> (e.g. a previous asof join's output fed back in)
    // would emit a duplicate column name — legal to build, but any
    // downstream col() reference throws AMBIGUOUS_REFERENCE far from
    // the cause; fail here instead
    val outClash = payloadCols.map(n => s"asof_$n").filter(left.columns.contains)
    require(outClash.isEmpty,
      s"left side already has ${outClash} — the asof_<payload> output names collide")
    val right = right0.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val leftOther  = left.schema.filter(f => f.name != keyCol && f.name != tsCol)
    val payload    = payloadCols.map(n => right0.schema(n))
    val payloadTyp = StructType(payload)
    val lSide = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_kind"),
          lit(null).cast(right.schema(tieBreakCol).dataType).as("_tb")) ++
        leftOther.map(f => col(f.name)) :+
        lit(null).cast(payloadTyp).as("_asof"): _*)
    val rSide = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_kind"),
          col(tieBreakCol).as("_tb")) ++
        leftOther.map(f => lit(null).cast(f.dataType).as(f.name)) :+
        struct(payload.map(f => col(f.name)): _*).as("_asof"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_kind"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.union(rSide)
      .withColumn("_carried", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .select(
        Seq(col(keyCol), col(tsCol)) ++
          leftOther.map(f => col(f.name)) ++
          payload.map(f => col(s"_carried.${f.name}").as(s"asof_${f.name}")): _*)
  }
}
