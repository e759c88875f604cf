package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact LINE-grain deduplication — the corpus-wide pass RefinedWeb and
  * Dolma run alongside document-level dedup: a line (navigation chrome,
  * cookie banner, license boilerplate) that recurs across the corpus is
  * dropped from every document IN PLACE, and each document is reassembled
  * from its surviving lines in original order. Document dedup can't catch
  * this — the documents differ; 8-gram scrubbing catches only runs ≥ k
  * tokens — the line grain is the published middle ground.
  *
  * Keep rule (deterministic, arrival-order-free — unlike the
  * bloom-filter "first writer wins" of a streaming pass): a line whose
  * corpus-wide occurrence count exceeds `maxCount` keeps ONLY its
  * globally-first occurrence — min (doc_id, position) — and every other
  * occurrence drops; lines at or under `maxCount` keep all occurrences.
  * `maxCount = 1` is classic exact line dedup (any repeated line
  * collapses to one surviving copy corpus-wide). BLANK lines never
  * dedup — they are formatting, not content, and dropping "all but the
  * corpus-first empty line" would mangle every multi-paragraph document.
  *
  * The grain is the `sep` separator: newline (the default) gives the
  * classic line pass, a blank line (`"\n\n"`) gives the PARAGRAPH
  * grain Dolma's dedupe runs — the same operator serves both ends of
  * the published spectrum. `sep` must be regex-neutral (control/plain
  * characters): it reaches Spark's `split` as a pattern.
  *
  * Plan shape (100 TB): explode lines with positions (map-side) → ONE
  * combinable aggregate per line hash (count + integer arg-min — never a
  * window, so a line occurring 10⁸ times costs a partial-agg tree, not a
  * single-task sort) → equi-join lines to their hash stats (content-hash
  * keys; heavy hitters are exactly the lines being dropped, and AQE's
  * skew split handles their join fan-out) → per-doc ordered reassembly
  * (sort_array over collected (pos, line) structs, q61's discipline).
  * Two shuffles total: line-hash agg+join, doc-keyed reassembly.
  *
  * The occurrence key packs (doc_id, pos) into one BIGINT
  * (doc_id · 2²⁰ + pos) so the arg-min is a plain MIN — exact while
  * pos < 2²⁰ (a million lines per document) and 0 ≤ doc_id < 2⁴³. The
  * bounds are ENFORCED per row: an id scheme past them (snowflake-style
  * 10¹⁸ ids, a concatenated-log doc with > 2²⁰ lines) raises on the
  * Spark side instead of silently wrapping the key and electing an
  * arbitrary occurrence as "globally first" — the DuckDB twin already
  * errors loudly on the same BIGINT overflow, so the engines fail
  * together rather than diverge.
  */
object LineDedup {

  /** Max lines per document the packed occurrence key supports. */
  val MaxLinesPerDoc: Long = 1L << 20

  /** A separator string as an engine-neutral chr() concat — the same
    * literal bytes on both engines with no quoting hazards. */
  private def sepExpr(sep: String): String = {
    require(sep.nonEmpty, "separator must be non-empty")
    if (sep.length == 1) s"chr(${sep.head.toInt})"
    else sep.map(c => s"chr(${c.toInt})").mkString("concat(", ", ", ")")
  }

  /** Rewrites `textCol` with over-`maxCount` duplicated lines removed
    * (globally-first occurrence survives), preserving line order.
    * Returns the input columns plus `n_lines`/`n_kept_lines` audit
    * columns. `idCol` must be a BIGINT document key. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 maxCount: Long, sep: String = "\n"): DataFrame = {
    val sp = sepExpr(sep)
    val lines = docs.select(col(idCol),
      posexplode(expr(s"split($textCol, $sp, -1)"))
        .as(Seq("_ld_pos", "_ld_line")))
      .withColumn("_ld_h", expr(TextOps.hash60("_ld_line")))
      .withColumn("_ld_occ", expr(
        s"""IF($idCol >= 0 AND $idCol < ${1L << 43}L
           |     AND _ld_pos < ${MaxLinesPerDoc}L,
           |   $idCol * ${MaxLinesPerDoc}L + _ld_pos,
           |   raise_error(concat('LineDedup packed key out of range: ',
           |     'doc_id=', CAST($idCol AS STRING),
           |     ' pos=', CAST(_ld_pos AS STRING))))""".stripMargin))
    // Only OVER-maxCount hashes can drop a line, so the join's build
    // side is pre-filtered to exactly those: lines at/under the cap and
    // blank lines simply miss the join (null cnt) and keep. The
    // surviving stats table is the over-duplicated line set — tiny
    // relative to the corpus (it IS what the pass removes) — so AQE
    // broadcasts it and the corpus side never shuffles for the join;
    // the unfiltered form shipped one stats row per DISTINCT line and
    // shuffled the whole exploded corpus against it.
    val stats = lines.filter(col("_ld_line") =!= "")
      .groupBy(col("_ld_h"))
      .agg(count(lit(1)).as("_ld_cnt"), min(col("_ld_occ")).as("_ld_first"))
      .filter(col("_ld_cnt") > maxCount)
    val kept = lines.join(stats, Seq("_ld_h"), "left")
      .filter(col("_ld_cnt").isNull ||
        col("_ld_occ") === col("_ld_first"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_lines"),
        expr(s"""array_join(transform(
          |  array_sort(collect_list(struct(_ld_pos, _ld_line))),
          |  x -> x._ld_line), $sp)""".stripMargin).as("_ld_rebuilt"))
    docs
      .withColumn("n_lines",
        expr(s"CAST(size(split($textCol, $sp, -1)) AS BIGINT)"))
      .join(kept, Seq(idCol), "left")
      .withColumn("n_kept_lines", coalesce(col("n_kept_lines"), lit(0L)))
      .withColumn(textCol, coalesce(col("_ld_rebuilt"), lit("")))
      .drop("_ld_rebuilt")
  }

  /** DuckDB twin of [[dedupLines]] as a CTE chain over relation `src`
    * (columns: `idCol` BIGINT, `textCol`). Terminal CTE:
    * `ld_out(idCol, textCol, n_lines, n_kept_lines)` — text rebuilt.
    * DuckDB's string_split is literal (not regex) — agrees with the
    * Spark side exactly for regex-neutral separators. */
  object sql {
    def ctes(src: String, idCol: String, textCol: String,
             maxCount: Long, sep: String = "\n"): String = {
      val split = s"string_split($textCol, ${sepExpr(sep)})"
      val h = TextOps.sql.hash60("_ld_line")
      s"""ld_lines AS (
         |  SELECT $idCol, unnest($split) AS _ld_line,
         |    unnest(generate_series(1, len($split))) AS _ld_pos
         |  FROM $src
         |), ld_hashed AS (
         |  -- the same packed-key range guard the Spark side enforces
         |  -- (pos here is 1-based, so <= where Spark's 0-based is <):
         |  -- BIGINT alone only overflows loudly past doc_id 2^43, NOT at
         |  -- pos >= 2^20 where keys would silently bleed into the next
         |  -- doc_id's range — error() keeps the engines failing together
         |  SELECT $idCol, _ld_pos, _ld_line, $h AS _ld_h,
         |    CASE WHEN $idCol >= 0 AND $idCol < ${1L << 43}
         |           AND _ld_pos <= ${MaxLinesPerDoc}
         |      THEN $idCol * ${MaxLinesPerDoc} + _ld_pos
         |      ELSE CAST(error('LineDedup packed key out of range') AS BIGINT)
         |      END AS _ld_occ
         |  FROM ld_lines
         |), ld_stats AS (
         |  SELECT _ld_h, CAST(COUNT(*) AS BIGINT) AS _ld_cnt,
         |    MIN(_ld_occ) AS _ld_first
         |  FROM ld_hashed WHERE _ld_line <> '' GROUP BY _ld_h
         |), ld_kept AS (
         |  SELECT l.$idCol, CAST(COUNT(*) AS BIGINT) AS n_kept_lines,
         |    string_agg(l._ld_line, ${sepExpr(sep)} ORDER BY l._ld_pos)
         |      AS _ld_rebuilt
         |  FROM ld_hashed l LEFT JOIN ld_stats s ON l._ld_h = s._ld_h
         |  WHERE s._ld_cnt IS NULL OR s._ld_cnt <= $maxCount
         |    OR l._ld_occ = s._ld_first
         |  GROUP BY l.$idCol
         |), ld_out AS (
         |  SELECT d.$idCol,
         |    COALESCE(k._ld_rebuilt, '') AS $textCol,
         |    CAST(len($split) AS BIGINT) AS n_lines,
         |    COALESCE(k.n_kept_lines, CAST(0 AS BIGINT)) AS n_kept_lines
         |  FROM $src d LEFT JOIN ld_kept k USING ($idCol)
         |)""".stripMargin
    }
  }
}
