package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pair-free interval-overlap counting: for every interval, the number of
  * DISTINCT other entities owning at least one interval that intersects it —
  * computed by interval algebra over rank sweeps, never by enumerating
  * overlapping pairs.
  *
  * Why: the natural encoding (bucket-blocked interval self-join, then
  * DISTINCT users per session — q72's original plan) materializes every
  * genuinely-overlapping pair before aggregating. That volume is data-
  * inherent and grows with density²: 3.7 M pairs at sf0.1 → 380 M at sf1
  * (measured, SURVEY §Round-8) → ~4·10¹² at the 100 TB scale point. The
  * metric, however, is a COUNT, and counts admit algebra the pair stream
  * does not.
  *
  * The algebra. Per entity the intervals are disjoint and time-ordered
  * (sessionization guarantees consecutive sessions are separated by at
  * least the gap threshold), so the intervals of entity u that intersect a
  * probe interval [s,e] form a CONTIGUOUS RUN of u's sorted intervals.
  * Summing (run length) − (run length − 1) over entities with non-empty
  * runs:
  *
  *   distinct entities intersecting [s,e]  (self included)
  *     = #{intervals [st,en] : st ≤ e ∧ en ≥ s}
  *     − #{consecutive same-entity pairs (i, i+1) both intersecting [s,e]}
  *
  * and pair (i, i+1) both-intersects [s,e]  ⟺  the GAP [en_i, st_{i+1}]
  * lies inside [s,e] (en_i ≥ s ∧ st_{i+1} ≤ e). The probe's own entity
  * contributes exactly 1 (its own interval; own gaps can never lie inside
  * an own interval — adjacent gaps end/start strictly outside it), so the
  * answer is (intersect count) − (contained-gap count) − 1.
  *
  * Each term is near-linear:
  *
  *  - intersect count = #{st ≤ e} − #{en < s} (every non-intersecting
  *    interval with st ≤ e has en < s, and vice versa). Both are RANK
  *    LOOKUPS against the global multiset of starts / ends, computed as a
  *    bucketed cumulative histogram: counts per minute bucket, prefix-
  *    summed two-level (within calendar day, then across the day table),
  *    then one minute-keyed equi-join per term plus a boundary-minute
  *    equi-join for the sub-bucket remainder. No window ever sees more
  *    than a day of buckets except the day-level prefix (calendar-sized).
  *  - contained-gap count: a gap spans ≥ gapUs by construction, so only
  *    probes of duration ≥ gapUs can contain one — the containment join
  *    runs long-probes × gaps, blocked on the gap-start's coarse bucket
  *    (each gap has ONE such bucket, so no post-join dedup).
  *
  * At 100 TB: shuffles are keyed on entity (sessionize), minute bucket
  * (histogram + rank lookups), day (prefix), and coarse bucket (gap join)
  * — all near-uniform; the day-level prefix window is calendar-sized. No
  * stage is proportional to overlap-pair volume. Measured at sf1 this
  * replaces a 59 s pair plan with a ~6 s sweep producing identical rows.
  */
object OverlapCount {

  private val MinuteUs = 60000000L
  private val MinutesPerDay = 1440L

  /** Per-interval distinct-other-entity overlap counts.
    *
    * @param sess     one row per interval: `entity`, `seq`, `start_us`,
    *                 `end_us` (inclusive epoch-µs bounds); per-entity
    *                 intervals must be disjoint with gaps ≥ `gapUs`
    *                 (what [[Sessionize.sessions]] emits for its threshold)
    * @param gapUs    the sessionization gap in µs — the floor on same-entity
    *                 inter-interval gaps, which prunes the containment join
    * @param coarseUs blocking bucket width for the containment join
    * @return `entity`, `seq`, `n_overlap_users` (> 0 rows only, matching
    *         the pair-join encoding which never emits overlap-free rows)
    */
  def distinctOverlaps(sess: DataFrame, gapUs: Long,
                       coarseUs: Long): DataFrame = {
    val s = sess.select(col("entity"), col("seq"),
      col("start_us"), col("end_us")).cache()

    // --- minute-bucketed cumulative histogram of starts and ends ----------
    // Key set = every minute holding a start or an end, so each probe's
    // boundary minute is present and the rank lookup is a plain equi-join.
    val starts = s.select(expr(s"start_us DIV ${MinuteUs}L").as("m"),
      col("start_us").as("v"))
    val ends = s.select(expr(s"end_us DIV ${MinuteUs}L").as("m"),
      col("end_us").as("v"))
    val minutes = starts.select("m").union(ends.select("m")).distinct()
    val hist = minutes
      .join(starts.groupBy("m").agg(count(lit(1)).as("cs")), Seq("m"), "left")
      .join(ends.groupBy("m").agg(count(lit(1)).as("ce")), Seq("m"), "left")
      .select(col("m"), coalesce(col("cs"), lit(0L)).as("cs"),
        coalesce(col("ce"), lit(0L)).as("ce"))
      .withColumn("day", expr(s"m DIV ${MinutesPerDay}L"))
    // Two-level prefix: within-day over ≤1440 minute rows, then across the
    // day table (calendar-sized — the only global window, documented).
    val wDay = Window.partitionBy("day").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDays = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayCum = hist.groupBy("day")
      .agg(sum("cs").as("dcs"), sum("ce").as("dce"))
      .select(col("day"),
        coalesce(sum("dcs").over(wDays), lit(0L)).as("dayCsBefore"),
        coalesce(sum("dce").over(wDays), lit(0L)).as("dayCeBefore"))
    val cum = hist
      .select(col("m"), col("day"),
        coalesce(sum("cs").over(wDay), lit(0L)).as("mCsBefore"),
        coalesce(sum("ce").over(wDay), lit(0L)).as("mCeBefore"))
      .join(dayCum, "day")
      .select(col("m"),
        (col("dayCsBefore") + col("mCsBefore")).as("csBefore"),
        (col("dayCeBefore") + col("mCeBefore")).as("ceBefore"))

    // --- rank lookups: whole minutes from the prefix, boundary minute raw --
    val probe = s.select(col("entity"), col("seq"),
      col("start_us"), col("end_us"),
      expr(s"start_us DIV ${MinuteUs}L").as("mS"),
      expr(s"end_us DIV ${MinuteUs}L").as("mE"))
    val keyCols = Seq("entity", "seq")
    // #starts ≤ e: prefix below e's minute + starts inside it that are ≤ e.
    val bS = probe.join(starts, probe("mE") === starts("m") &&
        starts("v") <= probe("end_us"))
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("bs"))
    // #ends < s (strict): prefix below s's minute + ends inside it < s.
    val bE = probe.join(ends, probe("mS") === ends("m") &&
        ends("v") < probe("start_us"))
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("be"))
    val ranked = probe
      .join(cum.select(col("m"), col("csBefore")), probe("mE") === col("m"))
      .drop("m")
      .join(cum.select(col("m"), col("ceBefore")), probe("mS") === col("m"))
      .drop("m")
      .join(bS, keyCols, "left")
      .join(bE, keyCols, "left")
      .select(col("entity"), col("seq"), col("start_us"), col("end_us"),
        (col("csBefore") + coalesce(col("bs"), lit(0L)) -
          col("ceBefore") - coalesce(col("be"), lit(0L))).as("n_intersect"))

    // --- contained-gap correction ------------------------------------------
    // Gaps between consecutive same-entity intervals; each spans ≥ gapUs,
    // so only probes at least that long can contain one. Blocked on the
    // gap START's coarse bucket — one bucket per gap, so each (probe, gap)
    // pair matches at most once and needs no dedup.
    val wEnt = Window.partitionBy("entity").orderBy("start_us")
    val gaps = s
      .withColumn("g2", lead("start_us", 1).over(wEnt))
      .filter(col("g2").isNotNull)
      .select(col("end_us").as("g1"), col("g2"))
      .withColumn("gbk", expr(s"g1 DIV ${coarseUs}L"))
    val longProbes = probe
      .filter(col("end_us") - col("start_us") >= gapUs)
      .withColumn("bk", explode(expr(
        s"sequence(start_us DIV ${coarseUs}L, end_us DIV ${coarseUs}L)")))
    val contained = longProbes.join(gaps,
        col("bk") === col("gbk") &&
          col("g1") >= col("start_us") && col("g2") <= col("end_us"))
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("g"))

    // Components' release discipline: the interval frame `s` is cached
    // (read by six stages above) but a lazy return would pin it until
    // GC-driven cleanup — materialize the result (ONE small row per
    // overlapping interval), then release the corpus-scale intermediate
    // deterministically. The returned frame is localCheckpoint-pinned
    // like any Components result; loop-callers unpersist it when done.
    val out = ranked.join(contained, keyCols, "left")
      .select(col("entity"), col("seq"),
        (col("n_intersect") - coalesce(col("g"), lit(0L)) - 1L)
          .as("n_overlap_users"))
      .filter(col("n_overlap_users") >= 1L)
      .localCheckpoint()
    s.unpersist()
    out
  }
}
