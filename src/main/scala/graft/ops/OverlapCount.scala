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
  *    then ONE minute-keyed equi-join resolving both the whole-minute
  *    prefix and the sub-bucket remainder (below). No window ever sees
  *    more than a day of buckets except the day-level prefix
  *    (calendar-sized).
  *  - contained-gap count: a gap spans ≥ gapUs by construction, so only
  *    probes of duration ≥ gapUs can contain one — the containment join
  *    runs long-probes × gaps, blocked on the gap-start's coarse bucket
  *    (each gap has ONE such bucket, so no post-join dedup).
  *
  * Execution shape (r15): every per-probe term is a WEIGHTED ROW in one
  * union, reduced by a single (entity, seq)-keyed aggregate — the q213
  * union-fusion discipline applied to the sweep:
  *
  *  - each probe melts into two lookup rows sharing one strict-< form:
  *    kind E at the end's minute with threshold end+1 (counts starts ≤ e),
  *    kind S at the start's minute with threshold start (counts ends < s);
  *  - the right side is the boundary-point multiset (weight ±1) unioned
  *    with the per-minute prefix rows (weight ±prefix, sentinel value
  *    −∞ so they match every probe of their minute and kind);
  *  - ONE (key, kind)-keyed equi-join emits EVERY contribution (r16):
  *    rank lookups under kinds 0/1 (key = boundary minute, residual
  *    v < thresh) and the gap containment under kind 2 (key = the gap
  *    start's coarse bucket, residual g1 ≥ s ∧ g2 ≤ e, weight −1) — the
  *    kind tag keeps the two key domains disjoint, so the match multiset
  *    is exactly the union of the two former joins; sum(w) − 1 per
  *    (entity, seq) is the published count.
  *
  * vs the r8 shape (two rank joins + two boundary joins + one gap join,
  * each with its own (entity, seq) aggregate/left-join) this removes the
  * three per-term aggregates, the two final left-joins, and (r16) the
  * separate gap-join wave — at sf0.1 the plan loses ~8 exchanges and the
  * result needs no localCheckpoint fence, because nothing re-reads it
  * inside the query.
  *
  * At 100 TB: shuffles are keyed on entity (sessionize), minute bucket
  * (histogram + the fused rank join), and coarse bucket (gap join) — all
  * near-uniform; the day-level prefix window is calendar-sized. No stage
  * is proportional to overlap-pair volume.
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
    *         the pair-join encoding which never emits overlap-free rows).
    *         Lazy; holds a cached intermediate (the interval frame, read by
    *         four branches) that session hygiene (clearCache between
    *         queries, as Bench/Verify do) releases.
    */
  def distinctOverlaps(sess: DataFrame, gapUs: Long,
                       coarseUs: Long): DataFrame = {
    val s = sess.select(col("entity"), col("seq"),
      col("start_us"), col("end_us")).cache()

    // --- boundary-point multiset: one explode pass over the intervals -----
    // kind 1 = a start, kind 0 = an end; reused by the histogram AND as
    // the raw (±1) side of the fused rank join.
    val pts = s.select(explode(array(
        struct(expr(s"start_us DIV ${MinuteUs}L").as("m"),
          col("start_us").as("v"), lit(1).as("kind")),
        struct(expr(s"end_us DIV ${MinuteUs}L").as("m"),
          col("end_us").as("v"), lit(0).as("kind")))).as("p"))
      .select(col("p.m").as("m"), col("p.v").as("v"), col("p.kind").as("kind"))

    // --- minute-bucketed cumulative histogram of starts and ends ----------
    // Key set = every minute holding a start or an end (one aggregate —
    // the union IS the key set), so each probe's boundary minute is
    // present and the rank lookup is a plain equi-join.
    val hist = pts.groupBy("m")
      .agg(sum(when(col("kind") === 1, 1L).otherwise(0L)).as("cs"),
        sum(when(col("kind") === 0, 1L).otherwise(0L)).as("ce"))
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

    // --- fused rank lookup: both terms of both bounds in ONE join ---------
    // Each probe melts into two rows sharing the strict-< form:
    //   kind 1 (starts ≤ e):  minute = end's, threshold = end_us + 1
    //   kind 0 (ends  < s):   minute = start's, threshold = start_us
    val probe2 = s.select(col("entity"), col("seq"), explode(array(
        struct(expr(s"end_us DIV ${MinuteUs}L").as("bm"),
          (col("end_us") + 1L).as("thresh"), lit(1).as("kind")),
        struct(expr(s"start_us DIV ${MinuteUs}L").as("bm"),
          col("start_us").as("thresh"), lit(0).as("kind")))).as("p"))
      .select(col("entity"), col("seq"), col("p.bm").as("bm"),
        col("p.thresh").as("thresh"), col("p.kind").as("kind"))
    // Right side: raw boundary points weigh ±1 under the threshold test;
    // prefix rows weigh ±prefix with a −∞ sentinel value (always under).
    // Signs: starts count toward the intersect total, ends subtract.
    val rights = pts.select(col("m"), col("v"),
        when(col("kind") === 1, lit(1L)).otherwise(lit(-1L)).as("w"),
        col("kind"))
      .unionAll(cum.select(col("m"), lit(Long.MinValue).as("v"),
        col("csBefore").as("w"), lit(1).as("kind")))
      .unionAll(cum.select(col("m"), lit(Long.MinValue).as("v"),
        (-col("ceBefore")).as("w"), lit(0).as("kind")))
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
    val longProbes = s
      .filter(col("end_us") - col("start_us") >= gapUs)
      .withColumn("bk", explode(expr(
        s"sequence(start_us DIV ${coarseUs}L, end_us DIV ${coarseUs}L)")))

    // --- ONE fused (key, kind) equi-join for rank AND gap terms (r16) -----
    // The gap join's coarse-bucket key rides the same join as the rank
    // lookups: gap rows enter the right side under kind 2 (key = the gap
    // start's coarse bucket, v = gap start, g2 = gap end, w = −1), gap
    // probes enter the left side under kind 2 (key = each coarse bucket
    // the probe spans), and the per-kind residual picks the original
    // predicate (v < thresh for the rank kinds, containment for kind 2).
    // Kind keeps the key domains disjoint (minutes vs coarse buckets never
    // meet), so the match multiset is EXACTLY the union of the two former
    // joins — one join wave and one exchange pair instead of two
    // (guide §2.4; OverlapCountSpec's brute-force fleet pins equality).
    val probeAll = probe2
      .select(col("entity"), col("seq"), col("bm").as("k"), col("kind"),
        col("thresh"), lit(null).cast("long").as("ps"),
        lit(null).cast("long").as("pe"))
      .unionAll(longProbes.select(col("entity"), col("seq"),
        col("bk").as("k"), lit(2).as("kind"),
        lit(null).cast("long").as("thresh"),
        col("start_us").as("ps"), col("end_us").as("pe")))
    val rightAll = rights
      .select(col("m").as("rk"), col("kind").as("rkind"), col("v"),
        lit(null).cast("long").as("g2"), col("w"))
      .unionAll(gaps.select(col("gbk").as("rk"), lit(2).as("rkind"),
        col("g1").as("v"), col("g2"), lit(-1L).as("w")))
    val terms = probeAll.join(rightAll,
        col("k") === col("rk") && col("kind") === col("rkind") &&
          ((col("rkind") === 2 && col("v") >= col("ps") &&
            col("g2") <= col("pe")) ||
           (col("rkind") =!= 2 && col("v") < col("thresh"))))
      .select(col("entity"), col("seq"), col("w"))

    // --- single reduce: every probe appears (its prefix rows always match
    // — the minute key set covers every boundary minute), so the −1 self
    // term applies exactly once per probe.
    terms
      .groupBy(col("entity"), col("seq"))
      .agg((sum(col("w")) - 1L).as("n_overlap_users"))
      .filter(col("n_overlap_users") >= 1L)
  }
}
