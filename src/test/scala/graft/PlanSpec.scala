package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Physical-plan assertions: the scale-critical plan properties claimed in
  * the operator Scaladoc must actually hold — dims broadcast, scans prune
  * to the referenced columns, global top-k compiles to
  * TakeOrderedAndProject (per-partition heaps, no full sort), window
  * dedup uses the rank-limit pushdown. Runs on sf0.001 (plan shape is
  * scale-independent). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(SimpleMode)
  }

  test("q03 star join broadcasts the dimension sides") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q01 scan prunes to the five referenced lineitem columns") {
    val p = plan("q01_pricing_summary")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_quantity") && read.contains("l_returnflag"))
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"))
  }

  test("q02 global top-k is TakeOrderedAndProject, not a full sort") {
    assert(plan("q02_topk_customers").contains("TakeOrderedAndProject"))
  }

  test("q10 per-group top-1 uses the window-group-limit pushdown") {
    assert(plan("q10_latest_per_user").contains("WindowGroupLimit"))
  }

  test("q15 anti join and q16 semi join plan as such") {
    assert(plan("q15_anti_join").contains("LeftAnti"))
    assert(plan("q16_semi_join").contains("LeftSemi"))
  }

  test("q01 aggregates partially before the exchange (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"))
  }

  test("q31 broadcasts the query-vector side") {
    assert(plan("q31_cosine_topk").contains("BroadcastNestedLoopJoin") ||
           plan("q31_cosine_topk").contains("BroadcastHashJoin"))
  }

  test("q50 quantile bucketing: no corpus-sized window, one corpus scan") {
    val df = SparkEntry.queries("q50_quantile_buckets")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // r15: the cut points replay percentile_disc off the distinct-price
    // histogram — windows are allowed but only ABOVE the histogram
    // aggregate (grid-sized input), never over the raw orders scan; and
    // the non-codegen ObjectHashAggregate percentile buffer is gone.
    assert(!p.contains("ObjectHashAggregate"),
      "cut points must come from the histogram, not a percentile buffer")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "cut points must broadcast")
    val opt = df.queryExecution.optimizedPlan
    val windowsOverScan = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.child.collect {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty => w
    }
    assert(windowsOverScan.isEmpty,
      "every window must sit above the histogram aggregate")
  }

  test("q33 tokenizes each row exactly once (single split in the plan)") {
    val df = SparkEntry.queries("q33_lang_id")(spark, dir)
    val p = df.queryExecution.optimizedPlan.toString
    assert("split\\(".r.findAllIn(p).length == 1)
  }

  test("q52 bucketed near-dup candidates come from equi-joins, never all-pairs") {
    val p = plan("q52_embedding_neardup_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the bucketed path must not enumerate all pairs")
  }

  test("q199 adaptive-plane near-dup stays equi-join at the derived " +
      "plane count, never all-pairs") {
    val p = plan("q199_adaptive_lsh_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the adaptive bucketed path must not enumerate all pairs")
  }

  test("q210 cycle detection joins stay equi-keyed on the pinned matrix") {
    val p = plan("q210_pref_cycles")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the k³ triple join must stay an equi-join over the k²-row edge set")
  }

  test("q209 publishes a driver-computed dimension-sized result") {
    // the MM loop runs on the collected k²-matrix; the published frame
    // must be a LocalTableScan — any parquet scan downstream of the
    // collect would mean the corpus is re-read to shape the output
    val p = plan("q209_bradley_terry")
    assert(p.contains("LocalTableScan") && !p.contains("Scan parquet"))
  }

  test("q29 candidate join keys on the content-derived prefix hash, not length bands") {
    val p = plan("q29_ngram_jaccard")
    assert(p.contains("pk"), "join key must include the prefix-hash content component")
    assert(!p.contains("blk"), "length-band-only blocking key must be gone")
  }

  test("q55 stratified sample uses the window-group-limit pushdown") {
    assert(plan("q55_stratified_sample").contains("WindowGroupLimit"))
  }

  test("q54 simhash pairing joins on band keys, never all-pairs") {
    val p = plan("q54_simhash_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q61 frequent-token prune is a broadcast join (corpus never reshuffles to filter)") {
    // r15: the prune is a broadcast LEFT join + null-conditional aggregate
    // (one doc-keyed pass computes n_toks, n_kept and the reassembly) —
    // the former anti-join shape needed a separate kept-rows aggregate
    // plus a third corpus tokenize for n_toks. The invariant under test
    // is unchanged: the frequent-token list broadcasts; the corpus side
    // never pays a tok-keyed exchange to be filtered.
    val p = plan("q61_boilerplate_prune")
    assert(p.contains("BroadcastHashJoin [tok"),
      "the prune must join the corpus tokens against a BROADCAST " +
        "frequent-token list (the corpus side never exchanges on tok; " +
        "the tok-keyed exchanges in the plan belong to the vocabulary-" +
        "sized df aggregate that builds the list)")
    assert(p.contains("LeftOuter, BuildRight"),
      "the broadcast side must be the frequent-token list")
  }

  test("q62 retrieval ranks per term via the window-group-limit pushdown") {
    val p = plan("q62_inverted_index_topk")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastHashJoin"), "the per-term df side must broadcast")
  }

  test("q64 semantic dedup pairs only within cells (one cell-keyed " +
      "shuffle, never an all-pairs product)") {
    val p = plan("q64_semantic_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must never enumerate cross-cell pairs")
    assert(p.contains("MapGroups"),
      "the within-cell EXISTS marking runs in the per-cell kernel")
  }

  test("q59 repetition stats are one per-row native eval — no aggregate, " +
      "no join, no window before the presentation sort") {
    val p = plan("q59_repetition_stats")
    assert(p.contains("graft_rep_stats"), "the fused native eval must be in the plan")
    assert(!p.contains("HashAggregate") && !p.contains("Join") &&
      !p.contains("Window"),
      "the explode + (doc, bigram) count + per-doc max shape is gone — the " +
        "only exchange left is the ORDER BY range partitioning")
  }

  test("q72 interval overlap is the pair-free sweep — equi-joins only, never all-pairs") {
    val p = plan("q72_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rank lookups and the gap join must stay bucket-keyed equi-joins")
  }
}
