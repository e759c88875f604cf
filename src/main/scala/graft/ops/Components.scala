package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterative min-label
  * propagation — the transitive-closure step near-dup survivor selection
  * needs (a chain a~b~c is ONE duplicate group, so exactly one of the
  * three survives; the one-hop greedy rule would keep both ends).
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; at fixpoint the label IS min(id) of the component. Rounds
  * needed = graph diameter, which for near-dup clusters is small (dup
  * groups are dense); the loop stops as soon as a round changes nothing.
  *
  * At 100 TB: every round is one equi-join (edges ⨝ labels on src) plus
  * one min-aggregate — all shuffles on the node id, so a co-partitioned
  * edge list reuses the exchange. `localCheckpoint` truncates the plan
  * lineage each round (an iterative loop otherwise compounds the DAG);
  * production would use reliable `checkpoint` to survive executor loss,
  * and the alternating large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public) to
  * collapse high-diameter graphs in O(log²) rounds.
  */
object Components {

  /** (id, component) for every node in `pairs`, where component = the
    * minimum id reachable via any chain of pairs. */
  def minLabel(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint() // computed once, scanned every round
    // both endpoints appear as src (edges are symmetric) → src covers all nodes
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val msgs = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("component"))
      // pinned BEFORE the self-join below — both join inputs read hop,
      // and an unpinned hop re-runs the edges-join + min-aggregate
      // (the round's expensive work) once per branch
      val hop = labels.select(col("id"), col("component")).union(msgs)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      // POINTER JUMP: also adopt the label OF the label (L(L(v))) — the
      // shortcutting step that collapses label chains geometrically, so
      // rounds scale with log(diameter), not diameter. Plain one-hop
      // propagation needs diameter rounds, and the sf1 sweep produced a
      // percolated eps-graph whose giant component blew past 50; L(v)
      // is always a reachable node's id, so min with L(L(v)) preserves
      // the fixpoint (= component min) exactly.
      val next = hop.join(
          hop.select(col("id").as("component"), col("component").as("jump")),
          Seq("component"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("jump"), col("component")))
            .as("component"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("component").as("prev")), "id")
        .filter(col("component") < col("prev")).count()
      // release the superseded round's checkpoints NOW — otherwise up
      // to maxIter full label-table copies stay pinned in block storage
      // until nondeterministic ContextCleaner GC
      hop.unpersist()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    require(changed == 0, s"components did not converge in $maxIter rounds")
    labels
  }
}
