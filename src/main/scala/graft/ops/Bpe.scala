package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding trainer — the loop q70 (pair counting)
  * and q77 (one merge round) are single steps of, generalized to N
  * merges: the tokenizer-training artifact (an ordered merge table) a
  * data pipeline actually ships.
  *
  * Representation: the vocab is a DataFrame of (syms ARRAY<STRING>, wf
  * BIGINT) — each distinct corpus word as its current symbol sequence
  * (initially single characters) with its corpus frequency. All
  * per-round work is VOCAB-sized, not corpus-sized: the corpus is read
  * once to build word frequencies; each round is one map-side pair
  * explode + a map-side-combinable count + a global top-1
  * (TakeOrderedAndProject) + a per-row fold applying the merge. The only
  * driver-side data per round is the single winning pair — the same
  * dimension-sized collect discipline as the scalar-cut queries.
  *
  * Merge semantics match q77 exactly: greedy left-to-right
  * non-overlapping ('aaa' under merge (a,a) → [aa]a, never a[aa]),
  * implemented as a sequential `aggregate` fold over the symbol array
  * (the cross-engine-safe fold pattern). Ties in the argmax break on
  * (count DESC, left symbol, right symbol) — plain string order on the
  * RECONSTRUCTED symbols, so any oracle twin must tie-break on
  * reconstructed symbols too, not on placeholder encodings. No
  * end-of-word marker, consistent with q70/q77 (documented divergence
  * from Sennrich et al.'s `</w>`).
  */
object Bpe {

  /** One learned merge: at round `rank`, symbols `left`+`right` (the
    * adjacent pair with corpus-weighted count `freq`) fused. */
  case class Merge(rank: Int, left: String, right: String, freq: Long)

  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Distinct corpus words as initial (character) symbol sequences with
    * corpus frequencies. One corpus scan, one vocab-sized shuffle. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(TextOps.tokensExpr(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .select(expr("split(word, '')").as("syms"), col("wf"))

  /** Corpus-weighted adjacent-pair counts of the current vocab
    * (overlapping occurrences count, the classic get_stats). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("wf"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> named_struct('left', element_at(syms, i),
          |                    'right', element_at(syms, i + 1)))""".stripMargin))
        .as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("wf")).as("n"))

  /** The round's winning pair, or None when no pairs remain. */
  def topPair(vocab: DataFrame): Option[(String, String, Long)] =
    pairCounts(vocab)
      .orderBy(desc("n"), col("left"), col("right")).limit(1)
      .collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** The greedy left-to-right non-overlapping merge of (left, right) as
    * an expression over a symbol-array column — [[applyMerge]]'s fold,
    * reusable where extra columns must survive the projection (the q104
    * corpus encoder keeps the word string alongside). */
  def applyMergeExpr(symsCol: String, left: String, right: String): String = {
    val a = sqlLit(left); val b = sqlLit(right); val m = sqlLit(left + right)
    s"""aggregate(sequence(1, size($symsCol)),
       |  named_struct('acc', CAST(array() AS ARRAY<STRING>), 'skip', false),
       |  (st, i) -> CASE
       |    WHEN st.skip THEN named_struct('acc', st.acc, 'skip', false)
       |    WHEN i < size($symsCol) AND element_at($symsCol, i) = $a
       |         AND element_at($symsCol, i + 1) = $b
       |      THEN named_struct('acc', concat(st.acc, array($m)), 'skip', true)
       |    ELSE named_struct('acc', concat(st.acc, array(element_at($symsCol, i))),
       |                      'skip', false)
       |  END,
       |  st -> st.acc)""".stripMargin
  }

  /** Fuse every greedy left-to-right non-overlapping (left, right)
    * adjacency into one symbol. Per-row fold, no shuffle. */
  def applyMerge(vocab: DataFrame, left: String, right: String): DataFrame =
    vocab.select(expr(applyMergeExpr("syms", left, right)).as("syms"), col("wf"))

  /** Train `nMerges` rounds over `docs(textCol)`; returns the ordered
    * merge table. Stops early when the vocab runs out of pairs. Each
    * round re-caches the vocab and releases the previous one after the
    * new round materializes; very deep trainings (1000s of merges)
    * should additionally localCheckpoint periodically to bound plan
    * depth — the cadence below does so every 32 rounds. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var v = vocab(docs, textCol).cache()
    // try/finally like LinearTrain.train: an action throwing mid-loop
    // (executor loss, a bad merge) must not leave the current vocab
    // cache pinned for the rest of the session
    try {
      var r = 1
      var exhausted = false
      while (r <= nMerges && !exhausted) {
        topPair(v) match {
          case Some((l, rt, n)) =>
            merges += Merge(r, l, rt, n)
            var nv = applyMerge(v, l, rt)
            if (r % 32 == 0) nv = nv.localCheckpoint(false)
            nv = nv.cache()
            nv.count() // materialize before releasing the parent cache
            v.unpersist()
            v = nv
          case None => exhausted = true
        }
        r += 1
      }
    } finally v.unpersist()
    merges.toSeq
  }
}
