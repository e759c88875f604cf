package graft.ops

import org.apache.spark.sql.Dataset

/** Batched model-inference plumbing — the quality-classifier scoring step
  * of a curation pipeline (fastText/ONNX-style scorer over document text)
  * expressed as partition-batched iteration: partition iterator → fixed
  * `batchSize` groups → one model call per batch → flat scored rows.
  *
  * The batching is the point, same discipline as [[Multimodal]]'s decode:
  * real models amortize session init per PARTITION and vectorize per
  * BATCH, so the operator hands the model `Seq[String]` slices rather
  * than one row at a time, and never materializes more than one batch per
  * task. No shuffle — scoring is map-side; scale = corpus partitions ×
  * (batch at a time) memory.
  *
  * [[stubModel]] is the deterministic stand-in (this container ships no
  * inference runtime): a type-token-ratio linear scorer whose arithmetic
  * is SQL-expressible, so the DuckDB oracle can verify the WHOLE plumbing
  * path — batch slicing must not reorder, drop, or duplicate rows.
  */
object Inference {

  case class DocIn(doc_id: Long, text: String)
  case class DocScore(doc_id: Long, score: Double)

  /** Deterministic stub scorer: 2·distinct-tokens / tokens (integer
    * counts, one IEEE division — the [[graft.Exact]] discipline). A real
    * deployment replaces this with a per-partition model session.
    *
    * split with limit -1 KEEPS trailing empty tokens — the semantics of
    * Spark's `split` and DuckDB's `string_split` (default Java split drops
    * them, which would silently diverge from the SQL twins on text with a
    * trailing space, and make "  " score NaN via 0/0). */
  val stubModel: Seq[String] => Seq[Double] = texts =>
    texts.map { t =>
      val toks = t.split(" ", -1)
      (2.0 * toks.distinct.length) / toks.length
    }

  def scoreBatched(ds: Dataset[DocIn], batchSize: Int,
                   model: Seq[String] => Seq[Double]): Dataset[DocScore] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = model(batch.map(_.text))
        require(scores.length == batch.length,
          s"model returned ${scores.length} scores for a ${batch.length}-row batch")
        batch.iterator.zip(scores.iterator)
          .map { case (d, s0) => DocScore(d.doc_id, s0) }
      }
    }
  }
}
