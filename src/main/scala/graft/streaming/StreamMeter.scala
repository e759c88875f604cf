package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingest telemetry: per-(source, event-time window) document
  * and token throughput over a document stream — the operational meter a
  * training-data ingest runs next to the pipeline (is a source stalled?
  * did a crawler start flooding? are we on budget for the day's tokens?).
  *
  * Watermarked tumbling windows in APPEND mode: a window emits exactly
  * once, when the watermark passes its end, so every downstream row is a
  * FINALIZED rate — the numbers a dashboard can alert on without
  * revision. Late documents beyond the watermark are dropped from their
  * window (and counted nowhere), which is the metering contract: the
  * meter reports what the pipeline admitted, and the pipeline itself
  * gates admission with the same watermark.
  *
  * Scale: the aggregation is a keyed streaming HashAggregate — partial
  * per-task state, one shuffle on (window, source); state size is
  * windows-in-flight × sources, independent of document volume. Token
  * counting is the same per-row codegen expression the batch path uses
  * (`size(split(...))`) — no UDF, no collect.
  */
object StreamMeter {

  /** @param sourceCol grouping column naming the ingest source
    * @param tokensOf  per-row token-count expression over the text column
    *                  (defaults to the whitespace-CLASS word count —
    *                  the same contract as CurationPipeline's release
    *                  stages, so the meter's n_toks agrees with the
    *                  pipeline's token budget on multi-line and
    *                  multi-space text instead of fusing '\n'-joined
    *                  words or counting empty tokens) */
  def tokenRates(docs: DataFrame, tsCol: String, windowDur: String,
                 delay: String, sourceCol: String = "source",
                 tokensOf: Column =
                   expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"))
      : DataFrame =
    docs.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensOf).as("n_toks"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"), col("n_docs"), col("n_toks"))
}
