package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming idempotent ingest — the Structured Streaming twin of the
  * batch anti-join guard (S5, `graft.codstats.Normalize.newGamesOnly`;
  * reference semantics: `INSERT OR IGNORE` on the (game_id, player_uno_id)
  * primary key, `/root/reference/parser/parse_matches.sh:93,605-617`).
  *
  * `dropDuplicatesWithinWatermark` keeps the FIRST arrival of each key and
  * drops every re-delivery that lands within the watermark horizon — the
  * at-least-once source (a re-polled API page, a replayed file) becomes
  * exactly-once downstream.
  *
  * Scale: one shuffle on the key; state holds one (key → expiry) entry per
  * key and is EVICTED as the watermark passes — bounded by key arrival
  * rate × delay, unlike plain streaming `dropDuplicates`, whose state
  * grows without bound. The horizon is the contract: a re-delivery later
  * than `delay` after the original is re-admitted, so `delay` must cover
  * the source's maximum redelivery lag (for the reference's ingest that is
  * one fetcher cycle).
  */
object StreamDedup {

  /** First arrival per `keys` within the watermark horizon.
    *
    * @param tsCol event-time column the watermark tracks
    * @param delay watermark delay, e.g. "2 hours" — also the dedup horizon
    */
  def firstArrivalOnly(df: DataFrame, tsCol: String, delay: String,
                       keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
