package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for driver-side values that are pure functions of
  * (data directory contents, config) — the shared implementation behind
  * the co-purchase cut ([[graft.QueriesGraph]]), the trained-classifier
  * states ([[LinearTrain.cachedStates]]), and the k-means centroid memo
  * ([[graft.QueriesSimilarity]]).
  *
  * Policy (one place, uniformly applied):
  *
  *  - **Keyed by the data, not the path**: every lookup folds
  *    [[DirFingerprint]] of `dir` in, so an in-session re-ingest at the
  *    same path rebuilds instead of serving stale state.
  *  - **Replace, don't accumulate**: ONE slot per (dir, config); a
  *    fingerprint change overwrites the superseded value in place, so a
  *    long-lived session with repeated ingest holds exactly one
  *    dimension-sized value per slot — never an unbounded key history.
  *  - **Build-once under concurrency**: the build runs under the slot's
  *    monitor, so two racing first lookups of the same slot run the
  *    corpus-scale build once (TrieMap.getOrElseUpdate — the previous
  *    implementation — could run it twice). Distinct slots build in
  *    parallel.
  *  - **Listing failure is never cacheable**: an `unlistable:*`
  *    fingerprint (transient FS error in [[DirFingerprint]]) bypasses
  *    the cache entirely — build fresh, leave the slot untouched. Two
  *    failed listings bracketing a data change can therefore never
  *    share a key and serve stale state.
  *  - **Weakly keyed by session** so a closed session's values are
  *    collectable.
  */
final class FingerprintedMemo[V] {

  private final class Slot {
    var fp: String = null
    var value: V = null.asInstanceOf[V]
  }

  private val bySession = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, Slot]]()

  /** The memoized value for (`dir` contents, `cfg`), building via
    * `build` on first lookup or whenever the directory fingerprint
    * changed. */
  def apply(s: SparkSession, dir: String, cfg: String = "")(build: => V): V = {
    val slots = bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Slot]()
        bySession.put(s, m)
      }
      m
    }
    val fp = DirFingerprint.of(s, dir)
    if (fp.startsWith("unlistable")) return build
    val slot = slots.computeIfAbsent(s"$dir|$cfg", _ => new Slot)
    slot.synchronized {
      if (slot.fp != fp) {
        slot.value = build
        slot.fp = fp
      }
      slot.value
    }
  }
}
