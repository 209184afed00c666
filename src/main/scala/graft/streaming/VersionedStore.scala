package graft.streaming

import org.apache.spark.sql.streaming.ListState

/** Kafka 3.5's `VersionedKeyValueStore` (KIP-889 — the custom-stores
  * ladder two rungs past the reference's 2.2 `Stores.java`, same lineage
  * as our KIP-213/KIP-150 parity-plus): per-key timestamped version
  * history with as-of reads, backed by a named `ListState` of
  * (validFrom, value) pairs inside a [[ProcessorApi.Processor]].
  *
  * Reference semantics mirrored:
  *   - `put(ts, v)` inserts a version valid from `ts` (out-of-order puts
  *     land in timestamp position, exactly the reference's behavior);
  *   - `get()` returns the latest version, `get(asOf)` the newest version
  *     with `validFrom <= asOf` (a read before the first version is
  *     empty);
  *   - history older than `historyRetention` before the NEWEST version
  *     is dropped on write — except the one version straddling the
  *     horizon, which stays readable for as-of queries at the horizon
  *     (the reference keeps it in the latest-value store).
  *
  * Timestamps are opaque longs — pass milliseconds or microseconds
  * consistently; `historyRetention` is in the same unit. State size per
  * key = versions inside the retention window — the same bound the
  * reference's segmented version store enforces.
  */
final class VersionedStore[V](state: ListState[(Long, V)], historyRetention: Long)
    extends Serializable {

  // ascending-by-validFrom at all times: put() maintains it with a binary
  // insert, so reads can rely on it too
  private def versions: IndexedSeq[(Long, V)] = state.get().toIndexedSeq

  /** Insert a version valid from `ts` — a put at an existing timestamp
    * REPLACES that version (KIP-889 single-writer-per-instant semantics);
    * enforce history retention. Binary insert into the already-sorted
    * list (O(log V) search + one copy) — a full re-sort per put would be
    * O(V log V) on every hot-key update. */
  def put(ts: Long, value: V): Unit = {
    val v = versions
    // first index with validFrom >= ts
    var lo = 0
    var hi = v.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid)._1 < ts) lo = mid + 1 else hi = mid
    }
    val replaced = lo < v.length && v(lo)._1 == ts
    val all = new scala.collection.mutable.ArrayBuffer[(Long, V)](v.length + 1)
    all ++= v.view.slice(0, lo)
    all += ((ts, value))
    all ++= v.view.slice(if (replaced) lo + 1 else lo, v.length)
    // saturating horizon: retention near Long.MaxValue means "unbounded",
    // not an underflow that silently drops every version
    val newest = all.last._1
    val horizon =
      try math.subtractExact(newest, historyRetention)
      catch { case _: ArithmeticException => Long.MinValue }
    // drop versions strictly older than the horizon, except the single
    // version straddling it (stays readable for as-of at the horizon)
    var cut = 0
    while (cut < all.length && all(cut)._1 < horizon) cut += 1
    val kept = if (cut > 1) all.slice(cut - 1, all.length) else all
    state.put(kept.toArray)
  }

  /** Latest version: (validFrom, value) — the list is sorted, so it's
    * the last element. */
  def getLatest: Option[(Long, V)] = versions.lastOption

  /** As-of read: newest version with validFrom <= asOf (binary search on
    * the sorted list). */
  def get(asOf: Long): Option[(Long, V)] = {
    val v = versions
    var lo = 0
    var hi = v.length
    while (lo < hi) { // first index with validFrom > asOf
      val mid = (lo + hi) >>> 1
      if (v(mid)._1 <= asOf) lo = mid + 1 else hi = mid
    }
    if (lo == 0) None else Some(v(lo - 1))
  }

  /** Tombstone the key entirely. */
  def delete(): Unit = state.clear()

  /** Number of retained versions (spec/diagnostics). */
  def size: Int = versions.size
}
