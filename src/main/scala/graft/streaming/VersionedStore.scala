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

  private def versions: IndexedSeq[(Long, V)] = state.get().toIndexedSeq

  /** Insert a version valid from `ts` — a put at an existing timestamp
    * REPLACES that version (KIP-889 single-writer-per-instant semantics);
    * enforce history retention. */
  def put(ts: Long, value: V): Unit = {
    val all = (versions.filterNot(_._1 == ts) :+ ((ts, value))).sortBy(_._1)
    val horizon = all.last._1 - historyRetention
    val (older, recent) = all.partition(_._1 < horizon)
    val kept = older.lastOption.toIndexedSeq ++ recent
    state.put(kept.toArray)
  }

  /** Latest version: (validFrom, value). */
  def getLatest: Option[(Long, V)] = {
    val v = versions
    if (v.isEmpty) None else Some(v.maxBy(_._1))
  }

  /** As-of read: newest version with validFrom <= asOf. */
  def get(asOf: Long): Option[(Long, V)] = {
    val eligible = versions.filter(_._1 <= asOf)
    if (eligible.isEmpty) None else Some(eligible.maxBy(_._1))
  }

  /** Tombstone the key entirely. */
  def delete(): Unit = state.clear()

  /** Number of retained versions (spec/diagnostics). */
  def size: Int = versions.size
}
