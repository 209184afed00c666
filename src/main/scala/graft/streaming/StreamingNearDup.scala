package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorHandle, TimeMode, TimerValues}

import graft.api.{KStream, Rec}

/** STREAMING near-duplicate detection — "dedup the crawl as it arrives".
  * The live twin of the batch banded-SimHash pairing
  * (`queries/LlmPipeline.simhashBandPairs`): each document's 60-bit
  * SimHash fingerprint splits into 4×15-bit chunks (pigeonhole: any pair
  * within hamming 3 shares a chunk); arriving docs meet prior docs in
  * per-(band, chunk) bucket state and emit `(doc_a, doc_b, hamming)`
  * pairs the moment the second member arrives.
  *
  * State shape (the scale story): one `MapState` ENTRY per admitted
  * bucket member — an insert touches only its own entry, never a
  * per-bucket blob — with at most `maxBucket` entries per bucket plus
  * one counter, and one boolean per emitted pair (stage 2's
  * exactly-once cut, the same role as the batch `.distinct()`).
  *
  * Bucket cut parity: the batch path drops buckets whose FINAL size
  * falls outside 2..maxBucket before pairing. Replayed in one batch the
  * live cut is identical (the processor sees the whole bucket at once).
  * Across batches a bucket that OVERFLOWS maxBucket stops admitting and
  * emits nothing further, but pairs already emitted stand — detection
  * can't be retracted once forwarded, the same at-least-once stance the
  * reference takes between commit points.
  */
object StreamingNearDup {

  private val Bands = 4
  private val ChunkBits = 15

  /** Live banded-SimHash near-dup pairs. `docs`: key = doc id, value =
    * the 60-bit fingerprint (compute it with
    * `DedupFunctions.simhash64(text)` upstream — a pure column map).
    * Emits each qualifying pair exactly once, ordered (doc_a < doc_b),
    * with its exact hamming distance. Two chained stateful stages
    * (bucket pairing, cross-band pair dedup) — requires the RocksDB
    * provider like every ProcessorApi topology. */
  def simhashPairs(docs: KStream[Long, Long], maxBucket: Int = 50,
      maxHamming: Int = 5): Dataset[(Long, Long, Int, Timestamp)] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    implicit val memberEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val pairEnc: Encoder[(Long, Long, Int, Timestamp)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaInt, Encoders.TIMESTAMP)

    // stage 1: explode each fingerprint to its 4 (band, chunk) buckets —
    // a pure 1→4 column map, shuffled once on the compact bucket id
    val df = docs.toDF
    val bands = df
      .select(col(Rec.KeyCol).as("doc_id"), col(Rec.ValueCol).as("h"),
        col(Rec.TsCol).as("ts"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"))
      .select(
        (col("band").cast("long") * (1L << ChunkBits) +
          expr(s"shiftright(h, band * $ChunkBits)")
            .bitwiseAND(lit((1L << ChunkBits) - 1))).as(Rec.KeyCol),
        struct(col("doc_id"), col("h")).as(Rec.ValueCol), col("ts").as(Rec.TsCol))
    val bucketed = new KStream[Long, (Long, Long)](bands)
    val candidates = ProcessorApi.process(bucketed,
      new SimhashBucketProcessor(maxBucket, maxHamming),
      TimeMode.None(), OutputMode.Append)

    // stage 2: a pair within hamming range can share several chunks (and
    // so arrive from several buckets) — emit it exactly once, keyed by
    // the ordered pair (the live `.distinct()`)
    val keyed = new KStream[(Long, Long), Int](candidates
      .select(struct(col("_1"), col("_2")).as(Rec.KeyCol),
        col("_3").as(Rec.ValueCol), col("_4").as(Rec.TsCol)))
    ProcessorApi.process(keyed, new PairOnceProcessor,
      TimeMode.None(), OutputMode.Append, watermark = false)
  }

  /** Live MinHash-LSH candidate pairing — the signature-banding twin of
    * [[simhashPairs]], mirroring the batch `q_dedup_minhash_lsh` shape
    * (reference lineage: the same banded-LSH family; here docs meeting
    * in a per-(band, bandhash) bucket ARE the output, no distance
    * rescore). `sigs`: key = doc id, value = the k-element MinHash
    * signature (compute with `DedupFunctions.minhashSignature`
    * upstream). Each band's hash and index pack into one compact long
    * bucket id (bandhash is 60-bit, band < 8 — no collision across
    * bands), so stage 1 shuffles once on a long key exactly like the
    * SimHash twin; the same once-only stage collapses pairs that meet
    * in several bands (the live `.distinct()`), and the same 2..maxBucket
    * overflow cut voids flooded buckets. */
  def minhashPairs(sigs: KStream[Long, Seq[Long]], bands: Int = 4,
      rowsPerBand: Int = 4, maxBucket: Int = 50): Dataset[(Long, Long, Timestamp)] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    implicit val pairKeyEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val pairEnc: Encoder[(Long, Long, Int, Timestamp)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaInt, Encoders.TIMESTAMP)
    implicit val outEnc: Encoder[(Long, Long, Timestamp)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.TIMESTAMP)

    val bandRows = sigs.toDF
      .select(col(Rec.KeyCol).as("doc_id"), col(Rec.TsCol).as("ts"),
        explode(graft.functions.DedupFunctions.bandKeys(
          col(Rec.ValueCol), bands, rowsPerBand)).as("bk"))
      .select(
        (col("bk.band").cast("long") * lit(1L << 60) + col("bk.bandhash")).as(Rec.KeyCol),
        col("doc_id").as(Rec.ValueCol), col("ts").as(Rec.TsCol))
    val bucketed = new KStream[Long, Long](bandRows)
    val candidates = ProcessorApi.process(bucketed,
      new BucketPairProcessor(maxBucket),
      TimeMode.None(), OutputMode.Append)

    val keyed = new KStream[(Long, Long), Int](candidates
      .select(struct(col("_1"), col("_2")).as(Rec.KeyCol),
        lit(0).as(Rec.ValueCol), col("_3").as(Rec.TsCol)))
    ProcessorApi.process(keyed, new PairOnceProcessor,
      TimeMode.None(), OutputMode.Append, watermark = false)
      .map(p => (p._1, p._2, p._4))
  }
}

/** Stage 1 — per-(band, chunk) bucket store. MapState holds one entry
  * per ADMITTED member (doc_id → fingerprint, ≤ maxBucket entries);
  * ValueState counts every arrival so an overflowed bucket stays dead
  * (the batch twin drops >maxBucket buckets entirely). Emits candidate
  * pairs (a, b, hamming) with a < b, already hamming-filtered. */
private final class SimhashBucketProcessor(maxBucket: Int, maxHamming: Int)
    extends ProcessorApi.Processor[Long, (Long, Long), (Long, Long, Int, Timestamp)] {
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, ValueState}

  @transient private var members: MapState[Long, Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(handle: StatefulProcessorHandle): Unit = {
    members = handle.getMapState[Long, Long]("members",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seen = handle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def process(bucket: Long,
      rows: Iterator[((Long, Long), Timestamp)],
      handle: StatefulProcessorHandle,
      timers: TimerValues): Iterator[(Long, Long, Int, Timestamp)] = {
    // id-sorted for a deterministic emission set at equal timestamps
    val arrivals = rows.toSeq.sortBy(_._1._1)
    val prior = if (seen.exists()) seen.get() else 0L
    val total = prior + arrivals.size
    seen.update(total)
    if (total > maxBucket) {
      // overflow: the batch twin voids this bucket — stop admitting and
      // emitting; reclaim the member entries (the counter keeps it dead)
      members.clear()
      return Iterator.empty
    }
    val out = Seq.newBuilder[(Long, Long, Int, Timestamp)]
    arrivals.foreach { case ((id, h), ts) =>
      members.iterator().foreach { case (oid, oh) =>
        if (oid != id) {
          val ham = java.lang.Long.bitCount(h ^ oh)
          if (ham <= maxHamming)
            out += (if (id < oid) (id, oid, ham, ts) else (oid, id, ham, ts))
        }
      }
      members.updateValue(id, h)
    }
    out.result().iterator
  }
}

/** Stage 1 (MinHash variant) — per-(band, bandhash) bucket store. Same
  * MapState-entry-per-member shape and overflow cut as
  * [[SimhashBucketProcessor]], but membership alone qualifies a pair
  * (candidates are the output in banded MinHash-LSH — no rescore).
  * Emits (a, b, ts) with a < b. */
private final class BucketPairProcessor(maxBucket: Int)
    extends ProcessorApi.Processor[Long, Long, (Long, Long, Timestamp)] {
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, ValueState}

  @transient private var members: MapState[Long, Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(handle: StatefulProcessorHandle): Unit = {
    members = handle.getMapState[Long, Long]("members",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    seen = handle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def process(bucket: Long,
      rows: Iterator[(Long, Timestamp)],
      handle: StatefulProcessorHandle,
      timers: TimerValues): Iterator[(Long, Long, Timestamp)] = {
    val arrivals = rows.toSeq.sortBy(_._1)
    val prior = if (seen.exists()) seen.get() else 0L
    val total = prior + arrivals.size
    seen.update(total)
    if (total > maxBucket) {
      members.clear()
      return Iterator.empty
    }
    val out = Seq.newBuilder[(Long, Long, Timestamp)]
    arrivals.foreach { case (id, ts) =>
      members.iterator().foreach { case (oid, _) =>
        if (oid != id)
          out += (if (id < oid) (id, oid, ts) else (oid, id, ts))
      }
      members.updateValue(id, 0L)
    }
    out.result().iterator
  }
}

/** Stage 2 — emit each ordered pair once across bands AND batches. */
private final class PairOnceProcessor
    extends ProcessorApi.Processor[(Long, Long), Int, (Long, Long, Int, Timestamp)] {
  import org.apache.spark.sql.streaming.{TTLConfig, ValueState}

  @transient private var emitted: ValueState[Boolean] = _

  override def init(handle: StatefulProcessorHandle): Unit =
    emitted = handle.getValueState[Boolean]("emitted",
      Encoders.scalaBoolean, TTLConfig.NONE)

  override def process(pair: (Long, Long),
      rows: Iterator[(Int, Timestamp)],
      handle: StatefulProcessorHandle,
      timers: TimerValues): Iterator[(Long, Long, Int, Timestamp)] = {
    val first = rows.next() // at least one row or the group wouldn't fire
    if (emitted.exists()) Iterator.empty
    else {
      emitted.update(true)
      Iterator.single((pair._1, pair._2, first._1, first._2))
    }
  }
}
