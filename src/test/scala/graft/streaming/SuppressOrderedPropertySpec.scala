package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Randomized model-equivalence pin for the r12 sorted-buffer rewrite of
  * [[StatefulOps.suppressUntilTimeLimitOrdered]] (the treatment
  * intervalJoinEager got in r11): the operator's emissions over random
  * multi-batch replays must equal a naive reference fold — linear
  * `indexWhere` scans for both the re-put slot and the insertion point,
  * exactly the pre-r12 implementation — record for record, including the
  * non-resetting put, the serialized-key-bytes tie-break at equal buffer
  * times, time-limit eviction and the oldest-first overflow policy
  * (reference `InMemoryTimeOrderedKeyValueBuffer` via `BufferKey
  * .compareTo`, suppress buffer semantics per KIP-328). */
class SuppressOrderedPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val delayMs = 500L
  private val maxRecords = 4L
  private val numBuffers = 2

  /** The naive reference: one (time, keyBytes)-ordered Vector per buffer
    * maintained with full linear scans, folding each batch's rows per
    * buffer in record-ts order — the operator's contract minus every
    * data-structure optimization. */
  private def model(batches: Seq[Seq[(String, String, Long)]])
      : Seq[(String, String)] = {
    val bufs = Array.fill(numBuffers)(
      Vector.empty[(Long, Array[Byte], String, String)])
    val st = Array.fill(numBuffers)(Long.MinValue)
    val out = Seq.newBuilder[(String, String)]
    for (batch <- batches; bid <- 0 until numBuffers) {
      val rows = batch
        .filter(r => math.floorMod(r._1.hashCode, numBuffers) == bid)
        .sortBy(_._3) // whole-ms test timestamps: nanos tie = ms tie
      for ((k, v, t) <- rows) {
        var buf = bufs(bid)
        if (t > st(bid)) st(bid) = t
        val i = buf.indexWhere(_._3 == k)
        if (i >= 0) buf = buf.updated(i, (buf(i)._1, buf(i)._2, k, v))
        else {
          val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val pos = buf.indexWhere(e => e._1 > t ||
            (e._1 == t && StatefulOps.compareUnsigned(e._2, kb) > 0))
          val entry = (t, kb, k, v)
          buf = if (pos < 0) buf :+ entry
                else (buf.take(pos) :+ entry) ++ buf.drop(pos)
        }
        val expiry = st(bid) - delayMs
        while (buf.nonEmpty && buf.head._1 <= expiry) {
          out += ((buf.head._3, buf.head._4)); buf = buf.tail
        }
        while (buf.size > maxRecords) {
          out += ((buf.head._3, buf.head._4)); buf = buf.tail
        }
        bufs(bid) = buf
      }
    }
    out.result()
  }

  test("random multi-batch replays match the naive linear-scan model " +
      "(multiset): re-puts, byte tie-breaks, eviction, overflow") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(11, 29, 53)) {
      val rng = new scala.util.Random(seed)
      // timestamps drift forward batch-to-batch with overlap and heavy
      // collisions (9 keys, 6 distinct times per batch window), so
      // re-puts, equal-time byte ordering, expiry and capacity overflow
      // all engage; one addData call per batch = one micro-batch, so the
      // batch structure is deterministic. Values are a FUNCTION of
      // (batch, key, t), not a running id: two same-(key, t) records in
      // one batch carry identical values, so the surviving value at a
      // full tie is independent of the engine's group-iterator order
      // (stable only as a sort implementation detail) while the re-put
      // path still engages within and across batches.
      val batches: Seq[Seq[(String, String, Long)]] =
        (1 to 8).map { b =>
          (1 to 15).map { _ =>
            val key = s"K${rng.nextInt(9)}"
            val t = (b - 1) * 300L + rng.nextInt(6) * 100L
            (key, s"v$b:$key:$t", t)
          }
        }
      val mem = MemoryStream[(String, String, java.sql.Timestamp)]
      val b = GraftStreams(spark)
      val stream = b.stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
      val suppressed = StatefulOps.suppressUntilTimeLimitOrdered(
        stream, delayMs, maxRecords, numBuffers)
      val name = s"suppprop$seed"
      val q = suppressed.toDF("k", "v").writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append).start()
      try {
        for (batch <- batches) {
          mem.addData(batch.map(r => (r._1, r._2, ts(r._3))))
          q.processAllAvailable()
        }
        val got = spark.table(name).collect()
          .map(row => (row.getString(0), row.getString(1))).toSeq
        val want = model(batches)
        assert(got.sorted === want.sorted,
          s"seed=$seed: got ${got.size}, want ${want.size}")
      } finally q.stop()
    }
  }
}
