package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Streaming banded-SimHash near-dup pairs: cross-batch duplicate
  * arrival, cross-band once-only emission, bucket overflow semantics,
  * and single-batch parity against a brute-force model of the batch
  * banding rules. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def harness(name: String, maxBucket: Int = 50,
      retentionMs: Long = StreamingNearDup.DefaultRetentionMs) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[Long, Long](mem.toDF(), $"_1", $"_2", $"_3")
    val q = StreamingNearDup.simhashPairs(ks, maxBucket = maxBucket,
      retentionMs = retentionMs)
      .toDF("a", "b", "ham", "ts")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    (mem, q)
  }

  /** Total state rows across both stateful stages at the LAST progress —
    * reflects post-timer eviction once processAllAvailable drains the
    * no-data batches that fire event-time timers. */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum

  private def pairs(name: String): Seq[(Long, Long, Int)] =
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("a duplicate arriving in a LATER batch pairs with the earlier doc, once") {
    val (mem, q) = harness("snd_cross")
    try {
      mem.addData((1L, 0x123456789ABCDL, ts(1000L)))
      q.processAllAvailable()
      assert(pairs("snd_cross").isEmpty) // nothing to pair with yet

      // identical fingerprint shares ALL 4 chunks — still exactly one pair
      mem.addData((2L, 0x123456789ABCDL, ts(2000L)))
      q.processAllAvailable()
      assert(pairs("snd_cross") === Seq((1L, 2L, 0)))

      // a third copy pairs with BOTH earlier docs (new pairs only)
      mem.addData((3L, 0x123456789ABCDL, ts(3000L)))
      q.processAllAvailable()
      assert(pairs("snd_cross").toSet === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
    } finally q.stop()
  }

  test("hamming filter is exact: <=5 pairs, >5 does not even when chunks match") {
    val (mem, q) = harness("snd_ham")
    try {
      val base = 0x0FFFFFFFFFFFFFFL & ((1L << 60) - 1)
      val near = base ^ 0x1FL // 5 bits flipped, all inside chunk 0
      val far = base ^ ((0x3FL << 15) | 0x7L) // 9 bits over two chunks — chunks 2,3 still match
      mem.addData((10L, base, ts(1000L)), (11L, near, ts(1000L)), (12L, far, ts(1000L)))
      q.processAllAvailable()
      val got = pairs("snd_ham").toSet
      assert(got.contains((10L, 11L, 5)))
      assert(!got.exists(p => p._1 == 12L || p._2 == 12L),
        s"far fingerprint must be hamming-filtered: $got")
    } finally q.stop()
  }

  test("bucket overflow goes dead: no pairs from a flooded bucket, earlier pairs stand") {
    val (mem, q) = harness("snd_flood", maxBucket = 3)
    try {
      // batch 1: two members -> one pair
      mem.addData((1L, 7L, ts(1000L)), (2L, 7L, ts(1000L)))
      q.processAllAvailable()
      assert(pairs("snd_flood") === Seq((1L, 2L, 0)))

      // batch 2: two more copies overflow every shared bucket (4 > 3) —
      // the buckets die, no new pairs; the emitted pair stands
      mem.addData((3L, 7L, ts(2000L)), (4L, 7L, ts(2000L)))
      q.processAllAvailable()
      assert(pairs("snd_flood") === Seq((1L, 2L, 0)))

      // and the bucket STAYS dead for later arrivals
      mem.addData((5L, 7L, ts(3000L)))
      q.processAllAvailable()
      assert(pairs("snd_flood") === Seq((1L, 2L, 0)))
    } finally q.stop()
  }

  private def mhHarness(name: String, maxBucket: Int = 50) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Long], java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[Long, Seq[Long]](mem.toDF(), $"_1", $"_2", $"_3")
    val q = StreamingNearDup.minhashPairs(ks, maxBucket = maxBucket)
      .toDF("a", "b", "ts")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    (mem, q)
  }

  private def mhPairs(name: String): Seq[(Long, Long)] =
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("minhash twin: cross-batch arrival pairs once even via all 4 bands") {
    val (mem, q) = mhHarness("snd_mh")
    try {
      val sig: Seq[Long] = Seq.tabulate(16)(i => (i * 37 + 5).toLong)
      mem.addData((1L, sig, ts(1000L)))
      q.processAllAvailable()
      assert(mhPairs("snd_mh").isEmpty)

      // identical signature meets doc 1 in ALL 4 bands — exactly one pair
      mem.addData((2L, sig, ts(2000L)))
      q.processAllAvailable()
      assert(mhPairs("snd_mh") === Seq((1L, 2L)))

      // doc 3 shares ONLY band 0 (first 4 signature rows) — pairs with both
      val sig3: Seq[Long] = sig.take(4) ++ Seq.tabulate(12)(i => (900 + i).toLong)
      mem.addData((3L, sig3, ts(3000L)))
      q.processAllAvailable()
      assert(mhPairs("snd_mh").toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }

  test("minhash twin: flooded band bucket goes dead, earlier pairs stand") {
    val (mem, q) = mhHarness("snd_mh_flood", maxBucket = 2)
    try {
      val sig: Seq[Long] = Seq.tabulate(16)(i => (i * 11 + 3).toLong)
      mem.addData((1L, sig, ts(1000L)), (2L, sig, ts(1000L)))
      q.processAllAvailable()
      assert(mhPairs("snd_mh_flood") === Seq((1L, 2L)))

      mem.addData((3L, sig, ts(2000L))) // 3 > maxBucket: every shared bucket dies
      q.processAllAvailable()
      assert(mhPairs("snd_mh_flood") === Seq((1L, 2L)))
    } finally q.stop()
  }

  test("retention: an expired member stops matching and its state is reclaimed") {
    val (mem, q) = harness("snd_ttl", retentionMs = 5000L)
    try {
      val fp = 0x5A5A5A5A5A5A5L
      mem.addData((1L, fp, ts(1000L)))
      q.processAllAvailable()
      val afterDoc1 = stateRows(q)

      // an unrelated doc at ts 20s pushes the watermark past doc 1's
      // horizon (1s + 5s); the bucket timers then reclaim doc 1 entirely,
      // so state holds ONE doc's worth of entries both before and after
      mem.addData((99L, ~fp & ((1L << 60) - 1), ts(20000L)))
      q.processAllAvailable()
      assert(stateRows(q) <= afterDoc1,
        s"expired doc 1 state must be reclaimed: ${stateRows(q)} vs $afterDoc1")

      // an identical fingerprint arriving after the horizon finds nothing
      mem.addData((2L, fp, ts(21000L)))
      q.processAllAvailable()
      assert(pairs("snd_ttl").isEmpty, "doc 1 aged out - no pair")

      // but a copy arriving INSIDE doc 2's window still pairs
      mem.addData((3L, fp, ts(22000L)))
      q.processAllAvailable()
      assert(pairs("snd_ttl") === Seq((2L, 3L, 0)))
    } finally q.stop()
  }

  test("retention: a flooded bucket revives once the flood ages out") {
    val (mem, q) = harness("snd_revive", maxBucket = 3, retentionMs = 5000L)
    try {
      val fp = 0x123123123123L
      // 4 > maxBucket in one batch: every bucket voids, nothing emits
      mem.addData((1L, fp, ts(1000L)), (2L, fp, ts(1000L)),
        (3L, fp, ts(1000L)), (4L, fp, ts(1000L)))
      q.processAllAvailable()
      assert(pairs("snd_revive").isEmpty)

      // while the flood is inside the horizon the bucket stays dead
      mem.addData((5L, fp, ts(3000L)))
      q.processAllAvailable()
      assert(pairs("snd_revive").isEmpty)

      // advance the watermark past flood + retention; the void marker
      // decays and a fresh pair of members pairs again
      mem.addData((99L, ~fp & ((1L << 60) - 1), ts(30000L)))
      q.processAllAvailable()
      mem.addData((6L, fp, ts(31000L)), (7L, fp, ts(31000L)))
      q.processAllAvailable()
      assert(pairs("snd_revive") === Seq((6L, 7L, 0)))
    } finally q.stop()
  }

  test("retention: the pair-once boolean expires - re-arrival re-emits across windows") {
    val (mem, q) = harness("snd_reemit", retentionMs = 5000L)
    try {
      val fp = 0x77777777777L
      mem.addData((1L, fp, ts(1000L)), (2L, fp, ts(1000L)))
      q.processAllAvailable()
      assert(pairs("snd_reemit") === Seq((1L, 2L, 0)))

      // age everything out, then replay the same two docs: the bucket is
      // fresh AND the pair boolean was reclaimed, so the pair re-emits —
      // exactly-once within a window, at-least-once across windows
      mem.addData((99L, ~fp & ((1L << 60) - 1), ts(30000L)))
      q.processAllAvailable()
      mem.addData((1L, fp, ts(31000L)), (2L, fp, ts(31000L)))
      q.processAllAvailable()
      assert(pairs("snd_reemit") === Seq((1L, 2L, 0), (1L, 2L, 0)))
    } finally q.stop()
  }

  test("flood guard: a single-batch flood never buffers past maxBucket+1") {
    NearDupProbe.reset()
    val (mem, q) = harness("snd_guard", maxBucket = 3)
    try {
      val fp = 0x4444444444444L
      mem.addData((0 until 10000).map(i => (i.toLong, fp, ts(1000L + i))): _*)
      q.processAllAvailable()
      assert(pairs("snd_guard").isEmpty, "a 10k flood must void the bucket")
      assert(NearDupProbe.maxOvershoot.get() <= 0,
        s"arrival buffer exceeded maxBucket+1 by ${NearDupProbe.maxOvershoot.get()} rows")
    } finally q.stop()
  }

  test("single-batch replay equals the brute-force batch banding model") {
    val rnd = new scala.util.Random(42)
    // clustered fingerprints so near-dups actually occur
    val centers = Array.fill(6)(rnd.nextLong() & ((1L << 60) - 1))
    val docs = (0 until 80).map { i =>
      val c = centers(rnd.nextInt(centers.length))
      val flips = rnd.nextInt(8) // 0..7 bit flips
      val fp = (0 until flips).foldLeft(c)((h, _) => h ^ (1L << rnd.nextInt(60)))
      (i.toLong, fp)
    }

    // brute-force model of the batch rules: per (band, chunk) buckets,
    // 2..50 size cut, pairs among members, hamming <= 5, distinct
    val buckets = docs
      .flatMap { case (id, h) =>
        (0 until 4).map(b => ((b, (h >> (b * 15)) & 32767L), (id, h)))
      }
      .groupBy(_._1).values.map(_.map(_._2))
      .filter(m => m.size >= 2 && m.size <= 50)
    val expected = buckets.flatMap { m =>
      for {
        x <- m; y <- m
        if x._1 < y._1 && java.lang.Long.bitCount(x._2 ^ y._2) <= 5
      } yield (x._1, y._1, java.lang.Long.bitCount(x._2 ^ y._2))
    }.toSet

    val (mem, q) = harness("snd_prop")
    try {
      mem.addData(docs.map { case (id, fp) => (id, fp, ts(1000L + id)) })
      q.processAllAvailable()
      assert(pairs("snd_prop").toSet === expected)
      assert(expected.nonEmpty, "degenerate fuzz input: no expected pairs")
    } finally q.stop()
  }

  // ------------------------------------------- embedding sign-bucket twin

  private def embHarness(name: String, maxBucket: Int = 50) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[Long, Seq[Float]](mem.toDF(), $"_1", $"_2", $"_3")
    val q = StreamingNearDup.embeddingPairs(ks, maxBucket = maxBucket)
      .select("vec_a", "vec_b", "sim")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    (mem, q)
  }

  private def embPairs(name: String): Seq[(Long, Long)] =
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("embedding twin: a near-identical vector arriving in a LATER batch pairs once") {
    val (mem, q) = embHarness("snd_emb")
    try {
      val v1: Seq[Float] = Seq.fill(16)(1.0f)
      val v2: Seq[Float] = Seq.fill(15)(1.0f) :+ 0.9f // same signs, cosine ~ 0.9996
      mem.addData((1L, v1, ts(1000L)))
      q.processAllAvailable()
      assert(embPairs("snd_emb").isEmpty)

      mem.addData((2L, v2, ts(2000L)))
      q.processAllAvailable()
      assert(embPairs("snd_emb") === Seq((1L, 2L)))

      // a third copy pairs with both earlier vectors
      mem.addData((3L, v1, ts(3000L)))
      q.processAllAvailable()
      assert(embPairs("snd_emb").toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally q.stop()
  }

  test("embedding twin: same bucket but low cosine is rescored away") {
    val (mem, q) = embHarness("snd_emb_thr")
    try {
      // identical signs on the 12 bucket dims, but the mass sits in
      // OPPOSITE higher dims: same bucket, cosine ~ -1 -> filtered
      val a: Seq[Float] = Seq.fill(12)(0.01f) ++ Seq(100f, -100f, 100f, -100f)
      val b: Seq[Float] = Seq.fill(12)(0.01f) ++ Seq(-100f, 100f, -100f, 100f)
      mem.addData((10L, a, ts(1000L)), (11L, b, ts(1000L)))
      q.processAllAvailable()
      assert(embPairs("snd_emb_thr").isEmpty)
    } finally q.stop()
  }

  test("embedding twin: flooded sign bucket goes dead, earlier pairs stand") {
    val (mem, q) = embHarness("snd_emb_flood", maxBucket = 2)
    try {
      val v: Seq[Float] = Seq.fill(16)(1.0f)
      mem.addData((1L, v, ts(1000L)), (2L, v, ts(1000L)))
      q.processAllAvailable()
      assert(embPairs("snd_emb_flood") === Seq((1L, 2L)))

      mem.addData((3L, v, ts(2000L))) // 3 > maxBucket: the bucket dies
      q.processAllAvailable()
      assert(embPairs("snd_emb_flood") === Seq((1L, 2L)))
    } finally q.stop()
  }
}
