package graft.testkit

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.api.{GraftStreams, KStream, Rec}
import graft.streaming.GraftClock

/** Synchronous topology test harness — the reference's
  * `TopologyTestDriver` (`streams/test-utils/.../TopologyTestDriver.java`):
  * pipe records in, the topology advances deterministically, read the
  * outputs back — no broker, no wall-clock waits.
  *
  * Spark mapping: a MemoryStream source, the topology as a
  * KStream→KStream function, a named memory sink; `pipe` blocks until the
  * micro-batch is fully processed (`processAllAvailable`), and
  * `readOutput` drains only records emitted since the previous read (the
  * reference's output-topic queue semantics).
  *
  * For wall-clock punctuation tests, pass `wallClockId`: the driver runs
  * the query on a fast processing-time trigger (timeout heartbeats need
  * batches) and [[TopologyTestDriver.advanceWallClockTime]] advances the
  * [[GraftClock.ManualClock]] of that id — the reference's
  * `advanceWallClockTime(Duration)` (`TopologyTestDriver.java:508`).
  * Build the topology over the SAME clock (e.g.
  * `StatefulOps.suppressUntilTimeLimitClocked(s, d, ManualClock(id))`);
  * timers then fire only when the test advances the clock, never because
  * real time passed.
  */
final class TopologyTestDriver[K: Encoder, V: Encoder, K2: Encoder, V2: Encoder](
    spark: SparkSession,
    topology: KStream[K, V] => KStream[K2, V2],
    outputMode: OutputMode = OutputMode.Append,
    wallClockId: Option[String] = None) {

  private implicit val inEnc: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]
  private implicit val outEnc: Encoder[(K2, V2, Timestamp)] = Rec.tupleEnc[K2, V2]
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  wallClockId.foreach(GraftClock.setTime(_, 0L)) // fresh clock per driver

  private val mem = MemoryStream[(K, V, Timestamp)]
  private val sinkName =
    s"ttd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
  private val query = {
    val w = topology(
        GraftStreams(spark).stream[K, V](mem.toDF(), col("_1"), col("_2"), col("_3")))
      .toDF.writeStream.format("memory").queryName(sinkName)
      .outputMode(outputMode)
    // heartbeat batches so processing-time timeouts get evaluated
    wallClockId.fold(w)(_ => w.trigger(Trigger.ProcessingTime("50 milliseconds")))
      .start()
  }
  private var drained = 0

  /** Pipe records into the source topic and process them to quiescence.
    * Under a manual wall clock the engine constructs batches continuously
    * (processing-time timeouts), so `processAllAvailable` would never
    * observe quiescence — instead wait until the source offset of this
    * addData is committed. */
  def pipe(records: (K, V, Timestamp)*): Unit = {
    val off = mem.addData(records)
    if (wallClockId.isEmpty) query.processAllAvailable()
    else {
      val target = off.json.trim.toLong
      val deadline = System.currentTimeMillis() + 30000L
      def done: Boolean = Option(query.lastProgress).exists(_.sources.headOption.exists(
        s => Option(s.endOffset).exists(_.trim.toLong >= target)))
      while (!done && System.currentTimeMillis() < deadline) Thread.sleep(25L)
      if (!done) throw new IllegalStateException("pipe: offset not committed in 30s")
    }
  }

  /** Advance the manual wall clock by `byMs` and wait until the engine
    * has run enough heartbeat batches to evaluate every processing-time
    * timer against the new clock — deterministic punctuation: a timer
    * fires iff the accumulated advances reach its deadline. */
  def advanceWallClockTime(byMs: Long): Unit = {
    val id = wallClockId.getOrElse(throw new IllegalStateException(
      "construct the TopologyTestDriver with wallClockId to control the wall clock"))
    GraftClock.advance(id, byMs)
    // timers armed during batch N are checked against batch start times,
    // so two fresh batch COMPLETIONS after the advance guarantee one full
    // heartbeat cycle has seen the new clock
    val start = lastBatchId
    val deadline = System.currentTimeMillis() + 30000L
    while (lastBatchId < start + 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(25L)
  }

  private def lastBatchId: Long =
    Option(query.lastProgress).map(_.batchId).getOrElse(-1L)

  /** Records the topology emitted since the last read (empty if none). */
  def readOutput(): Seq[(K2, V2, Timestamp)] = {
    val all = spark.table(sinkName).as[(K2, V2, Timestamp)].collect()
    val fresh = all.drop(drained)
    drained = all.length
    fresh.toSeq
  }

  /** Key → latest value over every emission so far (KTable-style view). */
  def readTable(): Map[K2, V2] = {
    drained = 0
    readOutput().foldLeft(Map.empty[K2, V2]) { case (m, (k, v, _)) => m.updated(k, v) }
  }

  def close(): Unit = query.stop()
}

/** Two-input-topic variant — `driver.createInputTopic` twice in the
  * reference's tests; the natural harness for join/enrichment topologies
  * (e.g. a live KStream⋈KTable). Pipes share micro-batch processing, so
  * `pipeBoth` lands both sides in one batch. */
final class TopologyTestDriver2[K1: Encoder, V1: Encoder, K2: Encoder, V2: Encoder,
    K3: Encoder, V3: Encoder](
    spark: SparkSession,
    topology: (KStream[K1, V1], KStream[K2, V2]) => KStream[K3, V3],
    outputMode: OutputMode = OutputMode.Append) {

  private implicit val in1Enc: Encoder[(K1, V1, Timestamp)] = Rec.tupleEnc[K1, V1]
  private implicit val in2Enc: Encoder[(K2, V2, Timestamp)] = Rec.tupleEnc[K2, V2]
  private implicit val outEnc: Encoder[(K3, V3, Timestamp)] = Rec.tupleEnc[K3, V3]
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val mem1 = MemoryStream[(K1, V1, Timestamp)]
  private val mem2 = MemoryStream[(K2, V2, Timestamp)]
  private val sinkName =
    s"ttd2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
  private val b = GraftStreams(spark)
  private val query = topology(
      b.stream[K1, V1](mem1.toDF(), col("_1"), col("_2"), col("_3")),
      b.stream[K2, V2](mem2.toDF(), col("_1"), col("_2"), col("_3")))
    .toDF.writeStream.format("memory").queryName(sinkName)
    .outputMode(outputMode).start()
  private var drained = 0

  def pipeLeft(records: (K1, V1, Timestamp)*): Unit = {
    mem1.addData(records)
    query.processAllAvailable()
  }

  def pipeRight(records: (K2, V2, Timestamp)*): Unit = {
    mem2.addData(records)
    query.processAllAvailable()
  }

  /** Enqueue both sides, then process — one micro-batch sees both. */
  def pipeBoth(left: Seq[(K1, V1, Timestamp)], right: Seq[(K2, V2, Timestamp)]): Unit = {
    if (left.nonEmpty) mem1.addData(left)
    if (right.nonEmpty) mem2.addData(right)
    query.processAllAvailable()
  }

  def readOutput(): Seq[(K3, V3, Timestamp)] = {
    val all = spark.table(sinkName).as[(K3, V3, Timestamp)].collect()
    val fresh = all.drop(drained)
    drained = all.length
    fresh.toSeq
  }

  def close(): Unit = query.stop()
}
