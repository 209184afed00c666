package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessorHandle, TimeMode, TimerValues, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Full Processor API on transformWithState: named value state + an
  * event-time punctuator emitting a final per-key sum once stream time
  * passes the key's last update + gap — `Processor.init/process` with
  * `context.schedule(STREAM_TIME)` (`PunctuationType.java:34`). */
class ProcessorApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("named state + STREAM_TIME punctuation emit final sums after quiet gaps") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
      val stream = GraftStreams(spark).stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      val out = ProcessorApi.process[String, Int, (String, Int)](
        stream, new QuietGapSum, TimeMode.EventTime(), OutputMode.Append, graceMs = 0L)
      val q = out.toDF("k", "total").writeStream.format("memory").queryName("papi")
        .outputMode(OutputMode.Append).start()
      def rows() = spark.table("papi").collect().map(r => (r.getString(0), r.getInt(1)))
      try {
        mem.addData(("a", 1, ts(1000L)), ("a", 2, ts(2000L)))
        q.processAllAvailable() // watermark 2000 < 5000: still buffering
        assert(rows().isEmpty)
        mem.addData(("a", 4, ts(3000L))) // extends the quiet window to 6000
        q.processAllAvailable()
        assert(rows().isEmpty)
        mem.addData(("b", 9, ts(10000L))) // watermark -> 3000.. then 10000
        q.processAllAvailable()
        mem.addData(("c", 0, ts(20000L))) // advance watermark past a's timer
        q.processAllAvailable()
        assert(rows().toSet.contains(("a", 7))) // single FINAL emission, summed
        assert(rows().count(_._1 == "a") === 1)
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
  test("MapState works as the processor's attached KV store (seen-id dedup)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, String, java.sql.Timestamp)]
      val stream = GraftStreams(spark).stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
      val out = ProcessorApi.process[String, String, (String, String)](
        stream, new SeenIdDedup, TimeMode.None(), OutputMode.Append)
      val q = out.toDF("k", "v").writeStream.format("memory").queryName("papimap")
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(("k", "id1", ts(1000L)))
        q.processAllAvailable()
        mem.addData(("k", "id1", ts(2000L)), ("k", "id2", ts(2500L))) // id1 redelivered
        q.processAllAvailable()
        val got = spark.table("papimap").collect().map(r => r.getString(1)).toSeq
        assert(got === Seq("id1", "id2")) // each id forwarded exactly once
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** Forwards each (key, id) once — MapState as the processor-attached
  * KeyValueStore (`Stores.keyValueStoreBuilder`). */
private[streaming] class SeenIdDedup
    extends ProcessorApi.Processor[String, String, (String, String)] {
  import org.apache.spark.sql.streaming.MapState
  @transient private var seen: MapState[String, Long] = _

  override def init(handle: StatefulProcessorHandle): Unit =
    seen = handle.getMapState[String, Long]("seen",
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong,
      TTLConfig.NONE)

  override def process(key: String, rows: Iterator[(String, Timestamp)],
      handle: StatefulProcessorHandle, timers: TimerValues): Iterator[(String, String)] =
    rows.flatMap { case (id, _) =>
      if (seen.containsKey(id)) None
      else { seen.updateValue(id, 1L); Some((key, id)) }
    }
}

/** Sums values per key; punctuates (emits + clears) once event time
  * passes lastTs + 3s of quiet. */
private[streaming] class QuietGapSum extends ProcessorApi.Processor[String, Int, (String, Int)] {
  @transient private var sum: ValueState[Int] = _
  @transient private var lastTimer: ValueState[Long] = _

  override def init(handle: StatefulProcessorHandle): Unit = {
    sum = handle.getValueState[Int]("sum",
      org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
    lastTimer = handle.getValueState[Long]("lastTimer",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def process(key: String, rows: Iterator[(Int, Timestamp)],
      handle: StatefulProcessorHandle, timers: TimerValues): Iterator[(String, Int)] = {
    var acc = if (sum.exists()) sum.get() else 0
    var maxTs = 0L
    rows.foreach { case (v, t) => acc += v; maxTs = math.max(maxTs, t.getTime) }
    sum.update(acc)
    // reschedule the punctuator: cancel the previous timer, arm a new
    // one at lastTs + 3s (context.schedule with stream-time advance)
    if (lastTimer.exists()) handle.deleteTimer(lastTimer.get())
    val at = math.max(timers.getCurrentWatermarkInMs() + 1L, maxTs + 3000L)
    handle.registerTimer(at)
    lastTimer.update(at)
    Iterator.empty
  }

  override def onTimer(key: String, info: ExpiredTimerInfo,
      handle: StatefulProcessorHandle, timers: TimerValues): Iterator[(String, Int)] = {
    val out = if (sum.exists()) Iterator.single((key, sum.get())) else Iterator.empty
    sum.clear()
    lastTimer.clear()
    out
  }
}

