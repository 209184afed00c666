package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, StatefulProcessorHandle, TimeMode, TimerValues}

import graft.api.{KStream, Rec}

/** The reference's FULL Processor API
  * (`processor/Processor.java` + `ProcessorContext.java`) on Spark 4's
  * `transformWithState` — a structurally closer map than
  * `flatMapGroupsWithState`:
  *
  *   - named state stores per processor (`context.getStateStore(name)`,
  *     `Stores.java:85-315`) ⇒ named `ValueState`/`ListState`/`MapState`
  *     variables on the [[StatefulProcessorHandle]];
  *   - `context.schedule(interval, STREAM_TIME | WALL_CLOCK_TIME, ...)`
  *     (`PunctuationType.java:34-35`) ⇒ `registerTimer` under
  *     `TimeMode.EventTime()` / `TimeMode.ProcessingTime()` — both live on
  *     the SAME processor, unlike GroupStateTimeout's either/or;
  *   - windowed-store retention ⇒ per-state `TTLConfig`;
  *   - multiple `forward()` calls ⇒ the returned iterators.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), which is also the
  * reference's store engine — set it on the session before starting the
  * query.
  *
  * Deterministic WALL_CLOCK_TIME punctuation under test (the reference's
  * `TopologyTestDriver.advanceWallClockTime`, `TopologyTestDriver.java:508`):
  * Spark's processing-time timers can't be advanced from outside, so a
  * processor that needs it registers a short HEARTBEAT timer under
  * `TimeMode.ProcessingTime()` and decides the actual emit in `onTimer`
  * against an injected [[GraftClock]] (re-arming the heartbeat until the
  * manual deadline passes) — the same pattern as
  * [[StatefulOps.suppressUntilTimeLimitClocked]], driven from
  * `graft.testkit.TopologyTestDriver(wallClockId = ...)`.
  */
object ProcessorApi {

  /** User-facing processor — `Processor<K,V>` with `init/process/punctuate`. */
  trait Processor[K, V, OUT] extends Serializable {
    /** `Processor.init(context)`: create named state handles here. */
    def init(handle: StatefulProcessorHandle): Unit
    /** `Processor.process` over this trigger's records for one key;
      * `forward` = emit through the returned iterator. */
    def process(key: K, rows: Iterator[(V, Timestamp)],
        handle: StatefulProcessorHandle, timers: TimerValues): Iterator[OUT]
    /** Punctuator callback (`Punctuator.punctuate(ts)`). */
    def onTimer(key: K, info: ExpiredTimerInfo, handle: StatefulProcessorHandle,
        timers: TimerValues): Iterator[OUT] = Iterator.empty
  }

  /** Top-level adapter (anonymous subclasses would capture `$outer`). */
  private final class Adapter[K, V, OUT](proc: Processor[K, V, OUT])
      extends StatefulProcessor[K, (K, V, Timestamp), OUT] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      proc.init(getHandle)
    override def handleInputRows(key: K, rows: Iterator[(K, V, Timestamp)],
        timerValues: TimerValues): Iterator[OUT] =
      proc.process(key, rows.map(r => (r._2, r._3)), getHandle, timerValues)
    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OUT] =
      proc.onTimer(key, expiredTimerInfo, getHandle, timerValues)
  }

  /** `topology.addProcessor` analogue: run the processor per key over the
    * stream. `timeMode` picks the punctuation clock (STREAM_TIME =
    * `TimeMode.EventTime()` — watermark the stream via grace). */
  def process[K: Encoder, V: Encoder, OUT: Encoder](
      stream: KStream[K, V],
      proc: Processor[K, V, OUT],
      timeMode: TimeMode,
      outputMode: OutputMode = OutputMode.Append,
      graceMs: Long = 0L,
      watermark: Boolean = true,
      eventTimeCol: Option[String] = None): Dataset[OUT] = {
    implicit val t3: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]
    // providerClass is read at query START, so defaulting the session's
    // UNSET provider here (topology build time) is in time. An explicit
    // user choice — even explicit HDFS — is never overridden: the session
    // may be running other queries whose checkpoints were laid out by
    // that provider (restarts read the provider persisted in their own
    // checkpoint, but the user's session-level intent stays theirs).
    // transformWithState itself rejects non-RocksDB providers at start
    // with a clear error, so a wrong explicit setting fails loudly.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val session = stream.toDF.sparkSession
    if (session.conf.get(key, "").isEmpty)
      session.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // watermark=false for a processor CHAINED onto another stateful
    // stage's output — the source stage already defined the stream's
    // watermark and Spark forbids redefining it mid-chain
    val in = if (watermark) Rec.withGrace(stream.toDF, graceMs) else stream.toDF
    val grouped = new KStream[K, V](in).toDataset.groupByKey(_._1)
    eventTimeCol match {
      // the reference's "changelog topic carries the record timestamp":
      // declaring an OUTPUT event-time column (KIP-sourced Spark overload)
      // lets a downstream stateful stage keep event-time semantics —
      // required for chained stages whose own timers drive store retention
      case Some(c) =>
        grouped.transformWithState(new Adapter[K, V, OUT](proc), c, outputMode)
      case None =>
        grouped.transformWithState(new Adapter[K, V, OUT](proc), timeMode, outputMode)
    }
  }
}
