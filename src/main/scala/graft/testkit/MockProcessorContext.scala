package graft.testkit

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, QueryInfo, StatefulProcessorHandle, TTLConfig, TimerValues, ValueState}

import graft.streaming.ProcessorApi

/** In-memory [[StatefulProcessorHandle]] for unit-testing
  * [[ProcessorApi.Processor]] implementations without a streaming query —
  * the analogue of the reference's `MockProcessorContext`
  * (`streams/test-utils/.../processor/MockProcessorContext.java`: state
  * stores, punctuator capture, and manual time, all synchronous).
  *
  * State and timers are PER KEY, exactly like the real handle (a
  * `transformWithState` handle is implicitly scoped to the current
  * grouping key): [[MockProcessorContext.pipe]] sets the key before each
  * `process` call, and registered TTLConfigs are recorded per state name
  * for assertions. Not thread-safe — tests are synchronous by design.
  */
final class MockProcessorHandle extends StatefulProcessorHandle {
  private[testkit] var currentKey: Any = _
  private[testkit] var batchId: Long = 0L
  private val values = mutable.Map.empty[(Any, String), Any]
  private val lists = mutable.Map.empty[(Any, String), mutable.ArrayBuffer[Any]]
  private val maps = mutable.Map.empty[(Any, String), mutable.LinkedHashMap[Any, Any]]
  private[testkit] val timers = mutable.Map.empty[Any, mutable.SortedSet[Long]]
  /** TTLConfig recorded per state name — assert retention wiring. */
  val ttls: mutable.Map[String, TTLConfig] = mutable.Map.empty

  private final class MockValueState[T](name: String) extends ValueState[T] {
    override def exists(): Boolean = values.contains((currentKey, name))
    override def get(): T =
      values.getOrElse((currentKey, name), null).asInstanceOf[T]
    override def update(v: T): Unit = values((currentKey, name)) = v
    override def clear(): Unit = values.remove((currentKey, name))
  }

  private final class MockListState[T](name: String) extends ListState[T] {
    private def buf = lists.getOrElseUpdate((currentKey, name), mutable.ArrayBuffer.empty)
    override def exists(): Boolean =
      lists.get((currentKey, name)).exists(_.nonEmpty)
    override def get(): Iterator[T] = buf.iterator.map(_.asInstanceOf[T])
    override def put(newState: Array[T]): Unit = {
      val b = buf; b.clear(); b ++= newState
    }
    override def appendValue(v: T): Unit = buf += v
    override def appendList(vs: Array[T]): Unit = buf ++= vs
    override def clear(): Unit = lists.remove((currentKey, name))
  }

  private final class MockMapState[MK, MV](name: String) extends MapState[MK, MV] {
    private def m = maps.getOrElseUpdate((currentKey, name), mutable.LinkedHashMap.empty)
    override def exists(): Boolean = maps.get((currentKey, name)).exists(_.nonEmpty)
    override def getValue(k: MK): MV = m.getOrElse(k, null).asInstanceOf[MV]
    override def containsKey(k: MK): Boolean = m.contains(k)
    override def updateValue(k: MK, v: MV): Unit = m(k) = v
    override def iterator(): Iterator[(MK, MV)] =
      m.iterator.map { case (k, v) => (k.asInstanceOf[MK], v.asInstanceOf[MV]) }
    override def keys(): Iterator[MK] = m.keysIterator.map(_.asInstanceOf[MK])
    override def values(): Iterator[MV] = m.valuesIterator.map(_.asInstanceOf[MV])
    override def removeKey(k: MK): Unit = m.remove(k)
    override def clear(): Unit = maps.remove((currentKey, name))
  }

  override def getValueState[T](name: String, enc: Encoder[T],
      ttl: TTLConfig): ValueState[T] = { ttls(name) = ttl; new MockValueState[T](name) }
  override def getValueState[T](name: String, ttl: TTLConfig)(
      implicit enc: Encoder[T]): ValueState[T] = getValueState(name, enc, ttl)

  override def getListState[T](name: String, enc: Encoder[T],
      ttl: TTLConfig): ListState[T] = { ttls(name) = ttl; new MockListState[T](name) }
  override def getListState[T](name: String, ttl: TTLConfig)(
      implicit enc: Encoder[T]): ListState[T] = getListState(name, enc, ttl)

  override def getMapState[MK, MV](name: String, kEnc: Encoder[MK],
      vEnc: Encoder[MV], ttl: TTLConfig): MapState[MK, MV] =
    { ttls(name) = ttl; new MockMapState[MK, MV](name) }
  override def getMapState[MK, MV](name: String, ttl: TTLConfig)(
      implicit kEnc: Encoder[MK], vEnc: Encoder[MV]): MapState[MK, MV] =
    getMapState(name, kEnc, vEnc, ttl)

  override def getQueryInfo(): QueryInfo = new QueryInfo {
    private val qid = java.util.UUID.nameUUIDFromBytes("mock-query".getBytes)
    private val rid = java.util.UUID.nameUUIDFromBytes("mock-run".getBytes)
    override def getQueryId: java.util.UUID = qid
    override def getRunId: java.util.UUID = rid
    override def getBatchId: Long = batchId
    override def toString: String = s"MockQueryInfo(batch=$batchId)"
  }

  override def registerTimer(expiryTimestampMs: Long): Unit =
    timers.getOrElseUpdate(currentKey, mutable.SortedSet.empty[Long]) += expiryTimestampMs
  override def deleteTimer(expiryTimestampMs: Long): Unit =
    timers.get(currentKey).foreach(_ -= expiryTimestampMs)
  override def listTimers(): Iterator[Long] =
    timers.getOrElse(currentKey, mutable.SortedSet.empty[Long]).iterator
  override def deleteIfExists(stateName: String): Unit = {
    values.filterInPlace { case ((_, n), _) => n != stateName }
    lists.filterInPlace { case ((_, n), _) => n != stateName }
    maps.filterInPlace { case ((_, n), _) => n != stateName }
    ttls.remove(stateName)
  }
}

/** Synchronous single-JVM driver for one [[ProcessorApi.Processor]]:
  * pipe records per key, read forwards, advance the wall clock or the
  * watermark to fire timers deterministically — `MockProcessorContext`
  * + `TopologyTestDriver.advanceWallClockTime`
  * (`TopologyTestDriver.java:508`) for the PAPI layer. One clock drives
  * both timer kinds because a real `transformWithState` query runs under
  * a single `TimeMode`; use the advance method matching the mode the
  * processor targets. */
final class MockProcessorContext[K, V, OUT](proc: ProcessorApi.Processor[K, V, OUT]) {
  val handle = new MockProcessorHandle
  private var procTimeMs = 0L
  private var watermarkMs = 0L
  proc.init(handle)

  private def timerValues: TimerValues = new TimerValues {
    private val p = procTimeMs
    private val w = watermarkMs
    override def getCurrentProcessingTimeInMs: Long = p
    override def getCurrentWatermarkInMs: Long = w
  }

  /** Process records for one key (one trigger's worth); returns forwards. */
  def pipe(key: K, records: (V, Timestamp)*): Seq[OUT] = {
    handle.currentKey = key
    proc.process(key, records.iterator, handle, timerValues).toSeq
  }

  /** Advance processing time and fire every timer now expired. */
  def advanceWallClockTime(byMs: Long): Seq[OUT] = {
    procTimeMs += byMs
    fireExpired(procTimeMs)
  }

  /** Advance the watermark and fire every timer now expired. */
  def advanceWatermark(toMs: Long): Seq[OUT] = {
    watermarkMs = math.max(watermarkMs, toMs)
    fireExpired(watermarkMs)
  }

  /** Pending timers for a key, in expiry order. */
  def scheduledTimers(key: K): Seq[Long] = {
    handle.currentKey = key
    handle.listTimers().toSeq
  }

  def setBatchId(b: Long): Unit = handle.batchId = b

  private def fireExpired(clock: Long): Seq[OUT] = {
    // deterministic firing order: by (expiry, key rendering); re-scan
    // after each callback — an onTimer may register follow-up timers
    // that are themselves already expired (heartbeat re-arm pattern)
    val out = Seq.newBuilder[OUT]
    var fired = true
    while (fired) {
      fired = false
      val due = handle.timers.toSeq
        .flatMap { case (k, ts) => ts.headOption.map(t => (t, k)) }
        .filter(_._1 <= clock)
        .sortBy { case (t, k) => (t, String.valueOf(k)) }
      due.headOption.foreach { case (t, k) =>
        handle.timers(k) -= t
        if (handle.timers(k).isEmpty) handle.timers.remove(k)
        handle.currentKey = k
        out ++= proc.onTimer(k.asInstanceOf[K],
          new ExpiredTimerInfo { override def getExpiryTimeInMs: Long = t },
          handle, timerValues)
        fired = true
      }
    }
    out.result()
  }
}
