package graft.testkit

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessorHandle, TTLConfig, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ProcessorApi

/** MockProcessorContext: synchronous PAPI unit-testing without a
  * streaming query — state, per-key isolation, deterministic timer
  * firing via manual wall-clock/watermark advance (the reference's
  * MockProcessorContext + TopologyTestDriver.advanceWallClockTime). */
class MockProcessorContextSpec extends AnyFunSuite {

  private def ts(ms: Long) = new Timestamp(ms)

  /** Counts values per key; arms a timer 100 ms after first sight; on
    * expiry emits "key:count" and clears. */
  private class CountThenEmit extends ProcessorApi.Processor[String, Long, String] {
    @transient private var count: ValueState[Long] = _
    override def init(handle: StatefulProcessorHandle): Unit =
      count = handle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def process(key: String, rows: Iterator[(Long, Timestamp)],
        handle: StatefulProcessorHandle, timers: TimerValues): Iterator[String] = {
      if (!count.exists()) handle.registerTimer(timers.getCurrentProcessingTimeInMs + 100)
      count.update(count.get() + rows.size)
      Iterator.empty
    }
    override def onTimer(key: String, info: ExpiredTimerInfo,
        handle: StatefulProcessorHandle, timers: TimerValues): Iterator[String] = {
      val n = count.get()
      count.clear()
      Iterator(s"$key:$n")
    }
  }

  test("state accumulates per key; timers fire on manual clock advance") {
    val ctx = new MockProcessorContext(new CountThenEmit)
    assert(ctx.pipe("a", (1L, ts(0)), (2L, ts(1))).isEmpty)
    assert(ctx.pipe("b", (7L, ts(2))).isEmpty)
    assert(ctx.pipe("a", (3L, ts(3))).isEmpty)
    assert(ctx.scheduledTimers("a") === Seq(100L))
    // not yet due
    assert(ctx.advanceWallClockTime(50).isEmpty)
    // both keys' timers expire at 100; deterministic (ts, key) order
    assert(ctx.advanceWallClockTime(50) === Seq("a:3", "b:1"))
    // state cleared by onTimer; next record restarts the cycle
    assert(ctx.pipe("a", (9L, ts(4))).isEmpty)
    assert(ctx.advanceWallClockTime(200) === Seq("a:1"))
  }

  test("TTLConfig is recorded per state and deleteIfExists drops state") {
    val ctx = new MockProcessorContext(new CountThenEmit)
    assert(ctx.handle.ttls("count") === TTLConfig.NONE)
    ctx.pipe("k", (1L, ts(0)))
    ctx.handle.deleteIfExists("count")
    // counter restarted from zero after the drop
    ctx.pipe("k", (1L, ts(1)))
    assert(ctx.advanceWallClockTime(1000).toSet === Set("k:1", "k:1"))
  }

  test("onTimer may re-arm an already-expired timer (heartbeat pattern)") {
    // emits one tick per re-arm until the deadline passes — the
    // suppressUntilTimeLimitClocked heartbeat shape
    class Heartbeat extends ProcessorApi.Processor[String, Long, String] {
      @transient private var fired: ValueState[Long] = _
      override def init(handle: StatefulProcessorHandle): Unit =
        fired = handle.getValueState[Long]("fired", Encoders.scalaLong, TTLConfig.NONE)
      override def process(key: String, rows: Iterator[(Long, Timestamp)],
          handle: StatefulProcessorHandle, timers: TimerValues): Iterator[String] = {
        rows.size: Unit
        handle.registerTimer(10)
        Iterator.empty
      }
      override def onTimer(key: String, info: ExpiredTimerInfo,
          handle: StatefulProcessorHandle, timers: TimerValues): Iterator[String] = {
        val n = fired.get() + 1
        fired.update(n)
        if (n < 3) handle.registerTimer(info.getExpiryTimeInMs + 10)
        Iterator(s"tick$n")
      }
    }
    val ctx = new MockProcessorContext(new Heartbeat)
    ctx.pipe("k", (1L, ts(0)))
    // one advance far past all deadlines drains the whole re-arm chain
    assert(ctx.advanceWallClockTime(1000) === Seq("tick1", "tick2", "tick3"))
  }

  test("watermark advance drives event-time timers the same way") {
    val ctx = new MockProcessorContext(new CountThenEmit)
    ctx.pipe("k", (5L, ts(0)))
    assert(ctx.advanceWatermark(99).isEmpty)
    assert(ctx.advanceWatermark(100) === Seq("k:1"))
  }

  test("list and map state round-trip through the mock handle") {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val h = new MockProcessorHandle
    h.currentKey = "k1"
    val ls = h.getListState[Long]("l", Encoders.scalaLong, TTLConfig.NONE)
    ls.appendValue(1L); ls.appendList(Array(2L, 3L))
    assert(ls.get().toSeq === Seq(1L, 2L, 3L))
    ls.put(Array(9L))
    assert(ls.get().toSeq === Seq(9L))
    val ms = h.getMapState[String, Long]("m", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    ms.updateValue("x", 1L); ms.updateValue("y", 2L); ms.removeKey("x")
    assert(ms.iterator().toSeq === Seq(("y", 2L)))
    // per-key isolation: another key sees empty state under the same names
    h.currentKey = "k2"
    assert(!ls.exists() && !ms.exists())
  }
}
