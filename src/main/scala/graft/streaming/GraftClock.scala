package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

/** Pluggable wall clock for processing-time punctuation.
  *
  * The reference's testkit exposes `advanceWallClockTime`
  * (`streams/test-utils/.../TopologyTestDriver.java:508`) so wall-clock
  * punctuators fire deterministically under test instead of by real
  * elapsed time. Spark's `ProcessingTimeTimeout` clock is internal to the
  * micro-batch engine and not injectable, so operators that want
  * deterministic punctuation read THIS clock for the emit decision and
  * use Spark's timeout machinery only as a re-invocation heartbeat (see
  * [[StatefulOps.suppressUntilTimeLimitClocked]]).
  *
  * [[GraftClock.SystemClock]] is the production default. A
  * [[GraftClock.ManualClock]] reads a JVM-global registry keyed by id —
  * exact in local mode (driver and executors share the JVM, which is
  * where tests run); on a multi-JVM cluster a manual clock would only
  * advance on the driver, so it is a test-harness construct by contract,
  * like the reference's test-utils driver.
  */
sealed trait GraftClock extends Serializable {
  def nowMs(): Long
}

object GraftClock {

  /** Real wall clock — production behavior. */
  case object SystemClock extends GraftClock {
    override def nowMs(): Long = System.currentTimeMillis()
  }

  /** Test clock advanced explicitly via [[GraftClock.advance]]; starts
    * at 0 (or wherever [[setTime]] put it). */
  final case class ManualClock(id: String) extends GraftClock {
    override def nowMs(): Long = manualNow(id)
  }

  private val registry = TrieMap.empty[String, AtomicLong]
  private def counter(id: String): AtomicLong =
    registry.getOrElseUpdate(id, new AtomicLong(0L))

  def manualNow(id: String): Long = counter(id).get()
  def setTime(id: String, toMs: Long): Unit = counter(id).set(toMs)
  /** Advance the manual clock and return the new time. */
  def advance(id: String, byMs: Long): Long = counter(id).addAndGet(byMs)
  /** Forget a manual clock (test teardown). */
  def remove(id: String): Unit = registry.remove(id)
}
