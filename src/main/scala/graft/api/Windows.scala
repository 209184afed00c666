package graft.api

import java.time.Duration

/** Window specifications mirroring the reference surface:
  * tumbling/hopping `TimeWindows` (`streams/.../kstream/TimeWindows.java:110-186`),
  * `SessionWindows` (`kstream/SessionWindows.java:96-129`),
  * `JoinWindows` (`kstream/JoinWindows.java:121-244`),
  * `UnlimitedWindows` (`kstream/UnlimitedWindows.java:60-94`).
  *
  * Grace maps to a Structured Streaming watermark: reference drops a record
  * when `windowEnd <= streamTime - grace` (KStreamWindowAggregate.java:109);
  * Spark's watermark is the global min of per-partition max event time minus
  * the delay — slightly more conservative, same contract (SURVEY.md §7.4).
  */
sealed trait WindowSpec { def graceMs: Long }

final case class TimeWindows(sizeMs: Long, advanceMs: Long, graceMs: Long)
    extends WindowSpec {
  require(sizeMs > 0 && advanceMs > 0 && advanceMs <= sizeMs)
  def advanceBy(advance: Duration): TimeWindows = copy(advanceMs = advance.toMillis)
  def grace(g: Duration): TimeWindows = copy(graceMs = g.toMillis)
  def isTumbling: Boolean = advanceMs == sizeMs
  private[api] def sizeExpr = s"$sizeMs milliseconds"
  private[api] def slideExpr = s"$advanceMs milliseconds"
}

object TimeWindows {
  /** Tumbling window of the given size (reference default grace = 24h -
    * size; we default to zero grace, explicit opt-in for lateness). */
  def of(size: Duration): TimeWindows =
    TimeWindows(size.toMillis, size.toMillis, graceMs = 0L)
}

final case class SessionWindows(gapMs: Long, graceMs: Long) extends WindowSpec {
  require(gapMs > 0)
  def grace(g: Duration): SessionWindows = copy(graceMs = g.toMillis)
  private[api] def gapExpr = s"$gapMs milliseconds"
}

object SessionWindows {
  def `with`(gap: Duration): SessionWindows = SessionWindows(gap.toMillis, 0L)
  def ofInactivityGap(gap: Duration): SessionWindows = `with`(gap)
}

/** Per-record sliding windows (`kstream/SlidingWindows.java`, since Kafka
  * 2.7): one window ends at every record timestamp ("left" window) and one
  * opens just after it ("right" window, kept only if non-empty), so the
  * aggregate is exact over the trailing `size` interval — no hopping-window
  * quantization.
  *
  * Divergence: the reference's windows are closed `[start, end]` at ms
  * resolution; ours are half-open `(end - size, end]` at µs resolution —
  * identical membership except for a record exactly `size` older than the
  * window end. */
final case class SlidingWindows(sizeMs: Long, graceMs: Long) extends WindowSpec {
  require(sizeMs > 0)
  def grace(g: Duration): SlidingWindows = copy(graceMs = g.toMillis)
}

object SlidingWindows {
  def ofTimeDifference(size: Duration): SlidingWindows =
    SlidingWindows(size.toMillis, 0L)
}

/** Interval-join window: right.ts in [left.ts - before, left.ts + after]. */
final case class JoinWindows(beforeMs: Long, afterMs: Long, graceMs: Long)
    extends WindowSpec {
  def before(d: Duration): JoinWindows = copy(beforeMs = d.toMillis)
  def after(d: Duration): JoinWindows = copy(afterMs = d.toMillis)
  def grace(g: Duration): JoinWindows = copy(graceMs = g.toMillis)
}

object JoinWindows {
  def of(timeDifference: Duration): JoinWindows =
    JoinWindows(timeDifference.toMillis, timeDifference.toMillis, 0L)
}

/** Landmark windows: single never-closing window from epoch. */
final case class UnlimitedWindows(graceMs: Long = 0L) extends WindowSpec

/** Windowed key: key plus its window span; end is exclusive for time
  * windows (`kstream/internals/TimeWindow.java:36`). */
final case class Windowed[K](key: K, start: java.sql.Timestamp, end: java.sql.Timestamp)
