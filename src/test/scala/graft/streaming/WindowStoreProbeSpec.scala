package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Steady-state probes for the window-store topology (per-record put into
  * (key, 1h window) state — the Bench `window-store` workload and the
  * reference SimpleBenchmark's windowed-count store). r9's committed
  * bench carried window-store at 0.50x its pinned baseline with no way to
  * tell contamination from regression until the next bench commit; these
  * pins surface the two real-regression candidates at TEST time:
  *
  *   1. state-row EXPLOSION — the state cardinality must be exactly
  *      |keys| x |windows| (a per-record or per-batch leak would multiply
  *      it), and
  *   2. throughput COLLAPSE — a conservative rec/sec floor that only a
  *      plan/topology regression (not machine noise) can cross: the floor
  *      sits ~5x under the healthy local[4] rate.
  */
class WindowStoreProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val HourMs = 3600 * 1000L

  test("window-store state holds EXACTLY |keys| x |windows| rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val windowed = mem.toDF().toDF("user_id", "ts")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)))
    val q = windowed.writeStream.format("noop")
      .outputMode(OutputMode.Update).start()
    try {
      val keys = 50
      val windows = 4
      // 3 records per (key, window) cell, split across two batches so the
      // second batch UPDATES existing state instead of inserting
      def batch(rep: Int) = for {
        k <- 0 until keys; w <- 0 until windows
      } yield (k.toLong, TestSpark.ts(w * HourMs + rep * 1000L))
      mem.addData(batch(0) ++ batch(1))
      q.processAllAvailable()
      mem.addData(batch(2))
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows === keys.toLong * windows,
        s"state-row explosion: $rows rows for ${keys * windows} cells")
    } finally q.stop()
  }

  test("window-store throughput stays above the regression floor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def measureOnce(): Double = {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val windowed = mem.toDF().toDF("user_id", "ts")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)))
      val q = windowed.writeStream.format("noop")
        .outputMode(OutputMode.Update).start()
      try {
        val records = 200000
        // 1k keys x 4 windows — the Bench workload's shape (many keys,
        // few windows, heavy per-record update traffic)
        val data = (0 until records).map(i =>
          ((i % 1000).toLong, TestSpark.ts((i % 4) * HourMs + i)))
        mem.addData(data.take(1000)) // untimed warmup batch
        q.processAllAvailable()
        val t0 = System.nanoTime()
        data.grouped(50000).foreach(mem.addData(_))
        q.processAllAvailable()
        records / ((System.nanoTime() - t0) / 1e9)
      } finally q.stop()
    }
    def loadAvg1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // healthy local[4] runs ~10x the floor; only a topology regression
    // (e.g. per-trigger snapshot uploads, state leak) can cross it on a
    // QUIET machine. A co-tenant-loaded CI box can cross it for machine
    // reasons (the very failure mode the bench contention guard exists
    // for), so a below-floor reading retries once and then CANCELS —
    // never fails — when the loadavg says the machine is busy.
    val floor = 8000.0
    val first = measureOnce()
    if (first >= floor) succeed
    else {
      val second = measureOnce()
      if (second >= floor) succeed
      else if (loadAvg1() > 2.0)
        cancel(f"below-floor reading ($first%.0f / $second%.0f rec/s) on a " +
          f"contended machine (loadavg ${loadAvg1()}%.1f) - not a regression signal")
      else fail(f"window-store throughput collapsed on a quiet machine: " +
        f"$first%.0f / $second%.0f rec/s (floor $floor%.0f)")
    }
  }
}
