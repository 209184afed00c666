package graft.testkit

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** TopologyTestDriver parity (`streams/test-utils`): synchronous pipe →
  * process → read cycles over a stateless chain and a stateful count. */
class TopologyTestDriverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stateless chain: outputs drain once per read, in pipe order") {
    val driver = new TopologyTestDriver[String, String, String, String](
      spark,
      s => s.filter((_, v) => v != "drop").mapValues(_.toUpperCase))
    try {
      driver.pipe(("k1", "hello", ts(1000L)), ("k2", "drop", ts(1100L)))
      assert(driver.readOutput().map(r => (r._1, r._2)) === Seq(("k1", "HELLO")))
      assert(driver.readOutput() === Seq.empty) // queue drained
      driver.pipe(("k3", "world", ts(2000L)))
      assert(driver.readOutput().map(r => (r._1, r._2)) === Seq(("k3", "WORLD")))
    } finally driver.close()
  }

  test("two-topic driver runs a live enrichment join (stream x changelog table)") {
    val driver = new TopologyTestDriver2[String, String, String, String, String, String](
      spark,
      (clicks, purchases) => clicks.joinTable(purchases.toTable)(_ + "@" + _))
    try {
      driver.pipeLeft(("u1", "click1", ts(1000L)))
      assert(driver.readOutput().isEmpty) // no table state yet
      driver.pipeRight(("u1", "premium", ts(2000L)))
      assert(driver.readOutput().isEmpty) // table updates emit nothing
      driver.pipeLeft(("u1", "click2", ts(3000L)))
      assert(driver.readOutput().map(r => (r._1, r._2)) === Seq(("u1", "click2@premium")))
    } finally driver.close()
  }

  test("advanceWallClockTime fires processing-time punctuators deterministically") {
    import org.apache.spark.sql.functions.lit
    import graft.api.{KStream, Rec}
    import graft.streaming.{GraftClock, StatefulOps}
    val clockId = s"ttd_clock_${java.util.UUID.randomUUID()}"
    val driver = new TopologyTestDriver[String, String, String, String](
      spark,
      s => {
        val ds = StatefulOps.suppressUntilTimeLimitClocked(
          s, delayMs = 600L, GraftClock.ManualClock(clockId))
        new KStream[String, String](ds.toDF(Rec.KeyCol, Rec.ValueCol)
          .withColumn(Rec.TsCol, lit(new java.sql.Timestamp(0L))))
      },
      OutputMode.Append,
      wallClockId = Some(clockId))
    try {
      driver.pipe(("A", "v1", ts(1000L)), ("A", "v2", ts(2000L)))
      // real time passes (heartbeat batches run) but the manual clock
      // hasn't moved: the buffer must keep holding
      Thread.sleep(400L)
      assert(driver.readOutput().isEmpty, "emitted without a clock advance")
      driver.advanceWallClockTime(300L) // 300 < 600: still holding
      assert(driver.readOutput().isEmpty, "emitted before the time limit")
      driver.advanceWallClockTime(400L) // 700 >= 600: timer must fire now
      val deadline = System.currentTimeMillis() + 15000L
      var got = driver.readOutput()
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(50L)
        got = driver.readOutput()
      }
      assert(got.map(r => (r._1, r._2)) === Seq(("A", "v2")))
    } finally {
      driver.close()
      GraftClock.remove(clockId)
    }
  }

  test("stateful count topology accumulates across pipes (update mode)") {
    val driver = new TopologyTestDriver[String, Long, String, Long](
      spark,
      s => s.groupByKey.count().toStream,
      OutputMode.Update)
    try {
      driver.pipe(("a", 1L, ts(1000L)), ("a", 1L, ts(2000L)), ("b", 1L, ts(1500L)))
      driver.pipe(("a", 1L, ts(3000L)))
      assert(driver.readTable() === Map("a" -> 3L, "b" -> 1L))
    } finally driver.close()
  }
}
