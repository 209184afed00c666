package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, window}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** `KafkaStreams.metrics()` parity: the listener registry folds micro-batch
  * progress into process-rate / records-processed / state-size gauges. */
class GraftMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registry reports records processed, batches, and state rows per query") {
    implicit val sqlCtx = spark.sqlContext
    val m = GraftMetrics.attach(spark)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val counts = mem.toDF().toDF("user_id", "event_type", "ts")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)))
    val q = counts.writeStream.format("noop").queryName("metrics_probe")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, "click", ts(1000L)), (2L, "view", ts(2000L)))
      q.processAllAvailable()
      mem.addData((1L, "click", ts(3000L)))
      q.processAllAvailable()
      // listener delivery is async — poll briefly
      val deadline = System.currentTimeMillis() + 10000L
      def gauges = m.metricsFor("metrics_probe")
      while (gauges.forall(_.recordsProcessedTotal < 3L) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50L)
      val g = gauges.get
      assert(g.recordsProcessedTotal === 3L)
      assert(g.batches >= 2L)
      assert(g.stateRows === 2L, "two distinct (window,user) state rows")
      assert(g.running)
    } finally {
      q.stop()
      GraftMetrics.detach(spark, m)
    }
  }
}
