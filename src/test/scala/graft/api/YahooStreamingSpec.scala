package graft.api

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** The Yahoo streaming benchmark topology (YahooBenchmark.java:268-314)
  * running as an actual Structured Streaming query end-to-end through the
  * DSL — the §5 "Yahoo-shaped e2e streaming test": filter(view) → project
  * → broadcast campaigns join → key by campaign → 10s tumbling count. */
class YahooStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // grace must cover the cross-batch disorder: with zero grace the first
  // batch's max event time (12s) closes window [0,10s) and the second
  // batch's 5s record is (correctly) dropped as late
  test("yahoo topology streams end-to-end: filter → global join → windowed count") {
    implicit val sqlCtx = spark.sqlContext
    val builder = GraftStreams(spark)
    val campaigns = builder.globalTable[Long, String](
      Seq((0L, "campA"), (1L, "campB")).toDF("ad", "campaign"),
      col("ad"), col("campaign"))

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)] // (adId, eventType, ts)
    val counts = builder.stream[Long, String](mem.toDF(), $"_1", $"_2", $"_3")
      .filter((_, eventType) => eventType == "view")
      .joinGlobal(campaigns)((adId, _) => adId % 2)((_, campaign) => campaign)
      .selectKey((_, campaign) => campaign)
      .groupByKey
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)).grace(Duration.ofSeconds(60)))
      .count()

    val q = counts.df.writeStream.format("memory").queryName("yahoo_stream")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(
        (0L, "view", ts(1000L)), (1L, "view", ts(2000L)), (2L, "view", ts(3000L)),
        (0L, "click", ts(4000L)), // filtered out
        (3L, "view", ts(12000L))) // second window
      q.processAllAvailable()
      val got = spark.table("yahoo_stream").collect()
        .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getTimestamp(1).getTime,
          r.getLong(1))).toSet
      assert(got === Set(
        ("campA", 0L, 2L), // ads 0,2 in window [0,10s)
        ("campB", 0L, 1L), // ad 1
        ("campB", 10000L, 1L))) // ad 3 in window [10,20s)

      // incremental update: another view for campA in the first window
      mem.addData((2L, "view", ts(5000L)))
      q.processAllAvailable()
      val updated = spark.table("yahoo_stream").collect()
        .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getTimestamp(1).getTime,
          r.getLong(1)))
      assert(updated.contains(("campA", 0L, 3L)))
    } finally q.stop()
  }
}
