package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Interactive queries over running state
  * (`QueryableStateIntegrationTest.java` analogue). */
class QueryableStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("memory store serves get/range/all over a live update-mode view") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val counts = GraftStreams(spark)
      .stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey.count()
    val q = counts.df.writeStream.format("memory").queryName("iqcounts")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("a", 1, ts(1000L)), ("b", 1, ts(1000L)), ("c", 1, ts(1000L)))
      q.processAllAvailable()
      mem.addData(("a", 1, ts(2000L)))
      q.processAllAvailable()

      val store = QueryableState.memoryStore(spark, "iqcounts", "key")
      assert(store.get("a").map(_.getLong(1)) === Some(2L)) // latest update wins
      assert(store.get("zzz") === None)
      assert(store.range("a", "b").map(_.getString(0)).toSeq === Seq("a", "b"))
      assert(store.all().map(_.getString(0)).toSeq === Seq("a", "b", "c"))
      assert(store.approximateNumEntries() === 3L)
    } finally q.stop()
  }

  test("window store serves fetch/fetchRange/all over a windowed view") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val counts = mem.toDF().toDF("k", "v", "ts")
      .groupBy(window(col("ts"), "10 seconds"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("k"), col("window.start").as("wstart"), col("cnt"))
    val q = counts.writeStream.format("memory").queryName("iqwin")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("a", 1, ts(1000L)), ("a", 1, ts(2000L)), ("b", 1, ts(1000L)))
      q.processAllAvailable()
      mem.addData(("a", 1, ts(15000L))) // next window
      q.processAllAvailable()

      val store = QueryableState.memoryWindowStore(spark, "iqwin", "k", "wstart")
      val aAll = store.fetch("a", ts(0L), ts(60000L))
      assert(aAll.map(r => (r.getTimestamp(1).getTime, r.getLong(2))).toSeq ===
        Seq((0L, 2L), (10000L, 1L))) // time-ascending, latest count per window
      val aFirst = store.fetch("a", ts(0L), ts(9000L))
      assert(aFirst.map(_.getLong(2)).toSeq === Seq(2L))
      val range = store.fetchRange("a", "b", ts(0L), ts(60000L))
      assert(range.map(r => (r.getString(0), r.getTimestamp(1).getTime)).toSeq ===
        Seq(("a", 0L), ("a", 10000L), ("b", 0L)))
      assert(store.all().length === 3)
    } finally q.stop()
  }

  test("session store serves fetch/findSessions over a session-windowed view") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    // session streaming aggs require append mode (final sessions after
    // the watermark) — the suppressFinal path
    val sessions = GraftStreams(spark)
      .stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey
      .windowedBy(graft.api.SessionWindows.`with`(java.time.Duration.ofSeconds(10))
        .grace(java.time.Duration.ZERO))
      .reduce(_ + _)
    val q = sessions.df
      .select(col("key.key").as("k"), col("key.start").as("s"),
        col("key.end").as("e"), col("value").as("total"))
      .writeStream.format("memory").queryName("iqsess")
      .outputMode(OutputMode.Append).start()
    try {
      // two separated sessions for "a" (gap > 10s), one for "b"
      mem.addData(("a", 1, ts(1000L)), ("a", 2, ts(3000L)),
        ("a", 5, ts(60000L)), ("b", 7, ts(1000L)))
      q.processAllAvailable()
      // advance the watermark far enough to close and emit every session
      mem.addData(("wm", 0, ts(10L * 60 * 1000)))
      q.processAllAvailable()
      val store = QueryableState.memorySessionStore(spark, "iqsess", "k", "s", "e")
      val aSessions = store.fetch("a")
      assert(aSessions.map(_.getInt(3)).toSeq === Seq(3, 5)) // merged then separate
      val early = store.findSessions("a", ts(0L), ts(5000L))
      assert(early.map(_.getInt(3)).toSeq === Seq(3)) // only the overlapping session
      assert(store.fetch("b").map(_.getInt(3)).toSeq === Seq(7))
    } finally q.stop()
  }

  test("state store data source reads operator state from a checkpoint") {
    val inDir = Files.createTempDirectory("graft-iq-in").toFile
    val ckpt = Files.createTempDirectory("graft-iq-ckpt").toFile.getAbsolutePath
    Files.writeString(new java.io.File(inDir, "a.txt").toPath, "x\nx\ny\n")
    val q = spark.readStream.text(inDir.getAbsolutePath)
      .groupBy("value").count()
      .writeStream.format("memory").queryName("iqsrc")
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Update).start()
    try q.processAllAvailable() finally q.stop()

    val state = QueryableState.fromCheckpoint(spark, ckpt)
    val rows = state.select(col("key.value").as("k"), col("value.count").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows === Map("x" -> 2L, "y" -> 1L))
  }
}
