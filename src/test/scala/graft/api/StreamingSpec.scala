package graft.api

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** The same topologies running as Structured Streaming queries —
  * MemoryStream in, memory sink out: our `TopologyTestDriver`
  * (`streams/test-utils/.../TopologyTestDriver.java:383,525`) analogue.
  * Covers incremental emission, watermark-based late-record dropping
  * (grace), and suppression (final results = append mode). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  test("streaming groupByKey.count emits updated counts per batch (emit-on-update)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val counts = builder.stream[String, Int](mem.toDF(),
        $"_1", $"_2", $"_3").groupByKey.count()
    val q = counts.df.writeStream.format("memory").queryName("counts")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("A", 1, ts(1000L)), ("B", 2, ts(2000L)))
      q.processAllAvailable()
      val batch1 = spark.table("counts").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(batch1.toSet === Set(("A", 1L), ("B", 1L)))

      mem.addData(("A", 3, ts(3000L)))
      q.processAllAvailable()
      // update mode re-emits only the changed key
      val all = spark.table("counts").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(all.count(_ == ("A", 2L)) === 1) // A's updated count arrived
      assert(all.toSet.contains(("B", 1L)))
    } finally q.stop()
  }

  test("windowed count with grace drops late records past the watermark (late-record-drop)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val w = TimeWindows.of(Duration.ofSeconds(10)).grace(Duration.ofSeconds(5))
    val counts = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey.windowedBy(w).count()
    val q = counts.df.writeStream.format("memory").queryName("wcounts")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("A", 1, ts(1000L)), ("A", 1, ts(3000L)))
      q.processAllAvailable()
      // advance stream time far beyond window end + grace
      mem.addData(("A", 1, ts(60000L)))
      q.processAllAvailable()
      // this record's window [0,10s) closed at watermark 55s: dropped
      mem.addData(("A", 1, ts(2000L)))
      q.processAllAvailable()
      val got = spark.table("wcounts").collect()
        .map(r => (r.getStruct(0).getTimestamp(1).getTime, r.getLong(1)))
      // window [0,10000) peaked at count 2 — the late record never bumped it to 3
      assert(got.filter(_._1 == 0L).map(_._2).max === 2L)
    } finally q.stop()
  }

  test("suppressed windowed count emits final results only (suppress untilWindowCloses)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val w = TimeWindows.of(Duration.ofSeconds(10)).grace(Duration.ofSeconds(0))
    val counts = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey.windowedBy(w).count().suppressFinal()
    val q = GraftSinks.tableToMemory(counts, "finals")
    try {
      mem.addData(("A", 1, ts(1000L)), ("A", 1, ts(3000L)))
      q.processAllAvailable()
      // window still open: nothing emitted yet (no eager updates)
      assert(spark.table("finals").count() === 0)
      // watermark passes window end -> exactly one final row for [0,10s)
      mem.addData(("A", 1, ts(20000L)))
      q.processAllAvailable()
      val got = spark.table("finals").collect()
        .map(r => (r.getStruct(0).getTimestamp(1).getTime, r.getLong(1)))
      assert(got.toSeq === Seq((0L, 2L)))
    } finally q.stop()
  }

  test("streaming session windows merge across batches with typed reduce") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    // session-window streaming aggs emit final results only (append mode —
    // Spark doesn't support update mode for merging sessions)
    val sessions = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey
      .windowedBy(SessionWindows.`with`(Duration.ofSeconds(10)).grace(Duration.ZERO))
      .reduce(_ + _)
    val q = sessions.df.writeStream.format("memory").queryName("ssess")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("A", 1, ts(1000L)))
      q.processAllAvailable()
      // second batch extends the same session (within gap): values fold
      mem.addData(("A", 2, ts(5000L)))
      q.processAllAvailable()
      assert(spark.table("ssess").count() === 0) // session still open
      // watermark passes session end -> final merged session appended
      mem.addData(("Z", 9, ts(60000L)))
      q.processAllAvailable()
      val rows = spark.table("ssess").collect()
        .map(r => (r.getStruct(0).getString(0), r.getInt(1)))
      assert(rows.toSeq === Seq(("A", 3))) // 1+2 merged into one session
    } finally q.stop()
  }

  test("streaming KTable latest-per-key view in update mode (KTableSource)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val table = builder.table[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    val q = table.latestDF.writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("k1", "v1", ts(1000L)), ("k2", "w1", ts(1000L)))
      q.processAllAvailable()
      mem.addData(("k1", "v2", ts(2000L)))
      q.processAllAvailable()
      val rows = spark.table("latest").collect().map(r => (r.getString(0), r.getString(1)))
      // last update emitted for k1 is the new value
      assert(rows.contains(("k1", "v2")))
    } finally q.stop()
  }

  test("streaming left interval join emits watermark-final nulls (KStreamKStreamLeftJoin)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Int, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(Int, String, java.sql.Timestamp)]
    val l = builder.stream[Int, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = builder.stream[Int, String](rMem.toDF(), $"_1", $"_2", $"_3")
    val joined = l.leftJoin(r, JoinWindows.of(Duration.ofSeconds(1)))(
      (v, vo) => v + "+" + vo.getOrElse("null"))
    val q = joined.toDF.writeStream.format("memory").queryName("slj")
      .outputMode(OutputMode.Append).start()
    try {
      lMem.addData((0, "X0", ts(1000L)), (1, "X1", ts(2000L)))
      rMem.addData((0, "Y0", ts(1500L)))
      q.processAllAvailable()
      // advance both watermarks far past the join windows
      lMem.addData((9, "XF", ts(60000L)))
      rMem.addData((9, "YF", ts(60000L)))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("slj").collect().map(r0 => (r0.getInt(0), r0.getString(1))).toSet
      assert(got.contains((0, "X0+Y0"))) // matched pair
      assert(got.contains((1, "X1+null"))) // unmatched left emitted after watermark
    } finally q.stop()
  }

  test("streaming windowed typed reduce folds across batches (Row-adapter path)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val sums = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)))
      .reduce(_ + _)
    val q = sums.df.writeStream.format("memory").queryName("swreduce")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("A", 1, ts(1000L)))
      q.processAllAvailable()
      mem.addData(("A", 2, ts(3000L))) // same window, later batch
      q.processAllAvailable()
      val got = spark.table("swreduce").collect()
        .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getTimestamp(1).getTime,
          r.getInt(1)))
      // state persisted across batches: window [0,10s) folded 1 then 3
      assert(got.toSet === Set(("A", 0L, 1), ("A", 0L, 3)))
    } finally q.stop()
  }

  test("observe surfaces named metrics in streaming progress (metrics parity)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val observed = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .observe("throughput",
        "n" -> org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        "sum_v" -> org.apache.spark.sql.functions.sum($"value"))
    val q = observed.toDF.writeStream.format("memory").queryName("obs")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("A", 1, ts(1000L)), ("B", 2, ts(2000L)))
      q.processAllAvailable()
      val metrics = q.lastProgress.observedMetrics.get("throughput")
      assert(metrics.getAs[Long]("n") === 2L)
      assert(metrics.getAs[Long]("sum_v") === 3L)
    } finally q.stop()
  }

  test("dedupWithinGrace drops duplicate ids across micro-batches (at-least-once mitigation)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val deduped = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .dedupWithinGrace(Seq("key"), graceMs = 60000L)
    val q = deduped.toDF.writeStream.format("memory").queryName("dedupst")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("a", 1, ts(1000L)), ("a", 1, ts(1100L)), ("b", 2, ts(1200L)))
      q.processAllAvailable()
      mem.addData(("a", 1, ts(2000L))) // redelivery in a later batch
      q.processAllAvailable()
      val keys = spark.table("dedupst").collect().map(_.getString(0)).sorted
      assert(keys === Array("a", "b")) // each id delivered once downstream
    } finally q.stop()
  }

  test("streaming stream-static join enriches each micro-batch (KStream⋈KTable)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String, java.sql.Timestamp)]
    val table = builder.table(spark.createDataset(Seq((0, "T0", ts(0L)), (1, "T1", ts(0L)))))
    val joined = builder.stream[Int, String](mem.toDF(), $"_1", $"_2", $"_3")
      .joinTable(table)(_ + "+" + _)
    val q = joined.toDF.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((0, "X0", ts(1000L)), (1, "X1", ts(1000L)), (9, "X9", ts(1000L)))
      q.processAllAvailable()
      val got = spark.table("enriched").collect().map(r => (r.getInt(0), r.getString(1))).sorted
      assert(got === Seq((0, "X0+T0"), (1, "X1+T1"))) // 9 missed -> dropped (inner)
    } finally q.stop()
  }
}
