package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Cogroup (KIP-150 `CogroupedKStream`): several streams, one accumulator
  * per key, each stream's own aggregator, event-time fold order. */
class CogroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  test("three heterogeneous streams fold into one accumulator per key") {
    // clicks: Long counts; names: String concat; scores: Double sum — all
    // into a (Long, String, Double) accumulator
    val clicks = builder.stream(spark.createDataset(Seq(
      ("u1", 1L, ts(1000L)), ("u1", 1L, ts(3000L)), ("u2", 1L, ts(1000L))))).groupByKey
    val names = builder.stream(spark.createDataset(Seq(
      ("u1", "a", ts(2000L)), ("u1", "b", ts(4000L))))).groupByKey
    val scores = builder.stream(spark.createDataset(Seq(
      ("u2", 2.5, ts(5000L))))).groupByKey

    val table = clicks
      .cogroup[(Long, String, Double)]((_, n, acc) => (acc._1 + n, acc._2, acc._3))
      .cogroup(names)((_, s, acc) => (acc._1, acc._2 + s, acc._3))
      .cogroup(scores)((_, d, acc) => (acc._1, acc._2, acc._3 + d))
      .aggregate((0L, "", 0.0))

    val got = table.toDataset.collect().map(r => (r._1, r._2)).sortBy(_._1)
    // u1 folds click(1s), name a(2s), click(3s), name b(4s) in ts order
    assert(got === Seq(("u1", (2L, "ab", 0.0)), ("u2", (1L, "", 2.5))))
  }

  test("fold applies strictly in event-time order across streams") {
    // order-sensitive accumulator (string trace) proves cross-stream ordering
    val s1 = builder.stream(spark.createDataset(Seq(
      ("k", "A1", ts(1000L)), ("k", "A3", ts(3000L))))).groupByKey
    val s2 = builder.stream(spark.createDataset(Seq(
      ("k", "B2", ts(2000L)), ("k", "B4", ts(4000L))))).groupByKey
    val table = s1.cogroup[String]((_, v, acc) => acc + v)
      .cogroup(s2)((_, v, acc) => acc + v)
      .aggregate("")
    assert(table.toDataset.collect().head._2 === "A1B2A3B4")
  }

  test("live cogroup folds incrementally across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val aMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val bMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val counts = b.stream[String, Long](aMem.toDF(), $"_1", $"_2", $"_3").groupByKey
    val tags = b.stream[String, String](bMem.toDF(), $"_1", $"_2", $"_3").groupByKey

    val updates = counts.cogroup[(Long, String)]((_, n, acc) => (acc._1 + n, acc._2))
      .cogroup(tags)((_, s, acc) => (acc._1, acc._2 + s))
      .aggregateUpdates((0L, ""))
    val q = updates.toDF("k", "v", "ts", "seq").writeStream.format("memory")
      .queryName("cgl").outputMode(OutputMode.Update).start()
    try {
      aMem.addData(("u", 2L, ts(1000L)))
      q.processAllAvailable()
      bMem.addData(("u", "x", ts(2000L)))
      q.processAllAvailable()
      aMem.addData(("u", 3L, ts(3000L)))
      q.processAllAvailable()
      val rows = spark.table("cgl").collect()
        .map(r => (r.getLong(3), (r.getStruct(1).getLong(0), r.getStruct(1).getString(1))))
        .sortBy(_._1)
      // state carries across batches: (2,""), (2,"x"), (5,"x")
      assert(rows.map(_._2) === Seq((2L, ""), (2L, "x"), (5L, "x")))
    } finally q.stop()
  }

  test("streaming aggregate returns the refreshed update stream (KTable changelog contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val aMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val bMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val table = b.stream[String, Long](aMem.toDF(), $"_1", $"_2", $"_3").groupByKey
      .cogroup[Long]((_, n, acc) => acc + n)
      .cogroup(b.stream[String, Long](bMem.toDF(), $"_1", $"_2", $"_3").groupByKey)(
        (_, n, acc) => acc + 10 * n)
      .aggregate(0L)
    val q = table.df.writeStream.format("memory").queryName("cgagg")
      .outputMode(OutputMode.Update).start()
    try {
      aMem.addData(("u", 2L, ts(1000L)))
      q.processAllAvailable()
      bMem.addData(("u", 3L, ts(2000L)))
      q.processAllAvailable()
      val rows = spark.table("cgagg").collect()
        .map(r => (r.getLong(1), r.getTimestamp(2).getTime)).sortBy(_._2)
      // one refreshed row per batch; per-key upsert by ts converges to 32
      assert(rows === Seq((2L, 1000L), (32L, 2000L)))
    } finally q.stop()
  }

  test("windowed cogroup folds per (key, window); hopping windows expand") {
    import java.time.Duration
    val s1 = builder.stream(spark.createDataset(Seq(
      ("k", 1L, ts(1000L)), ("k", 2L, ts(11000L))))).groupByKey
    val s2 = builder.stream(spark.createDataset(Seq(
      ("k", "a", ts(2000L)), ("k", "b", ts(12000L))))).groupByKey

    val tumbling = s1.cogroup[(Long, String)]((_, n, acc) => (acc._1 + n, acc._2))
      .cogroup(s2)((_, v, acc) => (acc._1, acc._2 + v))
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)))
      .aggregate((0L, ""))
    val got = tumbling.toDataset.collect()
      .map(r => (r._1.start.getTime, r._2)).sortBy(_._1)
    assert(got === Seq((0L, (1L, "a")), (10000L, (2L, "b"))))

    // hopping 10s/5s: the 2s record lands in windows [-5,5) and [0,10)...
    val hopping = s1.cogroup[Long]((_, n, acc) => acc + n)
      .cogroup(s2)((_, _, acc) => acc)
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)).advanceBy(Duration.ofSeconds(5)))
      .aggregate(0L)
    val starts = hopping.toDataset.collect()
      .filter(_._2 > 0).map(r => (r._1.start.getTime, r._2)).sortBy(_._1)
    // 1s record covers windows starting -5s,0s; 11s record covers 5s,10s
    assert(starts === Seq((-5000L, 1L), (0L, 1L), (5000L, 2L), (10000L, 2L)))
  }

  test("session cogroup merges sessions across streams via the Merger") {
    import java.time.Duration
    // gap 5s: records at 1s,3s (either stream) merge; 20s starts a new one
    val s1 = builder.stream(spark.createDataset(Seq(
      ("k", 1L, ts(1000L)), ("k", 10L, ts(20000L))))).groupByKey
    val s2 = builder.stream(spark.createDataset(Seq(
      ("k", 100L, ts(3000L))))).groupByKey
    val table = s1.cogroup[Long]((_, v, acc) => acc + v)
      .cogroup(s2)((_, v, acc) => acc + v)
      .windowedBy(SessionWindows.`with`(Duration.ofSeconds(5)))
      .aggregate(0L)(_ + _)
    val got = table.toDataset.collect()
      .map(r => (r._1.start.getTime, r._2)).sortBy(_._1)
    assert(got === Seq((1000L, 101L), (20000L, 10L)))
  }

  test("live windowed cogroup: hopping windows fold incrementally across batches") {
    import java.time.Duration
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val aMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val bMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val s1 = b.stream[String, Long](aMem.toDF(), $"_1", $"_2", $"_3").groupByKey
    val s2 = b.stream[String, Long](bMem.toDF(), $"_1", $"_2", $"_3").groupByKey
    val updates = s1.cogroup[Long]((_, n, acc) => acc + n)
      .cogroup(s2)((_, n, acc) => acc + n)
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)).advanceBy(Duration.ofSeconds(5)))
      .aggregateUpdates(0L)
    val q = updates.toDF("wk", "v", "ts", "seq").writeStream.format("memory")
      .queryName("cgwl").outputMode(OutputMode.Update).start()
    try {
      aMem.addData(("k", 1L, ts(1000L))) // windows starting -5s and 0s
      q.processAllAvailable()
      bMem.addData(("k", 10L, ts(6000L))) // windows starting 0s and 5s
      q.processAllAvailable()
      val finalPerWindow = spark.table("cgwl").collect()
        .map(r => (r.getStruct(0).getTimestamp(1).getTime, r.getLong(1), r.getLong(3)))
        .groupBy(_._1).map { case (w, rows) => (w, rows.maxBy(_._3)._2) }.toSeq.sortBy(_._1)
      // window 0s saw BOTH records, folded across two batches
      assert(finalPerWindow === Seq((-5000L, 1L), (0L, 11L), (5000L, 10L)))
    } finally q.stop()
  }

  test("live windowed cogroup evicts closed windows; late records are dropped") {
    import java.time.Duration
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val aMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val bMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val updates = b.stream[String, Long](aMem.toDF(), $"_1", $"_2", $"_3").groupByKey
      .cogroup[Long]((_, n, acc) => acc + n)
      .cogroup(b.stream[String, Long](bMem.toDF(), $"_1", $"_2", $"_3").groupByKey)(
        (_, n, acc) => acc + n)
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)))
      .aggregateUpdates(0L)
    val q = updates.toDF("wk", "v", "ts", "seq").writeStream.format("memory")
      .queryName("cgev").outputMode(OutputMode.Update).start()
    def window0Rows() = spark.table("cgev").collect()
      .filter(_.getStruct(0).getTimestamp(1).getTime == 0L)
    try {
      aMem.addData(("k", 1L, ts(1000L)))
      q.processAllAvailable()
      assert(window0Rows().map(_.getLong(1)).toSeq === Seq(1L))
      // advance the watermark far past window [0s,10s); its state evicts
      aMem.addData(("k", 5L, ts(60000L)))
      q.processAllAvailable()
      // a LATE record for the closed window must be dropped — NOT folded
      // into a fresh partial accumulator
      aMem.addData(("k", 9L, ts(2000L)))
      q.processAllAvailable()
      assert(window0Rows().map(_.getLong(1)).toSeq === Seq(1L))
    } finally q.stop()
  }

  test("live windowed cogroup state survives stop + restart from checkpoint") {
    import java.nio.file.Files
    import java.time.Duration
    import org.apache.spark.sql.functions.{col, split, timestamp_millis}
    import org.apache.spark.sql.streaming.OutputMode
    val dirA = Files.createTempDirectory("graft-cgrec-a").toFile
    val dirB = Files.createTempDirectory("graft-cgrec-b").toFile
    val ckpt = Files.createTempDirectory("graft-cgrec-ckpt").toFile.getAbsolutePath
    val b = GraftStreams(spark)

    def src(dir: java.io.File) = spark.readStream.text(dir.getAbsolutePath)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).as("k"), col("p").getItem(1).cast("long").as("n"),
        timestamp_millis(col("p").getItem(2).cast("long")).as("t"))
    def topology() =
      b.stream[String, Long](src(dirA), col("k"), col("n"), col("t")).groupByKey
        .cogroup[Long]((_, n, acc) => acc + n)
        .cogroup(b.stream[String, Long](src(dirB), col("k"), col("n"), col("t")).groupByKey)(
          (_, n, acc) => acc + 100 * n)
        .windowedBy(TimeWindows.of(Duration.ofSeconds(10)))
        .aggregateUpdates(0L)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def start() = topology().toDF("wk", "v", "ts", "seq").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r =>
          emitted.add((r.getStruct(0).getTimestamp(1).getTime, r.getLong(1), r.getLong(3))))
      }
      .start()

    Files.writeString(new java.io.File(dirA, "a.txt").toPath, "k,1,1000\n")
    Files.writeString(new java.io.File(dirB, "b.txt").toPath, "k,2,2000\n")
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted.toArray.map(_.asInstanceOf[(Long, Long, Long)])
        .filter(_._1 == 0L).maxBy(_._3)._2 === 201L)
    } finally q1.stop()

    // restart: the window-0 accumulator continues from the checkpoint
    emitted.clear()
    Files.writeString(new java.io.File(dirA, "c.txt").toPath, "k,5,3000\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emitted.toArray.map(_.asInstanceOf[(Long, Long, Long)])
        .filter(_._1 == 0L).maxBy(_._3)._2 === 206L)
    } finally q2.stop()
  }

  test("single-side session cogroup degenerates to SessionWindowedKStream.aggregate") {
    import java.time.Duration
    import scala.util.Random
    val rnd = new Random(99)
    val data = (1 to 40).map { i =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong, ts(rnd.nextInt(100) * 1000L))
    }
    val w = SessionWindows.`with`(Duration.ofSeconds(7))
    def normalize(t: KTable[Windowed[String], Long]) =
      t.toDataset.collect().map(r => ((r._1.key, r._1.start.getTime, r._1.end.getTime), r._2))
        .sortBy(_._1.toString)

    val grouped = builder.stream(spark.createDataset(data)).groupByKey
    val viaCogroup = grouped.cogroup[Long]((_, v, acc) => acc + v)
      .windowedBy(w).aggregate(0L)(_ + _)
    val viaAggregate = grouped.windowedBy(w)
      .aggregate(0L)((_, v, acc) => acc + v, _ + _)
    assert(normalize(viaCogroup) === normalize(viaAggregate))
  }

  test("table timestamp is the max event time across all streams") {
    val s1 = builder.stream(spark.createDataset(Seq(("k", 1L, ts(1000L))))).groupByKey
    val s2 = builder.stream(spark.createDataset(Seq(("k", 2L, ts(9000L))))).groupByKey
    val table = s1.cogroup[Long]((_, v, acc) => acc + v)
      .cogroup(s2)((_, v, acc) => acc + v)
      .aggregate(0L)
    val row = table.toDataset.collect().head
    assert(row._2 === 3L && row._3 === ts(9000L))
  }
}
