package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.GraftStreams

/** Fault tolerance: state must survive a query restart from checkpoint —
  * the Structured Streaming analogue of the reference's changelog-topic
  * restore (`processor/internals/StoreChangelogReader.java`,
  * `RestoreIntegrationTest.java`). */
class RecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouped count state survives stop + restart from checkpoint") {
    val inDir = Files.createTempDirectory("graft-rec-in").toFile
    val ckpt = Files.createTempDirectory("graft-rec-ckpt").toFile.getAbsolutePath
    val builder = GraftStreams(spark)

    def topology() = builder
      .stream[String, String](
        spark.readStream.text(inDir.getAbsolutePath),
        col("value"), col("value"), current_timestamp())
      .groupByKey.count()

    // foreachBatch sink: checkpoint-recoverable (memory sink is not)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def start() = topology().df.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => emitted.add((r.getString(0), r.getLong(1))))
      }
      .start()

    Files.writeString(new java.io.File(inDir, "a.txt").toPath, "x\nx\ny\n")
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted.toArray.toSet === Set(("x", 2L), ("y", 1L)))
    } finally q1.stop()

    // crash/restart: a NEW query instance over the same checkpoint
    emitted.clear()
    Files.writeString(new java.io.File(inDir, "b.txt").toPath, "x\nz\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      // counts CONTINUE from restored state: x was 2, becomes 3
      assert(emitted.toArray.toSet === Set(("x", 3L), ("z", 1L)))
    } finally q2.stop()
  }

  test("sliding-window buffer + emitted-frontier survive restart (no dup, no loss)") {
    import graft.TestSpark.ts
    val inDir = Files.createTempDirectory("graft-slrec-in").toFile
    val ckpt = Files.createTempDirectory("graft-slrec-ckpt").toFile.getAbsolutePath

    // parse "key,tsMs" lines so event time replays deterministically
    def topology() = StatefulOps.slidingCountStream[String, Long](
      GraftStreams(spark).stream[String, Long](
        spark.readStream.text(inDir.getAbsolutePath)
          .select(split(col("value"), ",").as("p"))
          .select(col("p").getItem(0).as("k"), col("p").getItem(1).cast("long").as("t")),
        col("k"), col("t"), timestamp_millis(col("t"))),
      sizeMs = 10L, graceMs = 0L)

    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def start() = topology().toDF("k", "end", "cnt").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r =>
          emitted.add((r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))))
      }
      .start()

    // batch 1: A@10, A@14 — watermark after the batch = 14; nothing final yet
    Files.writeString(new java.io.File(inDir, "a.txt").toPath, "A,10\nA,14\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // restart from checkpoint; A@22 pushes the watermark to 22, finalizing
    // every end <= 22 exactly once across the two query incarnations:
    // 10 -> {10}, 14 -> {10,14}, 20 (right of 10) -> {14}, 22 -> {14,22}
    Files.writeString(new java.io.File(inDir, "b.txt").toPath, "A,22\n")
    val expected = Set(("A", 10L, 1L), ("A", 14L, 2L), ("A", 20L, 1L), ("A", 22L, 2L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // watermark-driven finalization may land in a trailing no-data
      // micro-batch — poll briefly instead of racing it
      val deadline = System.currentTimeMillis() + 15000L
      def got() = emitted.toArray.map(_.asInstanceOf[(String, Long, Long)]).toSeq
      while (got().count(_._2 <= 22L) < expected.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(100L)
      val g = got()
      assert(g.size === g.map(x => (x._1, x._2)).distinct.size, s"dup emissions: $g")
      assert(g.filter(_._2 <= 22L).toSet === expected, g.toString)
    } finally q2.stop()
  }
}
