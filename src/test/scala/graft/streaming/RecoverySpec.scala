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
}
