package graft.api

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connect file source/sink analogue (§2.1:
  * `connect/file/FileStreamSourceTask.java` tails files into a topic,
  * `FileStreamSinkTask.java` writes a topic to files): Structured
  * Streaming's file source tails a directory; file sinks write exactly-once
  * via checkpoint + WAL. */
class FileSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("file source streams appended files through a DSL topology into a sink") {
    val inDir = Files.createTempDirectory("graft-filesrc").toFile
    val builder = GraftStreams(spark)

    Files.writeString(new java.io.File(inDir, "a.txt").toPath, "alpha beta alpha\n")

    val lines = spark.readStream.text(inDir.getAbsolutePath)
    val words = builder
      .stream[String, String](lines, lit("file"), col("value"), current_timestamp())
      .flatMapValues(line => line.trim.split("\\s+").toSeq.filter(_.nonEmpty))
      .selectKey((_, word) => word)
      .groupByKey.count()

    val q = words.df.writeStream.format("memory").queryName("filewords")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got1 = spark.table("filewords").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got1 === Map("alpha" -> 2L, "beta" -> 1L))

      // tail a newly appearing file — the FileStreamSourceTask.poll() loop
      Files.writeString(new java.io.File(inDir, "b.txt").toPath, "beta gamma\n")
      q.processAllAvailable()
      val got2 = spark.table("filewords").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got2 === Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))
    } finally q.stop()
  }

  test("file sink writes a stream to files exactly-once (checkpointed)") {
    val inDir = Files.createTempDirectory("graft-sink-in").toFile
    val outDir = Files.createTempDirectory("graft-sink-out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toFile.getAbsolutePath
    Files.writeString(new java.io.File(inDir, "a.txt").toPath, "r1\nr2\n")

    val q = spark.readStream.text(inDir.getAbsolutePath)
      .writeStream.format("csv")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val written = spark.read.csv(outDir).collect().map(_.getString(0)).sorted
    assert(written === Array("r1", "r2"))
  }
}
