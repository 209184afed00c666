package graft.api

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Keyed parquet upsert sink: the queryable materialized-table view
  * (IQ over files — `QueryableStateIntegrationTest` via storage). */
class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming table upserts and deletes materialize in the parquet view") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-upsert").toString + "/view"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val table = GraftStreams(spark)
      .table[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    // latest-per-key over the raw changelog keeps tombstones visible as
    // null values for the sink's delete handling
    val view = new KTable[String, String](
      table.df.groupBy($"key")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"value", $"ts"), $"ts").as("m"))
        .select($"key", $"m.value".as("value"), $"m.ts".as("ts")),
      deduped = true)

    val q = GraftSinks.upsertParquet(view, path, ckpt)
    try {
      mem.addData(("k1", "v1", ts(1000L)), ("k2", "w1", ts(1000L)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(after1 === Map("k1" -> "v1", "k2" -> "w1"))

      mem.addData(("k1", "v2", ts(2000L))) // update
      mem.addData(("k2", null.asInstanceOf[String], ts(3000L))) // delete
      q.processAllAvailable()
      val after2 = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(after2 === Map("k1" -> "v2")) // upserted + deleted
    } finally q.stop()
  }
}
