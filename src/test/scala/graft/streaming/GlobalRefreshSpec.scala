package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** GlobalKTable continuous refresh — the reference's GlobalStreamThread
  * keeps the broadcast table current (`processor/internals/
  * GlobalStreamThread.java` + `GlobalStateUpdateTask.java`). Spark
  * mapping: re-read the dimension inside `foreachBatch` (a fresh read per
  * trigger rebuilds the file index, so files written between batches are
  * seen) and broadcast-join the micro-batch against it — each batch joins
  * the dimension AS OF its trigger, which is exactly the reference's
  * lookup-current-value semantics. */
class GlobalRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch re-read joins each batch against the current dim version") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dimDir = Files.createTempDirectory("graft-dim").toFile.getAbsolutePath
    def writeDim(rows: Seq[(String, String)]): Unit =
      rows.toDF("k", "seg").coalesce(1).write.mode("overwrite").parquet(dimDir)

    val mem = MemoryStream[(String, String)]
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir) // fresh index per trigger
        batch.join(broadcast(dim), "k")
          .select("v", "seg").collect()
          .foreach(r => emitted.add((r.getString(0), r.getString(1))))
      }
      .start()
    try {
      writeDim(Seq("c1" -> "gold"))
      mem.addData(("c1", "e1"))
      q.processAllAvailable()
      assert(emitted.toArray.toSet === Set("e1" -> "gold"))

      // dim updates BETWEEN batches; the next batch must see the new value
      writeDim(Seq("c1" -> "platinum"))
      mem.addData(("c1", "e2"))
      q.processAllAvailable()
      assert(emitted.toArray.toSet === Set("e1" -> "gold", "e2" -> "platinum"))
    } finally q.stop()
  }
}
