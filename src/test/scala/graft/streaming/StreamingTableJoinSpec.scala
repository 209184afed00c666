package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Streaming symmetric table-table join: updates on either side re-emit
  * the joined value; tombstones retract
  * (`TableTableJoinIntegrationTest.java` update sequences). */
class StreamingTableJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("updates on either side re-emit; tombstone retracts (inner)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")

    val joined = StreamingTableJoin.innerJoin(l, r)(_ + "+" + _)
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttjoin")
      .outputMode(OutputMode.Update).start()

    def emitted(): Seq[(String, Option[String])] =
      spark.table("ttjoin").collect().map(row =>
        (row.getString(0), Option(row.getString(1)))).toSeq

    try {
      lMem.addData(("k1", "L1", ts(1000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", None)) // right side missing: no join row

      rMem.addData(("k1", "R1", ts(2000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", Some("L1+R1"))) // right update joins

      lMem.addData(("k1", "L2", ts(3000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", Some("L2+R1"))) // left update re-emits

      lMem.addData(("k1", null.asInstanceOf[String], ts(4000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", None)) // tombstone retracts the key
    } finally q.stop()
  }

  test("left join emits as soon as left exists, tracks right arrival") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")

    val joined = StreamingTableJoin.leftJoin(l, r)((lv, rv) => lv + "+" + rv.getOrElse("null"))
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttleft")
      .outputMode(OutputMode.Update).start()
    try {
      lMem.addData(("a", "L1", ts(1000L)))
      q.processAllAvailable()
      rMem.addData(("a", "R1", ts(2000L)))
      q.processAllAvailable()
      val vals = spark.table("ttleft").collect().map(r0 => Option(r0.getString(1))).toSeq
      assert(vals === Seq(Some("L1+null"), Some("L1+R1")))
    } finally q.stop()
  }

  test("within-batch updates apply in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")
    val joined = StreamingTableJoin.innerJoin(l, r)(_ + "+" + _)
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttorder")
      .outputMode(OutputMode.Update).start()
    try {
      rMem.addData(("x", "R", ts(500L)))
      // both L-updates in ONE batch, out of insertion order
      lMem.addData(("x", "L-new", ts(3000L)), ("x", "L-old", ts(1000L)))
      q.processAllAvailable()
      val last = spark.table("ttorder").collect().map(r0 => Option(r0.getString(1))).last
      assert(last === Some("L-new+R")) // latest-ts update wins, not last-seen
    } finally q.stop()
  }
}
