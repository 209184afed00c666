package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Streaming KGroupedTable: incremental adder/subtractor aggregation over
  * a live changelog — re-keys and tombstones must retract in-flight
  * (`KTableAggregateTest` update sequences, now across micro-batches). */
class StreamingChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KTable.groupBy on a LIVE changelog feeds the columnar delta surface") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val table = GraftStreams(spark)
      .table[String, Long](mem.toDF(), $"_1", $"_2", $"_3")
    // the SAME KGroupedTable API a batch caller uses, now streaming:
    // re-key each user's balance under its parity and sum incrementally
    val sums = table
      .groupBy((user, cents) => (if (cents % 2 == 0) "even" else "odd", cents))
      .aggExpr(("total", col("value"), -col("value")))
    val q = sums.writeStream.format("memory").queryName("stgb")
      .outputMode(OutputMode.Update).start()
    def state(): Map[String, Long] = {
      val rows = spark.table("stgb").collect()
      rows.zipWithIndex.groupBy(_._1.getString(0))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getLong(1) }
    }
    try {
      mem.addData(("u1", 10L, ts(1000L)), ("u2", 3L, ts(1000L)))
      q.processAllAvailable()
      assert(state() === Map("even" -> 10L, "odd" -> 3L))
      // u1's update moves it from even to odd: even retracts, odd adds
      mem.addData(("u1", 7L, ts(2000L)))
      q.processAllAvailable()
      assert(state() === Map("even" -> 0L, "odd" -> 10L))
    } finally q.stop()
  }

  test("streaming groupBy.count subtracts on re-key and delete across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val changelog = GraftStreams(spark)
      .stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    val counts = StreamingChangelog.groupByCount(changelog)((user, region) => region)
    val q = counts.writeStream.format("memory").queryName("sccounts")
      .outputMode(OutputMode.Update).start()

    def state(): Map[String, Long] = {
      // update-mode memory sink: last emission per key is current
      val rows = spark.table("sccounts").collect()
      rows.zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getLong(1) }
    }

    try {
      mem.addData(("u1", "eu", ts(1000L)), ("u2", "eu", ts(2000L)))
      q.processAllAvailable()
      assert(state() === Map("eu" -> 2L))

      // u1 re-keys eu -> us in a LATER batch: eu must decrement
      mem.addData(("u1", "us", ts(3000L)))
      q.processAllAvailable()
      assert(state() === Map("eu" -> 1L, "us" -> 1L))

      // tombstone u2: eu drops to 0
      mem.addData(("u2", null.asInstanceOf[String], ts(4000L)))
      q.processAllAvailable()
      assert(state() === Map("eu" -> 0L, "us" -> 1L))
    } finally q.stop()
  }

  test("streaming groupBy.aggregate applies adder/subtractor incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val changelog = GraftStreams(spark)
      .stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
    // group by value parity; aggregate = sum of values
    val sums = StreamingChangelog.groupByAggregate[String, Int, Int, Int, Int](
      changelog)((k, v) => (v % 2, v))(0)(
      (_, v, acc) => acc + v, (_, v, acc) => acc - v, _ + _)
    val q = sums.writeStream.format("memory").queryName("scsums")
      .outputMode(OutputMode.Update).start()
    def state(): Map[Int, Int] = {
      val rows = spark.table("scsums").collect()
      rows.zipWithIndex.groupBy(_._1.getInt(0))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getInt(1) }
    }
    try {
      mem.addData(("a", 4, ts(1000L)), ("b", 3, ts(1000L)))
      q.processAllAvailable()
      assert(state() === Map(0 -> 4, 1 -> 3))

      // a: 4 -> 5 moves it from the even group to the odd group
      mem.addData(("a", 5, ts(2000L)))
      q.processAllAvailable()
      assert(state() === Map(0 -> 0, 1 -> 8))
    } finally q.stop()
  }
}
