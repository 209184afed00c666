package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.{GraftStreams, TimeWindows}

/** Streaming trending top-k: tumbling windowed counts finalized by
  * suppress(untilWindowCloses), then a per-window leaderboard rank in
  * foreachBatch — correct because append-mode emission releases ALL of a
  * window's rows in the same micro-batch (so the in-batch rank sees the
  * complete window). The per-batch leaderboard accumulates into a
  * queryable view. */
class TrendingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-window leaderboard from finalized windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val b = GraftStreams(spark)
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]

    val finals = b.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey
      .windowedBy(TimeWindows.of(Duration.ofSeconds(10)).grace(Duration.ZERO))
      .count()
      .suppressFinal()

    spark.sql("DROP TABLE IF EXISTS trending")
    spark.sql("CREATE TABLE trending (win BIGINT, item STRING, cnt BIGINT, rnk INT) USING parquet")
    val q = finals.toStream.toDF.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("win").orderBy(col("cnt").desc, col("item"))
        batch.select(
            col("key.start").cast("long").as("win"),
            col("key.key").as("item"),
            col("value").as("cnt"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .write.mode("append").saveAsTable("trending")
      }
      .start()
    try {
      // window [0,10s): a=3, b=2, c=1 — top-2 = a, b
      mem.addData(
        ("a", 1, ts(1000L)), ("a", 1, ts(2000L)), ("a", 1, ts(3000L)),
        ("b", 1, ts(4000L)), ("b", 1, ts(5000L)), ("c", 1, ts(6000L)))
      q.processAllAvailable()
      // window [10s,20s): b=2, c=1; the 30s record closes both windows
      mem.addData(("b", 1, ts(11000L)), ("b", 1, ts(12000L)), ("c", 1, ts(13000L)))
      q.processAllAvailable()
      mem.addData(("z", 1, ts(30000L)))
      q.processAllAvailable()

      val got = spark.table("trending")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet
      // win = epoch seconds of the window start
      assert(got === Set(
        (0L, "a", 3L, 1), (0L, "b", 2L, 2),
        (10L, "b", 2L, 1), (10L, "c", 1L, 2)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS trending")
    }
  }
}
