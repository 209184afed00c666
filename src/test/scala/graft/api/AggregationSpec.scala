package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.ts

/** Grouped and windowed aggregation semantics, mirroring
  * `KStreamAggregateTest` / `KStreamWindowAggregateTest` /
  * `KStreamSessionWindowAggregateTest` (FIXTURES.md §A.3). */
class AggregationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  // A: 3 records, B: 2, C: 1 — timestamps chosen so windows split at 10s
  private def input: KStream[String, Int] = builder.stream(
    spark.createDataset(Seq(
      ("A", 1, ts(1000L)), ("B", 2, ts(2000L)), ("A", 3, ts(3000L)),
      ("C", 4, ts(11000L)), ("A", 5, ts(12000L)), ("B", 6, ts(13000L)))))

  test("groupByKey.count (KGroupedStream.count)") {
    val got = input.groupByKey.count().toDataset.collect()
      .map(r => (r._1, r._2)).sortBy(_._1)
    assert(got === Seq(("A", 3L), ("B", 2L), ("C", 1L)))
  }

  test("groupByKey.reduce folds values (KStreamReduceTest)") {
    val got = input.groupByKey.reduce(_ + _).toDataset.collect()
      .map(r => (r._1, r._2)).sortBy(_._1)
    assert(got === Seq(("A", 9), ("B", 8), ("C", 4)))
  }

  test("groupByKey.aggregate with initializer + aggregator + merger (KStreamAggregateTest)") {
    val got = input.groupByKey
      .aggregate("0")((k, v, agg) => agg + "+" + v, (a, b) => a + b.drop(1))
      .toDataset.collect().map(r => (r._1, r._2)).toMap
    // partial-agg merge order across partitions is not fixed; assert the
    // folded element set (reference asserts exact order — single-threaded)
    def parts(s: String) = s.split("\\+").toSet - "0"
    assert(parts(got("A")) === Set("1", "3", "5"))
    assert(parts(got("B")) === Set("2", "6"))
    assert(parts(got("C")) === Set("4"))
  }

  test("aggregateOrdered folds in event-time order (reference log-order fold)") {
    val got = input.groupByKey
      .aggregateOrdered("0")((_, v, agg) => agg + "+" + v)
      .toDataset.collect().map(r => (r._1, r._2)).toMap
    // exact order now guaranteed, like the reference's single-threaded trace
    assert(got === Map("A" -> "0+1+3+5", "B" -> "0+2+6", "C" -> "0+4"))
  }

  test("groupBy re-keys before aggregating (repartition semantics)") {
    val got = input.groupBy((_, v) => v % 2).count().toDataset.collect()
      .map(r => (r._1, r._2)).sortBy(_._1)
    assert(got === Seq((0, 3L), (1, 3L))) // evens: 2,4,6; odds: 1,3,5
  }

  test("tumbling window count splits at window boundaries (KStreamWindowAggregateTest)") {
    val got = input.groupByKey.windowedBy(TimeWindows.of(java.time.Duration.ofSeconds(10)))
      .count().toDataset.collect()
      .map(r => (r._1.key, r._1.start.getTime, r._1.end.getTime, r._2))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      ("A", 0L, 10000L, 2L), ("A", 10000L, 20000L, 1L),
      ("B", 0L, 10000L, 1L), ("B", 10000L, 20000L, 1L),
      ("C", 10000L, 20000L, 1L)))
  }

  test("hopping windows assign each record to size/advance windows") {
    val w = TimeWindows.of(java.time.Duration.ofSeconds(10))
      .advanceBy(java.time.Duration.ofSeconds(5))
    val got = input.groupByKey.windowedBy(w).count().toDataset.collect()
      .map(r => (r._1.key, r._1.start.getTime, r._2)).sortBy(t => (t._1, t._2))
    // A@1s,3s -> windows [-5,5) [0,10); A@12s -> [5,15) [10,20)
    assert(got.filter(_._1 == "A") === Seq(
      ("A", -5000L, 2L), ("A", 0L, 2L), ("A", 5000L, 1L), ("A", 10000L, 1L)))
  }

  test("windowed reduce concatenates within window") {
    val got = input.mapValues(_.toString).groupByKey
      .windowedBy(TimeWindows.of(java.time.Duration.ofSeconds(10)))
      .reduce(_ + _)
      .toDataset.collect().map(r => (r._1.key, r._1.start.getTime, r._2))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      ("A", 0L, "13"), ("A", 10000L, "5"),
      ("B", 0L, "2"), ("B", 10000L, "6"), ("C", 10000L, "4")))
  }

  test("session windows merge within gap, split beyond it (KStreamSessionWindowAggregateTest)") {
    // A at 1s,3s (one session, gap 5s), A at 12s (new session)
    val got = input.groupByKey
      .windowedBy(SessionWindows.`with`(java.time.Duration.ofSeconds(5)))
      .count().toDataset.collect()
      .map(r => (r._1.key, r._1.start.getTime, r._2)).sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == "A") === Seq(("A", 1000L, 2L), ("A", 12000L, 1L)))
    assert(got.filter(_._1 == "C") === Seq(("C", 11000L, 1L)))
  }

  test("typed session reduce folds within merged sessions (session Merger)") {
    val got = input.groupByKey
      .windowedBy(SessionWindows.`with`(java.time.Duration.ofSeconds(5)))
      .reduce(_ + _)
      .toDataset.collect()
      .map(r => (r._1.key, r._1.start.getTime, r._2)).sortBy(t => (t._1, t._2))
    // A: 1s(1) + 3s(3) merge into one session => 4; 12s(5) alone
    assert(got.filter(_._1 == "A") === Seq(("A", 1000L, 4), ("A", 12000L, 5)))
    assert(got.filter(_._1 == "B") === Seq(("B", 2000L, 2), ("B", 13000L, 6)))
  }

  test("typed session aggregate with initializer and merger") {
    val got = input.groupByKey
      .windowedBy(SessionWindows.`with`(java.time.Duration.ofSeconds(5)))
      .aggregate(0)((_, v, agg) => agg + v, _ + _)
      .toDataset.collect()
      .map(r => (r._1.key, r._1.start.getTime, r._2)).sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == "C") === Seq(("C", 11000L, 4)))
  }

  test("columnar aggExpr fast path") {
    import org.apache.spark.sql.functions._
    val got = input.groupByKey.aggExpr(
      "n" -> count(lit(1)), "total" -> sum(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq(("A", 3L, 9L), ("B", 2L, 8L), ("C", 1L, 4L)))
  }
}
