package graft.api

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark
import graft.TestSpark.ts

/** `SlidingWindows` semantics vs a brute-force model, mirroring
  * `KStreamSlidingWindowAggregateTest` (reference
  * `streams/src/test/java/.../internals/KStreamSlidingWindowAggregateTest.java`):
  * the final table has one window per record timestamp (ending there) plus
  * each non-empty window opening just after a record, counted exactly over
  * the trailing interval.
  */
class SlidingWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SizeMs = 10L

  /** Brute-force model over (key, tsMs): expected (key, windowEndMs, count)
    * for window (end-size, end]. */
  private def model(recs: Seq[(String, Long)]): Set[(String, Long, Long)] = {
    val byKey = recs.groupBy(_._1)
    byKey.flatMap { case (k, rs) =>
      val times = rs.map(_._2)
      val ends = (times ++ times.map(_ + SizeMs)).distinct
      ends.flatMap { e =>
        val n = times.count(t => t > e - SizeMs && t <= e)
        if (n > 0) Some((k, e, n.toLong)) else None
      }
    }.toSet
  }

  private def run(recs: Seq[(String, Long)]): Set[(String, Long, Long)] = {
    val ds = spark.createDataset(recs.map { case (k, t) => (k, 0, ts(t)) })
    GraftStreams(spark).stream[String, Int](ds)
      .groupByKey
      .windowedBy(SlidingWindows(SizeMs, 0L))
      .count()
      .toDataset.collect()
      .map { case (w, n, _) => (w.key, w.end.getTime, n) }
      .toSet
  }

  test("per-record trailing windows match brute force (KStreamSlidingWindowAggregateTest)") {
    val recs = Seq(("A", 10L), ("A", 14L), ("A", 15L), ("A", 22L), ("A", 26L),
      ("B", 50L), ("B", 73L))
    assert(run(recs) === model(recs))
  }

  test("right window opening after a record appears only when non-empty") {
    // lone record: only its left window exists (right window would be empty)
    val lone = run(Seq(("A", 100L)))
    assert(lone === Set(("A", 100L, 1L)))
    // a follower inside size: the right window of the first record is the
    // window ending at first+size IF a record falls in it
    val pair = run(Seq(("A", 100L), ("A", 105L)))
    assert(pair === model(Seq(("A", 100L), ("A", 105L))))
    assert(pair.contains(("A", 110L, 1L))) // right window of the 100ms record
  }

  test("duplicate timestamps collapse into one window with peer counts") {
    val recs = Seq(("A", 10L), ("A", 10L), ("A", 12L))
    assert(run(recs) === model(recs))
  }

  test("streaming twin emits each finalized window once, matching the batch model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, Timestamp)]
    val out = graft.streaming.StatefulOps.slidingCountStream[String, Int](
      GraftStreams(spark).stream[String, Int](mem.toDF(),
        org.apache.spark.sql.functions.col("_1"),
        org.apache.spark.sql.functions.col("_2"),
        org.apache.spark.sql.functions.col("_3")),
      sizeMs = SizeMs, graceMs = 0L)
    val q = out.toDF("key", "window_end", "cnt").writeStream
      .format("memory").queryName("slidemem").start()
    val recs = Seq(("A", 10L), ("A", 14L), ("A", 22L), ("B", 50L))
    try {
      mem.addData(recs.map { case (k, t) => (k, 0, ts(t)) }: _*)
      q.processAllAvailable()
      // flush: a far-future record advances the watermark past every end
      mem.addData(("Z", 0, ts(100000L)))
      q.processAllAvailable()
      mem.addData(("Z", 0, ts(200000L)))
      q.processAllAvailable()
      val got = spark.table("slidemem").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .filter(_._1 != "Z").toSeq
      // exactly-once: no duplicate (key, end) emissions
      assert(got.size === got.map(x => (x._1, x._2)).distinct.size)
      assert(got.toSet === model(recs))
    } finally q.stop()
  }

  test("random streams match brute force (property)") {
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.oneOf("A", "B", "C"), Gen.choose(0L, 60L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(gen) { recs => run(recs) == model(recs) })
    assert(res.passed, res.status.toString)
  }
}
