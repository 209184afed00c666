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

  test("random streams match brute force (property)") {
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.oneOf("A", "B", "C"), Gen.choose(0L, 60L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(gen) { recs => run(recs) == model(recs) })
    assert(res.passed, res.status.toString)
  }
}
