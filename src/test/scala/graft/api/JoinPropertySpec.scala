package graft.api

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Seeded property tests for interval-join semantics: random event sets
  * and window parameters, checked against a brute-force nested-loop oracle
  * (`KStreamKStreamJoinTest`'s exhaustive permutations, randomized). */
class JoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  private def randomEvents(rnd: Random, n: Int, tag: String): Seq[(Int, String, Long)] =
    (1 to n).map { i =>
      (rnd.nextInt(6), s"$tag$i", rnd.nextInt(100) * 100L)
    }

  private def bruteInner(l: Seq[(Int, String, Long)], r: Seq[(Int, String, Long)],
      before: Long, after: Long): Set[(Int, String)] =
    (for {
      (lk, lv, lt) <- l
      (rk, rv, rt) <- r
      if lk == rk && rt >= lt - before && rt <= lt + after
    } yield (lk, s"$lv+$rv")).toSet

  test("interval join inner/left/outer match the brute-force oracle over 15 random scenarios") {
    val rnd = new Random(2024)
    for (trial <- 1 to 15) {
      val lEvents = randomEvents(rnd, 3 + rnd.nextInt(15), "L")
      val rEvents = randomEvents(rnd, 3 + rnd.nextInt(15), "R")
      val before = rnd.nextInt(3) * 1000L
      val after = rnd.nextInt(3) * 1000L
      val w = JoinWindows(before, after, 0L)

      val l = builder.stream(spark.createDataset(
        lEvents.map { case (k, v, t) => (k, v, ts(t)) }))
      val r = builder.stream(spark.createDataset(
        rEvents.map { case (k, v, t) => (k, v, ts(t)) }))

      val expected = bruteInner(lEvents, rEvents, before, after)

      val inner = l.join(r, w)(_ + "+" + _).toDataset.collect()
        .map(x => (x._1, x._2)).toSet
      assert(inner === expected, s"trial $trial inner w=$w")

      // left join: matched pairs identical; every left event with no match
      // appears exactly once with null marker
      val leftJ = l.leftJoin(r, w)((v, vo) => v + "+" + vo.getOrElse("null"))
        .toDataset.collect().map(x => (x._1, x._2))
      assert(leftJ.filterNot(_._2.endsWith("+null")).toSet === expected, s"trial $trial left")
      val unmatchedLeft = lEvents.filterNot(e => bruteInner(Seq(e), rEvents, before, after).nonEmpty)
      assert(leftJ.count(_._2.endsWith("+null")) === unmatchedLeft.size, s"trial $trial left-null")

      // outer join: total = matched + unmatched-left + unmatched-right
      val outer = l.outerJoin(r, w)((lv, rv) =>
        lv.getOrElse("null") + "+" + rv.getOrElse("null")).toDataset.collect()
      val unmatchedRight = rEvents.filterNot(e => bruteInner(lEvents, Seq(e), before, after).nonEmpty)
      assert(outer.length === expected.size + unmatchedLeft.size + unmatchedRight.size,
        s"trial $trial outer")
    }
  }
}
