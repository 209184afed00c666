package graft.api

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Property layer the reference lacks (SURVEY.md §5): randomized changelog
  * scenarios — update/re-key/tombstone sequences — checked against a
  * brute-force final-state oracle computed in plain Scala. Seeded, so
  * deterministic. */
class ChangelogPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val users = (1 to 5).map(i => s"u$i")
  private val regions = Seq("r1", "r2", "r3")

  /** Random changelog: each step assigns a user a region or deletes it. */
  private def scenario(rnd: Random, steps: Int): Seq[(String, String, Long)] =
    (1 to steps).map { i =>
      val u = users(rnd.nextInt(users.length))
      val v = if (rnd.nextDouble() < 0.15) null
              else regions(rnd.nextInt(regions.length))
      (u, v, i * 1000L)
    }

  /** Brute-force final state: last non-deleted assignment per user. */
  private def finalState(log: Seq[(String, String, Long)]): Map[String, String] =
    log.sortBy(_._3).foldLeft(Map.empty[String, String]) {
      case (m, (u, null, _)) => m - u
      case (m, (u, v, _)) => m.updated(u, v)
    }

  test("KTable.groupBy.count matches brute-force region counts over 40 random changelogs") {
    val rnd = new Random(42)
    for (trial <- 1 to 40) {
      val log = scenario(rnd, 3 + rnd.nextInt(25))
      val expected = finalState(log).groupBy(_._2).map { case (r, m) => (r, m.size.toLong) }
      val table = GraftStreams(spark).table(
        spark.createDataset(log.map { case (u, v, t) => (u, v, ts(t)) }))
      val got = table.groupBy((u, r) => (r, u)).count()
        .toDataset.collect().map(r => (r._1, r._2)).toMap
      assert(got === expected, s"trial $trial log=$log")
    }
  }

  test("KTable.groupBy.aggregate(add,sub) matches brute-force sums over random changelogs") {
    val rnd = new Random(7)
    for (trial <- 1 to 25) {
      val log = scenario(rnd, 3 + rnd.nextInt(20))
      // weight(u) = user index; sum of weights per region in final state
      def w(u: String) = u.drop(1).toInt
      val expected = finalState(log).groupBy(_._2)
        .map { case (r, m) => (r, m.keys.map(w).sum) }
        .filter(_._2 != 0)
      val table = GraftStreams(spark).table(
        spark.createDataset(log.map { case (u, v, t) => (u, v, ts(t)) }))
      val got = table.groupBy((u, r) => (r, w(u)))
        .aggregate(0)((_, v, agg) => agg + v, (_, v, agg) => agg - v, _ + _)
        .toDataset.collect().map(r => (r._1, r._2)).filter(_._2 != 0).toMap
      assert(got === expected, s"trial $trial log=$log")
    }
  }

  test("latest-per-key view equals brute-force final state over random changelogs") {
    val rnd = new Random(99)
    for (trial <- 1 to 25) {
      val log = scenario(rnd, 1 + rnd.nextInt(30))
      val expected = finalState(log)
      val got = GraftStreams(spark).table(
          spark.createDataset(log.map { case (u, v, t) => (u, v, ts(t)) }))
        .toDataset.collect().map(r => (r._1, r._2)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("branch is a partition: exhaustive and exclusive over random predicates") {
    val rnd = new Random(5)
    val data = (1 to 60).map(i => (rnd.nextInt(20), s"v$i", ts(i * 100L)))
    val stream = GraftStreams(spark).stream(spark.createDataset(data))
    val cut1 = rnd.nextInt(20)
    val cut2 = rnd.nextInt(20)
    val branches = stream.branch(
      (k, _) => k < cut1,
      (k, _) => k < cut2,
      (_, _) => true)
    val sizes = branches.map(_.toDataset.count()).sum
    assert(sizes === data.size) // exhaustive + exclusive (counts add up)
    val b0 = branches(0).toDataset.collect().map(_._1)
    val b1 = branches(1).toDataset.collect().map(_._1)
    assert(b0.forall(_ < cut1))
    assert(b1.forall(k => k >= cut1 && k < cut2)) // first-match-wins
  }
}
