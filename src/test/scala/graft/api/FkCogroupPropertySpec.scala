package graft.api

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Randomized-scenario properties for the KIP-213 fk join and KIP-150
  * cogroup, checked against brute-force models in plain Scala. Seeded,
  * so deterministic. */
class FkCogroupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  test("fkJoin/fkLeftJoin match the brute-force view join over 30 random changelogs") {
    val rnd = new Random(1213)
    val orderIds = (1 to 6).map(i => s"o$i")
    val custIds = (1 to 4).map(i => s"c$i")
    for (trial <- 1 to 30) {
      // left changelog: order -> (fk, payload) or tombstone
      val leftLog = (1 to (3 + rnd.nextInt(20))).map { i =>
        val o = orderIds(rnd.nextInt(orderIds.length))
        val v = if (rnd.nextDouble() < 0.15) null
                else (custIds(rnd.nextInt(custIds.length)), s"p$i")
        (o, v, i * 1000L)
      }
      // right changelog: customer -> segment or tombstone
      val rightLog = (1 to (2 + rnd.nextInt(10))).map { i =>
        val c = custIds(rnd.nextInt(custIds.length))
        val v = if (rnd.nextDouble() < 0.2) null else s"s$i"
        (c, v, i * 1000L)
      }
      def viewOf[V](log: Seq[(String, V, Long)]): Map[String, V] =
        log.sortBy(_._3).foldLeft(Map.empty[String, V]) {
          case (m, (k, null, _)) => m - k
          case (m, (k, v, _)) => m.updated(k, v)
        }
      val lView = viewOf(leftLog)
      val rView = viewOf(rightLog)
      val expectedInner = lView.collect {
        case (o, (fk, p)) if rView.contains(fk) => o -> s"$p+${rView(fk)}"
      }
      val expectedLeft = lView.map { case (o, (fk, p)) =>
        o -> s"$p+${rView.getOrElse(fk, "null")}"
      }

      val lt = builder.table(spark.createDataset(
        leftLog.map { case (k, v, t) => (k, v, ts(t)) }))
      val rt = builder.table(spark.createDataset(
        rightLog.map { case (k, v, t) => (k, v, ts(t)) }))
      val inner = lt.fkJoin(rt)(_._1)((v, s) => s"${v._2}+$s")
        .toDataset.collect().map(r => (r._1, r._2)).toMap
      assert(inner === expectedInner, s"trial $trial left=$leftLog right=$rightLog")
      val leftJ = lt.fkLeftJoin(rt)(_._1)((v, s) => s"${v._2}+${s.getOrElse("null")}")
        .toDataset.collect().map(r => (r._1, r._2)).toMap
      assert(leftJ === expectedLeft, s"trial $trial left=$leftLog right=$rightLog")
    }
  }

  test("cogroup matches a brute-force ts-ordered fold over 30 random stream pairs") {
    val rnd = new Random(150)
    val keys = (1 to 4).map(i => s"k$i")
    for (trial <- 1 to 30) {
      // distinct timestamps so the cross-stream fold order is unambiguous
      val times = rnd.shuffle((1 to 60).toList).iterator
      val s1 = (1 to (2 + rnd.nextInt(12))).map { i =>
        (keys(rnd.nextInt(keys.length)), rnd.nextInt(100).toLong, times.next() * 1000L)
      }
      val s2 = (1 to (2 + rnd.nextInt(12))).map { i =>
        (keys(rnd.nextInt(keys.length)), s"t$i", times.next() * 1000L)
      }
      // model: fold (Long sum, String concat) in global ts order
      val merged: Seq[(String, Either[Long, String], Long)] =
        s1.map { case (k, n, t) => (k, Left(n): Either[Long, String], t) } ++
          s2.map { case (k, v, t) => (k, Right(v): Either[Long, String], t) }
      val expected = merged.groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._3).foldLeft((0L, "")) {
          case ((n, s), (_, Left(x), _)) => (n + x, s)
          case ((n, s), (_, Right(x), _)) => (n, s + x)
        }
      }

      val g1 = builder.stream(spark.createDataset(
        s1.map { case (k, v, t) => (k, v, ts(t)) })).groupByKey
      val g2 = builder.stream(spark.createDataset(
        s2.map { case (k, v, t) => (k, v, ts(t)) })).groupByKey
      val got = g1.cogroup[(Long, String)]((_, n, acc) => (acc._1 + n, acc._2))
        .cogroup(g2)((_, v, acc) => (acc._1, acc._2 + v))
        .aggregate((0L, ""))
        .toDataset.collect().map(r => (r._1, r._2)).toMap
      assert(got === expected, s"trial $trial s1=$s1 s2=$s2")
    }
  }
}
