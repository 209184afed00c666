package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Batch as-of join: backward point-in-time semantics, inclusive ties,
  * null on no-prior-row, and the single-shuffle plan shape. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("each left row sees the latest right row at or before its ts") {
    val left = Seq(
      ("u1", ts(1000L), "l-early"), // before any right row
      ("u1", ts(2000L), "l-tie"), // exactly at a right ts (inclusive)
      ("u1", ts(5000L), "l-late"),
      ("u2", ts(9000L), "l-other")).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts(2000L), 20L),
      ("u1", ts(4000L), 40L),
      ("u2", ts(1000L), 10L)).toDF("k", "rt", "amount")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("amount"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out === Map(
      "l-early" -> None, // no prior right row
      "l-tie" -> Some(20L), // right row at the same ts applies
      "l-late" -> Some(40L),
      "l-other" -> Some(10L)))
  }

  test("multi-column payload is atomic: a null in the latest right row wins as null") {
    // latest right row (ts=1000) has b=null; an independent per-column
    // pick would steal b=5 from the OLDER row — the payload must come
    // from exactly one right row
    val left = Seq(("u1", ts(2000L), "l")).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts(0L), Some(0L), Some(5L)),
      ("u1", ts(1000L), Some(1L), None)).toDF("k", "rt", "a", "b")
    val out = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("a", "b"))
      .select("a", "b").collect().head
    assert(Option(out.get(0)) === Some(1L) && Option(out.get(1)) === None)
  }

  test("forward join picks the earliest right row at or after each left ts") {
    val left = Seq(
      ("u1", ts(1000L), "l-early"),
      ("u1", ts(2000L), "l-tie"), // right row exactly at this ts (inclusive)
      ("u1", ts(5000L), "l-late")).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts(2000L), 20L),
      ("u1", ts(4000L), 40L)).toDF("k", "rt", "amount")
    val out = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("amount"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out === Map(
      "l-early" -> Some(20L),
      "l-tie" -> Some(20L), // inclusive at the boundary
      "l-late" -> None)) // nothing after
  }

  test("matches the brute-force as-of oracle over 15 random scenarios") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 15) {
      val lRows = (1 to 3 + rnd.nextInt(20)).map(i =>
        (rnd.nextInt(5), rnd.nextInt(50) * 100L, i))
      val rRows = (1 to 3 + rnd.nextInt(20)).map(i =>
        (rnd.nextInt(5), rnd.nextInt(50) * 100L, i.toLong * 10))
      // distinct right (key, ts) so the brute-force max is well-defined
      val rDistinct = rRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = lRows.map { case (k, t, id) =>
        val prior = rDistinct.filter(r => r._1 == k && r._2 <= t)
        id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
      }.toMap
      val left = lRows.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "t", "lid")
      val right = rDistinct.map { case (k, t, p) => (k, ts(t), p) }.toDF("k", "rt", "p")
      val got = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("p"))
        .collect().map(r => r.getInt(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got === expected)
    }
  }

  test("forward matches the brute-force oracle over 15 random scenarios") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 15) {
      val lRows = (1 to 3 + rnd.nextInt(20)).map(i =>
        (rnd.nextInt(5), rnd.nextInt(50) * 100L, i))
      val rRows = (1 to 3 + rnd.nextInt(20)).map(i =>
        (rnd.nextInt(5), rnd.nextInt(50) * 100L, i.toLong * 10))
      val rDistinct = rRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = lRows.map { case (k, t, id) =>
        val after = rDistinct.filter(r => r._1 == k && r._2 >= t)
        id -> (if (after.isEmpty) None else Some(after.minBy(_._2)._3))
      }.toMap
      val left = lRows.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "t", "lid")
      val right = rDistinct.map { case (k, t, p) => (k, ts(t), p) }.toDF("k", "rt", "p")
      val got = AsOfJoin.forward(left, right, "k", "t", "rt", Seq("p"))
        .collect().map(r => r.getInt(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got === expected)
    }
  }

  test("plans a single shuffle (no range-join pair explosion)") {
    val left = Seq(("a", ts(1L), 1)).toDF("k", "t", "x")
    val right = Seq(("a", ts(1L), 2L)).toDF("k", "rt", "p")
    val plan = AsOfJoin.backward(left, right, "k", "t", "rt", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan.take(1000))
    assert(!plan.contains("Join"), plan.take(1000))
  }
}
