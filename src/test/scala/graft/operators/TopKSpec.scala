package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bounded-buffer per-group top-k: must be bit-identical to the rank
  * window it replaces (top-k merge is exact), while planning as a partial
  * aggregation with NO Window node (the scale fix: a window ships every
  * candidate of a group to one task). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomScored(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (rnd.nextInt(7).toLong, i.toLong, math.rint(rnd.nextDouble() * 20) / 4.0)
    }.toDF("g", "id", "score")
  }

  test("matches row_number() over (score desc, id) on 20 random frames") {
    for (seed <- 1 to 20) {
      val df = randomScored(seed, 300)
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val expect = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
        .select("g", "id", "score", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val got = TopK.perGroup(df, "g", "id", "score", k = 4, ascending = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got === expect, s"seed=$seed")
    }
  }

  test("ascending mode matches the distance-ordered window") {
    val df = randomScored(99, 500)
    val w = Window.partitionBy("g").orderBy(col("score"), col("id"))
    val expect = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select("g", "id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = TopK.perGroup(df, "g", "id", "score", k = 7, ascending = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === expect)
  }

  test("k larger than any group returns every row, still ranked") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (2L, 12L, 2.0)).toDF("g", "id", "score")
    val got = TopK.perGroup(df, "g", "id", "score", k = 100, ascending = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === Set((1L, 10L, 1), (1L, 11L, 2), (2L, 12L, 1)))
  }

  test("NaN scores rank exactly as the window does (largest; -0.0 == 0.0)") {
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 5.0), (1L, 12L, -0.0),
      (1L, 13L, 0.0), (1L, 14L, Double.NaN), (1L, 15L, 1.0)
    ).toDF("g", "id", "score")
    for (asc <- Seq(true, false)) {
      val order = if (asc) Seq(col("score"), col("id"))
                  else Seq(col("score").desc, col("id"))
      val w = Window.partitionBy("g").orderBy(order: _*)
      val expect = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).select("g", "id", "rank")
        .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
      val got = TopK.perGroup(df, "g", "id", "score", k = 3, ascending = asc)
        .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
      assert(got === expect, s"ascending=$asc")
    }
  }

  test("payload variant matches the window and carries the payload through") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, math.rint(rnd.nextDouble() * 12) / 3.0, s"p$i")
    }.toDF("g", "id", "score", "tag")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expect = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getInt(4))).toSet
    val got = TopK.perGroupWithPayload(df, "g", "id", "score", "tag",
        k = 6, ascending = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getInt(4))).toSet
    assert(got === expect)
  }

  test("k=1 payload fast path is bit-identical to the typed buffer (r15)") {
    // the descending k=1 case routes through the codegen'd max(struct)
    // path — pin it against the rank window on random frames PLUS the
    // -0.0/0.0 tie and NaN-greatest edges the struct comparison must
    // reproduce (the score is normalized with `+ 0.0`, the id tiebreak
    // rides bitwise NOT)
    val rnd = new scala.util.Random(5)
    val rand = (1 to 500).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, math.rint(rnd.nextDouble() * 8) / 2.0, s"t$i")
    }
    val edges = Seq(
      (900L, 1L, -0.0, "neg-zero"), (900L, 2L, 0.0, "pos-zero"),
      (901L, 3L, Double.NaN, "nan"), (901L, 4L, 99.0, "big"),
      (902L, 5L, -3.5, "only"))
    val df = (rand ++ edges).toDF("g", "id", "score", "tag")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expect = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val got = TopK.perGroupWithPayload(df, "g", "id", "score", "tag",
        k = 1, ascending = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got === expect)
    // winner 900 must be id=1: -0.0 and 0.0 tie, smaller id wins (the
    // window's NormalizeFloatingNumbers semantics, and BoundedTopK's)
    assert(got.contains((900L, 1L, 1)))
    // the fast path must plan as a codegen'd aggregate, not a typed one
    val plan = TopK.perGroupWithPayload(df, "g", "id", "score", "tag",
      k = 1, ascending = false).queryExecution.executedPlan.toString
    assert(!plan.contains("AppendColumns"), plan.take(1200))
    assert(plan.contains("partial_"), plan.take(1200))
  }

  test("plans as a partial aggregation with no Window node") {
    val df = randomScored(7, 100)
    val plan = TopK.perGroup(df, "g", "id", "score", k = 5, ascending = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1200))
    assert(plan.contains("partial_"), plan.take(1200)) // map-side combine
  }
}
