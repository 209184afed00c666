package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** GroupTopK bounded aggregation: partitioning bit-equality, exactness vs
  * the window-sort idiom it replaces, tie determinism, below-k behavior,
  * the smallest-first mode the weighted sampler uses, and the no-Window
  * plan shape (the point of the operator). */
class GroupTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one row per (group, item), scores engineered to include ties
  private def scored(n: Int) =
    (0 until n).map(i => (s"g${i % 3}", f"item-$i%04d", (i * 7 % 50).toLong))
      .toDF("g", "item", "s")

  test("result is bit-identical under any partitioning") {
    val df = scored(900)
    val a = GroupTopK.topK(df.repartition(1), "g", "item", "s", 5)
      .orderBy("g", "rank").collect().toSeq
    val b = GroupTopK.topK(df.repartition(17), "g", "item", "s", 5)
      .orderBy("g", "rank").collect().toSeq
    assert(a === b)
    assert(a.size === 15)
  }

  test("matches the window-sort idiom exactly (desc and asc, with ties)") {
    import org.apache.spark.sql.expressions.Window
    val df = scored(900)
    for (smallest <- Seq(false, true)) {
      val ord = if (smallest) Seq(col("s").asc, col("item").asc)
                else Seq(col("s").desc, col("item").asc)
      val want = df
        .withColumn("rank",
          row_number().over(Window.partitionBy("g").orderBy(ord: _*)).cast("long"))
        .filter(col("rank") <= 4)
        .select(col("g"), col("rank"), col("item"), col("s").as("score"))
        .orderBy("g", "rank").collect().toSeq
      val got = GroupTopK.topK(df, "g", "item", "s", 4, smallestFirst = smallest)
        .orderBy("g", "rank").collect().toSeq
      assert(got === want, s"smallestFirst=$smallest")
    }
  }

  test("below k the whole group comes back, fully ordered") {
    val df = Seq(("g", "b", 3L), ("g", "a", 3L), ("g", "c", 9L))
      .toDF("g", "item", "s")
    val got = GroupTopK.topK(df, "g", "item", "s", 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, "c", 9L), (2L, "a", 3L), (3L, "b", 3L)))
  }

  test("merge = top-k of union of partial top-ks (brute-force check)") {
    val agg = new GroupTopK.GroupTopKAgg(3, smallestFirst = false)
    val rows = (0 until 40).map(i => ("g", s"i$i", (i * 13 % 11).toLong))
    val (l, r) = rows.splitAt(17)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val brute = rows.map(x => (x._2, x._3))
      .sortBy { case (item, s) => (-s, item) }.take(3)
    assert(merged === brute)
  }

  test("plans as a partial aggregation with no Window node") {
    val plan = GroupTopK.topK(scored(100), "g", "item", "s", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1200))
    assert(plan.contains("partial_"), plan.take(1200)) // map-side combine
  }
}
