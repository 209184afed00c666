package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-Min sketch: one-sided error (estimate >= exact, always),
  * cell-table bit-equality under any partitioning, and mergeability —
  * the sketch of a union equals the cell-wise sum of the parts. */
class CountMinSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Skewed stream: item k repeated (41 - k) times, k = 1..40. */
  private lazy val items = (1 to 40)
    .flatMap(k => Seq.fill(41 - k)(s"item$k")).toDF("w")

  private val W = 32 // deliberately tiny: forces collisions
  private val D = 3

  test("estimate >= exact count for EVERY key (one-sided error)") {
    val sketch = CountMinSketch.build(items, "w", W, D)
    val exact = items.groupBy("w").agg(count(lit(1)).as("exact"))
    val est = CountMinSketch.estimate(sketch, exact, "w", W, D)
    val rows = est.select("w", "exact", "cms_estimate").collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)} under-counted")
    }
    // the tiny width actually collides somewhere, so the test means something
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)), "no collision hit")
  }

  test("cell table is bit-identical under any partitioning") {
    val a = CountMinSketch.build(items.repartition(1), "w", W, D)
      .orderBy("r", "bucket").collect().toSeq
    val b = CountMinSketch.build(items.repartition(13), "w", W, D)
      .orderBy("r", "bucket").collect().toSeq
    assert(a === b)
  }

  test("mergeable: sketch(A union B) = cell-wise sum of sketch(A) + sketch(B)") {
    val a = items.limit(300)
    val b = items.exceptAll(a) // the true multiset remainder
    val merged = CountMinSketch.build(a, "w", W, D)
      .unionByName(CountMinSketch.build(b, "w", W, D))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("r", "bucket").collect().toSeq
    val whole = CountMinSketch.build(a.unionByName(b), "w", W, D)
      .orderBy("r", "bucket").collect().toSeq
    assert(merged === whole)
  }

  test("absent key estimates only collision mass (never negative)") {
    val sketch = CountMinSketch.build(items, "w", W, D)
    val ghost = Seq("never-seen-item").toDF("w")
    val est = CountMinSketch.estimate(sketch, ghost, "w", W, D)
      .select("cms_estimate").head().getLong(0)
    assert(est >= 0L)
  }
}
