package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KMV bottom-k sketch: partitioning bit-equality, distinct semantics,
  * bounded size, exact-below-k readout, estimate accuracy in the
  * ~1/√(k−2) band, and the set-algebra property the sketch exists for
  * (union sketch from the two parts' sketches). */
class KMinValuesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def items(n: Int, tag: String) =
    (0 until n).map(i => (s"g${i % 2}", s"$tag-item-$i")).toDF("g", "w")

  test("sketch is bit-identical under any partitioning") {
    val df = items(4000, "a")
    val a = KMinValues.sketch(df.repartition(1), "w", "g")
      .orderBy("g", "rank").collect().toSeq
    val b = KMinValues.sketch(df.repartition(17), "w", "g")
      .orderBy("g", "rank").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bounded at k distinct ascending hashes; duplicates are free") {
    val df = items(3000, "a")
    val dup = df.unionByName(df).unionByName(df) // 3x multiset
    val sk = KMinValues.sketch(dup, "w", "g")
    val perGroup = sk.groupBy("g").count().collect()
    assert(perGroup.forall(_.getLong(1) === KMinValues.K.toLong))
    // duplicates must not move a single kept hash
    val once = KMinValues.sketch(df, "w", "g").orderBy("g", "rank").collect().toSeq
    assert(sk.orderBy("g", "rank").collect().toSeq === once)
    // ascending by construction: rank order == hash order
    sk.collect().groupBy(_.getString(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
      assert(byRank === byRank.sorted && byRank.distinct === byRank)
    }
  }

  test("below k the sketch holds everything and the estimate is exact") {
    val df = items(120, "a") // 60 distinct per group < k = 256
    val est = KMinValues.estimate(KMinValues.sketch(df, "w", "g"), "g").collect()
    assert(est.length === 2)
    est.foreach { r =>
      assert(r.getLong(1) === 60L) // n_sketch
      assert(r.getLong(2) === 60L) // exact readout
    }
  }

  test("estimate lands in the ~1/sqrt(k-2) = 6.3% band (3 sigma = 19%)") {
    val df = items(6000, "a") // 3000 distinct per group
    val est = KMinValues.estimate(KMinValues.sketch(df, "w", "g"), "g").collect()
    est.foreach { r =>
      val e = r.getLong(2).toDouble
      assert(math.abs(e - 3000.0) / 3000.0 < 0.19, s"KMV estimate $e for 3000")
    }
  }

  test("set algebra: S_k(A union B) = S_k(S(A) ++ S(B))") {
    // overlapping groups: group g0 of `a` and of `b` share half their items
    val a = (0 until 3000).map(i => ("A", s"x-$i")).toDF("g", "w")
    val b = (1500 until 4500).map(i => ("B", s"x-$i")).toDF("g", "w")
    val skA = KMinValues.sketch(a, "w", "g").select("h")
    val skB = KMinValues.sketch(b, "w", "g").select("h")
    // union sketch from the two k-row summaries alone
    val fromSketches = skA.unionByName(skB).distinct()
      .orderBy("h").limit(KMinValues.K).collect().map(_.getLong(0)).toSeq
    // ground truth: sketch of the full union
    val whole = KMinValues.sketch(
        a.unionByName(b).withColumn("g", lit("U")), "w", "g")
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(fromSketches === whole)
  }
}
