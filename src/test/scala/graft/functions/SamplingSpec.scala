package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deterministic sampling: identical draws across runs and partitionings,
  * independent draws across salts, rate lands near the target. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("same salt draws the identical sample regardless of partitioning") {
    val a = Sampling.sample(ids(5000), "id", "s1", 0.3)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids(5000).repartition(17), "id", "s1", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(math.abs(a.size - 1500) < 150, s"rate off: ${a.size}") // ~binomial
  }

  test("different salts draw independent samples") {
    val a = Sampling.sample(ids(5000), "id", "s1", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids(5000), "id", "s2", 0.3).collect().map(_.getLong(0)).toSet
    assert(a !== b)
    val overlap = (a & b).size.toDouble / a.size
    assert(overlap > 0.15 && overlap < 0.45, s"overlap=$overlap") // ~0.3 if independent
  }

  test("split assignment: total partition, stable rows under a re-cut") {
    import org.apache.spark.sql.functions.col
    val cuts = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val df = ids(5000).select(col("id"),
      Sampling.splitAssign(col("id"), "sp1", cuts).as("split"))
    val bySplit = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every row lands in exactly one split, proportions near 80/10/10
    assert(bySplit.size === 5000)
    val n = bySplit.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") - 4000) < 300, n.toString)
    assert(math.abs(n("val") - 500) < 150, n.toString)
    assert(math.abs(n("test") - 500) < 150, n.toString)
    // growing train at val's expense NEVER moves a test row into train:
    // cumulative cuts only shift rows across the adjacent boundary
    val recut = ids(5000).select(col("id"),
      Sampling.splitAssign(col("id"), "sp1",
        Seq("train" -> 85, "val" -> 5, "test" -> 10)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, s) <- bySplit if s == "test")
      assert(recut(id) == "test", s"test row $id migrated to ${recut(id)}")
    for ((id, s) <- bySplit if s == "train")
      assert(recut(id) == "train", s"train row $id left train")
  }
}
