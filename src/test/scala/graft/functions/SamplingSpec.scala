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
}
