package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixed-point distributed logistic regression: learns a separable
  * concept, and — the design property — trains to BIT-IDENTICAL weights
  * under different partitionings, because gradient sums are longs. */
class LinearModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic linearly-separable data: label 1 iff x0 + x1 > 0,
    * points on a grid away from the boundary. */
  private def separable(n: Int) = {
    val rows = (0 until n).map { i =>
      val a = ((i * 37) % 21 - 10) / 5.0f // [-2, 2]
      val b = ((i * 53) % 21 - 10) / 5.0f
      val margin = a + b
      // shift each point 0.5 away from the boundary so classes separate
      val y = if (margin >= 0) 1.0 else 0.0
      val shift = if (margin >= 0) 0.5f else -0.5f
      (i.toLong, Seq(a + shift, b + shift, 0.1f * (i % 3)), y)
    }
    rows.toDF("id", "embedding", "y")
  }

  test("learns a separable concept with high accuracy") {
    val df = separable(400)
    val m = LinearModel.trainLogistic(df, "embedding", "y", iters = 20, lr = 1.0)
    val acc = LinearModel.score(df, "embedding", m)
      .select(avg((col("pred").cast("double") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.97, s"accuracy $acc")
    // the learned direction matches the concept: positive weight mass on
    // the two informative dims, noise dim near zero
    assert(m.w(0) > 0 && m.w(1) > 0)
    assert(math.abs(m.w(2)) < math.min(m.w(0), m.w(1)))
  }

  test("weights are bit-identical across partitionings") {
    val df = separable(300)
    val m1 = LinearModel.trainLogistic(df.repartition(1), "embedding", "y",
      iters = 5, lr = 0.5)
    val m7 = LinearModel.trainLogistic(df.repartition(7), "embedding", "y",
      iters = 5, lr = 0.5)
    assert(m1.w.toSeq === m7.w.toSeq) // exact, not approximate
    assert(m1.bias === m7.bias)
  }

  test("micro-grid trainer learns the separable concept too") {
    val df = separable(400).withColumn("yl", col("y").cast("long"))
    val m = LinearModel.trainLogisticMicro(df, "embedding", "yl", iters = 8)
    val acc = LinearModel.scoreMicro(df, "embedding", m)
      .select(avg((col("pred").cast("double") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.97, s"accuracy $acc")
    assert(m.wMicro(0) > 0 && m.wMicro(1) > 0)
  }

  test("micro-grid weights are bit-identical across partitionings") {
    val df = separable(300).withColumn("yl", col("y").cast("long"))
    val m1 = LinearModel.trainLogisticMicro(df.repartition(1), "embedding",
      "yl", iters = 3)
    val m7 = LinearModel.trainLogisticMicro(df.repartition(7), "embedding",
      "yl", iters = 3)
    assert(m1.wMicro.toSeq === m7.wMicro.toSeq)
    assert(m1.biasMicro === m7.biasMicro)
  }

  test("sigmoid table: monotone, symmetric, midpoint 0.5 at the center") {
    val t = LinearModel.SigTable
    assert(t.size === 4096)
    assert(t.sliding(2).forall(p => p(0) <= p(1)), "monotone")
    // σ(-x) = 1 - σ(x): cell i mirrors cell 4095-i on the midpoint grid
    assert((0 until 4096).forall(i => math.abs(t(i) + t(4095 - i) - 1000000L) <= 1))
    assert(math.abs(t(2047) + t(2048) - 1000000L) <= 1)
  }

  test("catalog query scores every embedding and is deterministic") {
    val q = graft.SparkEntry.queries("q_quality_classifier")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    val b = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
  }
}
