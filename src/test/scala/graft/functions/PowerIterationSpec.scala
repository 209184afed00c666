package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Power-iteration top component: planted-direction recovery, unit norm,
  * Rayleigh dominance over a random direction, deterministic sign, and
  * bit-exactness under repartitioning (the quantized-BIGINT sum
  * discipline). */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 400 vectors = strong planted direction u + small deterministic
    * off-axis noise. */
  private def planted(dim: Int): org.apache.spark.sql.DataFrame = {
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f)
      .map(_ / math.sqrt(dim).toFloat)
    (0 until 400).map { r =>
      val scale = (if (r % 2 == 0) 1.0f else -1.0f) * (1.0f + (r % 7) * 0.1f)
      val v = Array.tabulate(dim) { i =>
        u(i) * scale * 10.0f + ((r * 31 + i * 17) % 13 - 6) * 0.01f
      }
      (r.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("recovers a planted dominant direction (|cos| > 0.99) with unit norm") {
    val df = planted(16)
    val (v, ratioMicro) = PowerIteration.topComponent(df, "embedding", iters = 5)
    val u = Array.tabulate(16)(i => if (i % 2 == 0) 1.0 else -1.0).map(_ / 4.0)
    val cos = v.indices.map(i => v(i) * u(i)).sum
    assert(math.abs(cos) > 0.99, s"cos(planted, recovered) = $cos")
    // unit up to the 1e-6 micro grid the loop now lives on
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3)
    // the planted direction carries nearly all the variance
    assert(ratioMicro > 900000L, s"explained ratio $ratioMicro")
  }

  test("deterministic sign: largest-|loading| position is positive") {
    val (v, _) = PowerIteration.topComponent(planted(16), "embedding", iters = 5)
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    assert(v(pivot) > 0.0)
  }

  test("bit-identical under any partitioning") {
    val df = planted(16)
    val (a, ra) = PowerIteration.topComponent(df.repartition(1), "embedding", 4)
    val (b, rb) = PowerIteration.topComponent(df.repartition(17), "embedding", 4)
    assert(a.toSeq === b.toSeq)
    assert(ra === rb)
  }

  test("Rayleigh quotient of the component dominates a fixed off direction") {
    val df = planted(16)
    val (v, _) = PowerIteration.topComponent(df, "embedding", iters = 5)
    def rayleigh(w: Array[Double]): Double = {
      val rows = df.select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      rows.map(x => math.pow(x.indices.map(i => x(i) * w(i)).sum, 2)).sum
    }
    val off = Array.tabulate(16)(i => if (i == 0) 1.0 else 0.0)
    assert(rayleigh(v) > rayleigh(off))
  }
}
