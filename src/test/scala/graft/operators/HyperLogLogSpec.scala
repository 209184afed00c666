package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HyperLogLog register table: partitioning bit-equality, mergeability
  * (element-wise max), bounded size, and estimate accuracy in the
  * classic ~1.04/√m band. */
class HyperLogLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def items(n: Int, tag: String) =
    (0 until n).map(i => (s"g${i % 2}", s"$tag-item-$i")).toDF("g", "w")

  test("register table is bit-identical under any partitioning") {
    val df = items(4000, "a")
    val a = HyperLogLog.registers(df.repartition(1), "w", Seq("g"))
      .orderBy("g", "j").collect().toSeq
    val b = HyperLogLog.registers(df.repartition(17), "w", Seq("g"))
      .orderBy("g", "j").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("bounded: at most 64 registers per group, duplicates are free") {
    val df = items(5000, "a")
    val dup = df.unionByName(df).unionByName(df) // 3x multiset
    val regs = HyperLogLog.registers(dup, "w", Seq("g"))
    assert(regs.groupBy("g").count().collect().forall(_.getLong(1) <= 64L))
    // cardinality sketch: duplicates must not move a single register
    val once = HyperLogLog.registers(df, "w", Seq("g"))
      .orderBy("g", "j").collect().toSeq
    assert(regs.orderBy("g", "j").collect().toSeq === once)
  }

  test("mergeable: registers(A union B) = element-wise max of parts") {
    val a = items(2000, "a")
    val b = items(2000, "b")
    val merged = HyperLogLog.registers(a, "w", Seq("g"))
      .unionByName(HyperLogLog.registers(b, "w", Seq("g")))
      .groupBy("g", "j").agg(max("m_j").as("m_j"))
      .orderBy("g", "j").collect().toSeq
    val whole = HyperLogLog.registers(a.unionByName(b), "w", Seq("g"))
      .orderBy("g", "j").collect().toSeq
    assert(merged === whole)
  }

  test("small cardinalities route through linear counting (~exact)") {
    // Below 2.5·m = 160 the raw harmonic estimate is biased low/high;
    // the LcTable branch must fire and land within ~15% even at n = 20
    // (linear counting is near-exact while most registers are empty).
    for (n <- Seq(2, 20, 80)) {
      val df = items(2 * n, "lc") // n distinct per group
      val est = HyperLogLog.estimate(
        HyperLogLog.registers(df, "w", Seq("g")), Seq("g")).collect()
      est.foreach { r =>
        val e = r.getAs[Long]("hll_estimate").toDouble
        assert(r.getAs[Long]("n_zero_registers") > 0L)
        assert(math.abs(e - n) / n < 0.30, s"LC estimate $e for exact $n")
      }
    }
  }

  test("LcTable literals are stable (oracle interpolates these values)") {
    assert(HyperLogLog.LcTable.length === 64)
    assert(HyperLogLog.LcTable.head === math.round(64 * math.log(64.0)))
    assert(HyperLogLog.LcTable.last === 0L)
    assert(HyperLogLog.LcTable === HyperLogLog.LcTable.sorted.reverse)
  }

  test("estimate lands in the ~1.04/sqrt(64) = 13% band (3 sigma = 39%)") {
    val df = items(6000, "a") // 3000 distinct per group
    val regs = HyperLogLog.registers(df, "w", Seq("g"))
    val est = HyperLogLog.estimate(regs, Seq("g")).collect()
    assert(est.length === 2)
    est.foreach { r =>
      val e = r.getAs[Long]("hll_estimate").toDouble
      assert(math.abs(e - 3000.0) / 3000.0 < 0.39,
        s"estimate $e for exact 3000")
    }
  }
}
