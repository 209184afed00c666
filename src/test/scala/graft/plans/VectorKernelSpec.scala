package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

/** Codegen'd float-vector kernels: bit-exact equivalence with the HOF
  * column formulation (same double accumulation order), null semantics,
  * SQL registration, and whole-stage codegen participation. */
class VectorKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Array[Float], Array[Float])] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)((Array.fill(dim)(rnd.nextFloat() * 4f - 2f),
                 Array.fill(dim)(rnd.nextFloat() * 4f - 2f)))
  }

  test("kernels are bitwise identical to the HOF formulation") {
    val df = (randVecs(200, 64) :+
        ((Array.fill(64)(0f), Array.fill(64)(1f)))) // zero-norm edge
      .toDF("a", "b")
    val diffs = df.select(
        (VectorFunctions.dotProduct($"a", $"b") === VectorFunctions.dotProductHof($"a", $"b")).as("d"),
        (VectorFunctions.cosine($"a", $"b") === VectorFunctions.cosineHof($"a", $"b")).as("c"),
        (VectorFunctions.sqDist($"a", $"b") === VectorFunctions.sqDistHof($"a", $"b")).as("s"))
      .filter(!$"d" || !$"c" || !$"s").count()
    assert(diffs === 0)
  }

  test("length mismatch and null inputs yield null (zip_with parity)") {
    val df = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (null.asInstanceOf[Array[Float]], Array(1f))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dotProduct($"a", $"b"),
      VectorFunctions.cosine($"a", $"b"),
      VectorFunctions.sqDist($"a", $"b")).collect()
    rows.foreach { r => (0 until 3).foreach(i => assert(r.isNullAt(i))) }
  }

  test("kernels are SQL-registered and whole-stage codegen'd") {
    NativeVector.register(spark)
    val r = spark.sql(
      "SELECT dot_f32(array(1f,0f,2f), array(2f,1f,0f))," +
        " cosine_f32(array(1f,0f), array(1f,0f))," +
        " sqdist_f32(array(1f,0f), array(0f,1f))").head()
    assert(r.getDouble(0) === 2.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) === 2.0)
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(VectorFunctions.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  // ------------------------- r15 integer kernels (micro-grid hot path)

  private def randLongVecs(n: Int, dim: Int): Seq[(Array[Long], Array[Long])] = {
    val rnd = new scala.util.Random(7)
    // micro-grid magnitudes: |x| <= 2^21 like round(float * 1e6)
    def v() = Array.fill(dim)((rnd.nextInt(4194305) - 2097152).toLong)
    Seq.fill(n)((v(), v()))
  }

  test("dotI64/sqDistI64 are bit-identical to the zip_with+aggregate fold") {
    val df = randLongVecs(200, 64).toDF("a", "b")
    val diffs = df.select(
        (NativeVector.dotI64($"a", $"b") ===
          aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), _ + _)).as("d"),
        (NativeVector.sqDistI64($"a", $"b") ===
          aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
            lit(0L), _ + _)).as("s"))
      .filter(!$"d" || !$"s").count()
    assert(diffs === 0)
    // null-propagation parity
    val nulls = Seq(
      (Array(1L, 2L), Array(1L, 2L, 3L)),
      (null.asInstanceOf[Array[Long]], Array(1L))).toDF("a", "b")
    nulls.select(NativeVector.dotI64($"a", $"b"),
        NativeVector.sqDistI64($"a", $"b")).collect()
      .foreach(r => (0 until 2).foreach(i => assert(r.isNullAt(i))))
  }

  test("intCosGE matches exact decimal arithmetic incl. 64-bit-overflowing products") {
    val rnd = new scala.util.Random(11)
    // magnitudes up to the documented 2^47 micro-grid bound, plus
    // boundary-exact cases where 400·dot² == 49·na·nb
    val cases = Seq.fill(3000)((math.abs(rnd.nextLong()) % (1L << 47),
        math.abs(rnd.nextLong()) % (1L << 47),
        math.abs(rnd.nextLong()) % (1L << 47))) ++
      Seq((7L, 20L, 20L), (7L * 1000000, 20L * 1000000, 20L * 1000000),
        (0L, 0L, 0L), (1L << 46, 1L << 46, 1L << 46))
    cases.foreach { case (dot, na, nb) =>
      val exact = BigInt(dot) * BigInt(dot) * 400 >= BigInt(na) * BigInt(nb) * 49
      assert(VectorKernels.intCosGE(dot, na, nb, 400, 49) === exact,
        s"($dot, $na, $nb)")
    }
    // expression path agrees with a decimal(38,0) Spark evaluation
    val df = cases.take(500).toDF("dot", "na", "nb")
    val diffs = df.filter(
      NativeVector.intCosGE($"dot", $"na", $"nb", 400, 49) =!=
        ($"dot".cast("decimal(38,0)") * $"dot".cast("decimal(38,0)") * 400 >=
          $"na".cast("decimal(38,0)") * $"nb".cast("decimal(38,0)") * 49)).count()
    assert(diffs === 0)
  }
}
