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
}
