package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** GraftExtensions: SQL functions injected per-session and the
  * RewriteVectorHof optimizer rule replacing hand-written HOF dot-product
  * folds with the codegen'd DotF32 kernel, bit-exactly. */
class ExtensionsSpec extends AnyFunSuite {

  private def containsDot(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[DotF32])))

  test("RewriteVectorHof rewrites the analyzed HOF fold to DotF32") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(VectorFunctions.dotProductHof(col("a"), col("b")).as("d"))
    val rewritten = RewriteVectorHof(df.queryExecution.analyzed)
    assert(containsDot(rewritten), rewritten.treeString)
    // double-typed arrays must NOT match (kernel is float-specific)
    val dd = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!containsDot(RewriteVectorHof(dd.queryExecution.analyzed)))
  }

  test("extension-enabled session: SQL functions + automatic HOF rewrite, bit-exact") {
    val base = TestSpark.spark // ensure shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // build on range() so ConvertToLocalRelation can't constant-fold the
      // whole projection away before the plan assertion looks at it
      spark.range(3).selectExpr(
        "transform(sequence(0, 4), i -> CAST(i + id AS FLOAT)) AS a",
        "transform(sequence(0, 4), i -> CAST(i * 2 - id AS FLOAT)) AS b")
        .createOrReplaceTempView("vecs")
      // injected SQL function surface
      val viaFn = spark.sql("SELECT dot_f32(a, b) AS d FROM vecs ORDER BY d")
        .collect().map(_.getDouble(0)).toSeq
      val hofSql =
        """SELECT aggregate(zip_with(a, b,
          |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d FROM vecs ORDER BY d""".stripMargin
      val hof = spark.sql(hofSql)
      // the optimizer rule rewired the interpreted fold to the kernel...
      assert(containsDot(hof.queryExecution.optimizedPlan),
        hof.queryExecution.optimizedPlan.treeString)
      // ...with bit-identical results
      val expected = (0 until 3).map { id =>
        (0 until 5).map(i => (i + id).toFloat.toDouble * (i * 2 - id).toFloat.toDouble).sum
      }.sorted
      assert(hof.collect().map(_.getDouble(0)).toSeq === expected)
      assert(viaFn === expected)
      assert(spark.sql("SELECT fnv64('abc') = fnv64('abc') AS e").head().getBoolean(0))
      assert(spark.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
        .head().getInt(0) === 2)
      // Unicode surface rides the same extension (composed via escape so
      // the assertion is encoding-proof)
      assert(spark.sql("SELECT strip_accents(nfc_normalize('école')) AS s")
        .head().getString(0) === "ecole")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
