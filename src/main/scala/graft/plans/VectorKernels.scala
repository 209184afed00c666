package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static float-vector kernels referenced from generated code — one tight
  * loop per row over the unsafe array data instead of a per-element
  * higher-order-function expression tree (`zip_with` + `aggregate`), which
  * Spark evaluates interpreted with per-element lambda-variable binding.
  *
  * Bit-exactness contract: each kernel accumulates in double precision in
  * strict left-to-right element order — the exact fp operation sequence of
  * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, _ + _)`
  * — so results are bitwise identical to the HOF formulation and all
  * existing DuckDB oracle hashes remain valid (FunctionsSpec pins the
  * equivalence). Length-mismatched inputs return null, mirroring
  * `zip_with`'s null padding propagating through the fold.
  */
object VectorKernels {

  /** Dot product accumulated in double, left-to-right; null on length
    * mismatch (boxed so generated code can branch on it) or on any null
    * element — the HOF fold's null propagation (a null product nulls the
    * whole aggregate), so nullable-element arrays stay correct instead
    * of silently reading zeroed slots. */
  def dotF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Cosine similarity with the same zero-denominator rule as
    * `VectorFunctions.cosine`: 0.0 when either vector has zero norm. */
  def cosineF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val dab = dotF32(a, b)
    if (dab == null) return null
    val denom = math.sqrt(dotF32(a, a)) * math.sqrt(dotF32(b, b))
    if (denom == 0.0) 0.0 else dab.doubleValue() / denom
  }

  /** Squared euclidean distance, (x-y)^2 per element, left-to-right;
    * same null-element propagation as [[dotF32]]. */
  def sqDistF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Base for the binary array<float> -> double kernels: null-safe, nullable
  * (length mismatch yields null), codegen'd as a single static call.
  *
  * Inputs must be array<float> (any element nullability — the kernels
  * null-check elements and propagate null like the HOF fold); a
  * non-float array would read garbage bytes, so it is an analysis
  * error. */
abstract class Float32VectorExpression extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, FloatType}

  /** Fully-qualified static kernel method invoked from generated code. */
  protected def kernel: String

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal -> null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = $kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

/** `dot_f32(a, b)` — codegen'd dot product over array<float>. */
case class DotF32(left: Expression, right: Expression) extends Float32VectorExpression {
  override protected def kernel: String = "graft.plans.VectorKernels.dotF32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.dotF32(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF32 =
    copy(left = l, right = r)
}

/** `cosine_f32(a, b)` — codegen'd cosine similarity over array<float>. */
case class CosineF32(left: Expression, right: Expression) extends Float32VectorExpression {
  override protected def kernel: String = "graft.plans.VectorKernels.cosineF32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.cosineF32(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineF32 =
    copy(left = l, right = r)
}

/** `sqdist_f32(a, b)` — codegen'd squared euclidean distance. */
case class SqDistF32(left: Expression, right: Expression) extends Float32VectorExpression {
  override protected def kernel: String = "graft.plans.VectorKernels.sqDistF32"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.sqDistF32(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistF32 =
    copy(left = l, right = r)
}

object NativeVector {
  import org.apache.spark.sql.GraftColumns.{column, expression}

  def dotF32(a: Column, b: Column): Column = column(DotF32(expression(a), expression(b)))
  def cosineF32(a: Column, b: Column): Column = column(CosineF32(expression(a), expression(b)))
  def sqDistF32(a: Column, b: Column): Column = column(SqDistF32(expression(a), expression(b)))

  /** Register `dot_f32` / `cosine_f32` / `sqdist_f32` for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", exprs => DotF32(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32", exprs => CosineF32(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sqdist_f32", exprs => SqDistF32(exprs.head, exprs(1)), "built-in")
  }
}
