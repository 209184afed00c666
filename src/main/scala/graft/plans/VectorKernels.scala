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

  /** Integer dot product over array<long> (the micro-grid element type),
    * accumulated left-to-right in long with Java wrap-around semantics —
    * the exact operation sequence of
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, _ + _)`, so results
    * are bit-identical to the HOF form the integer-cosine oracles mirror
    * (r15: the HOF evaluates interpreted with per-element lambda
    * binding — this is the SemDeDup pair stage's per-pair kernel). Null
    * on length mismatch or any null element (zip_with's null padding /
    * propagation through the fold). */
  def dotI64(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Integer squared distance over array<long>: sum of (x-y)^2
    * left-to-right in long, wrap-around — bit-identical to
    * `aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)), 0L, _ + _)`.
    * Null rules as [[dotI64]]. */
  def sqDistI64(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Exact 128-bit integer threshold test `num·dot² >= den·na·nb` for
    * NON-NEGATIVE inputs (the integer-cosine filter: callers gate
    * `dot > 0` first; na/nb are sums of squares). Replaces the
    * per-pair decimal(19,0) arithmetic — four Decimal casts and two
    * Decimal multiplies per candidate pair — with two unsigned 128-bit
    * products (`Math.multiplyHigh`). Exactness (r16, ADVICE r15: the
    * old comment understated the input bound 2x): dot,na,nb <= 2^48 on
    * the micro grid (64 dims × (2^21)² = 2^48), so num·dot² <= 2^105 and
    * den·na·nb <= 2^105 — both fit 128 bits with margin for
    * num,den <= 512 (2^9). */
  def intCosGE(dot: Long, na: Long, nb: Long, num: Int, den: Int): Boolean = {
    // u128 = (hi, lo) of x*y for x,y >= 0; scaling by small positive c
    // needs the UNSIGNED high product of the low word (Java 17 has no
    // unsignedMultiplyHigh): uhi(lo, c) = multiplyHigh(lo, c) + (lo < 0 ? c : 0)
    var lhsHi = Math.multiplyHigh(dot, dot)
    var lhsLo = dot * dot
    var c = num.toLong
    lhsHi = lhsHi * c + Math.multiplyHigh(lhsLo, c) + (if (lhsLo < 0) c else 0L)
    lhsLo = lhsLo * c
    var rhsHi = Math.multiplyHigh(na, nb)
    var rhsLo = na * nb
    c = den.toLong
    rhsHi = rhsHi * c + Math.multiplyHigh(rhsLo, c) + (if (rhsLo < 0) c else 0L)
    rhsLo = rhsLo * c
    if (lhsHi != rhsHi) lhsHi > rhsHi
    else java.lang.Long.compareUnsigned(lhsLo, rhsLo) >= 0
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

/** Base for the binary array<long> -> long kernels (the micro-grid
  * integer twins of [[Float32VectorExpression]]): null-safe, nullable,
  * codegen'd as one static call. */
abstract class Int64VectorExpression extends BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType => LT}

  protected def kernel: String

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LT, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Long

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = $kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
}

/** `dot_i64(a, b)` — codegen'd integer dot product over array<bigint>. */
case class DotI64(left: Expression, right: Expression) extends Int64VectorExpression {
  override protected def kernel: String = "graft.plans.VectorKernels.dotI64"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Long =
    VectorKernels.dotI64(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotI64 =
    copy(left = l, right = r)
}

/** `sqdist_i64(a, b)` — codegen'd integer squared distance. */
case class SqDistI64(left: Expression, right: Expression) extends Int64VectorExpression {
  override protected def kernel: String = "graft.plans.VectorKernels.sqDistI64"
  override protected def evalKernel(a: ArrayData, b: ArrayData): java.lang.Long =
    VectorKernels.sqDistI64(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistI64 =
    copy(left = l, right = r)
}

/** `int_cos_ge(dot, na, nb)` — exact `num·dot² >= den·na·nb` over
  * non-negative longs (the integer-cosine threshold; see
  * [[VectorKernels.intCosGE]] for the 128-bit arithmetic and bounds). */
case class IntCosGE(dot: Expression, na: Expression, nb: Expression,
    num: Int, den: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{BooleanType, LongType => LT}

  override def first: Expression = dot
  override def second: Expression = na
  override def third: Expression = nb
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    dot.nullable || na.nullable || nb.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LT)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three bigint inputs")

  override protected def nullSafeEval(d: Any, a: Any, b: Any): Any =
    VectorKernels.intCosGE(d.asInstanceOf[Long], a.asInstanceOf[Long],
      b.asInstanceOf[Long], num, den)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, a, b) => {
      s"${ev.value} = graft.plans.VectorKernels.intCosGE($d, $a, $b, $num, $den);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IntCosGE = copy(dot = f, na = s, nb = t)
}

object NativeVector {
  import org.apache.spark.sql.GraftColumns.{column, expression}

  def dotF32(a: Column, b: Column): Column = column(DotF32(expression(a), expression(b)))
  def cosineF32(a: Column, b: Column): Column = column(CosineF32(expression(a), expression(b)))
  def sqDistF32(a: Column, b: Column): Column = column(SqDistF32(expression(a), expression(b)))
  def dotI64(a: Column, b: Column): Column = column(DotI64(expression(a), expression(b)))
  def sqDistI64(a: Column, b: Column): Column = column(SqDistI64(expression(a), expression(b)))
  def intCosGE(dot: Column, na: Column, nb: Column, num: Int, den: Int): Column =
    column(IntCosGE(expression(dot), expression(na), expression(nb), num, den))

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
