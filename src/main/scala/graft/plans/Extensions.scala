package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product fold
  *
  *   `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0d,
  *              (acc, v) -> acc + v)`
  *
  * over `array<float>` columns into the codegen'd [[DotF32]] kernel. The
  * kernel accumulates in double precision in the same left-to-right
  * element order, so the rewrite is bit-exact (VectorKernelSpec pins the
  * equivalence); it removes the per-element lambda-binding interpreter
  * from the hot path — the 100 TB difference between HOF cosine and the
  * native kernel measured at ~5x in BENCH ann-cosine-topk.
  *
  * This is the rule tier of the extension ladder: users who hand-write
  * the SQL/HOF formulation get the native plan automatically; library
  * users already go through `VectorFunctions.dotProduct`.
  */
object RewriteVectorHof extends Rule[LogicalPlan] {

  // containsNull must be false: the kernel reads raw floats, while the
  // HOF fold would propagate a null ELEMENT to a null result — rewriting
  // nullable-element arrays would change semantics for rows with null
  // entries, so those keep the interpreted path
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  /** finish lambda is identity: (acc) -> acc */
  private def isIdentity(l: LambdaFunction): Boolean = (l.function, l.arguments) match {
    case (v: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) => v.exprId == a.exprId
    case _ => false
  }

  /** merge lambda is (acc, v) -> acc + v (either operand order). */
  private def isAddFold(l: LambdaFunction): Boolean = (l.function, l.arguments) match {
    case (Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, v: NamedLambdaVariable)) =>
      (x.exprId == a.exprId && y.exprId == v.exprId) ||
        (x.exprId == v.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** zip lambda is (x, y) -> cast(x as double) * cast(y as double). */
  private def isDoubleMul(l: LambdaFunction): Boolean = (l.function, l.arguments) match {
    case (Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                   Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
          Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable)) =>
      x.exprId == lx.exprId && y.exprId == ly.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(zw: ZipWith, Literal(0.0, DoubleType),
                          merge: LambdaFunction, finish: LambdaFunction)
          if isFloatArray(zw.left) && isFloatArray(zw.right) &&
            (zw.function match {
              case l: LambdaFunction => isDoubleMul(l)
              case _ => false
            }) &&
            isAddFold(merge) && isIdentity(finish) =>
        DotF32(zw.left, zw.right)
    }
}

/** Session-extension entry point: wire the graft surface into any
  * SparkSession via config — no imperative register calls needed:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects the SQL function surface (fnv64 / shingle_hashes /
  * simhash64_native / dot_f32 / cosine_f32 / sqdist_f32 /
  * nfc_normalize / strip_accents) and the [[RewriteVectorHof]]
  * optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("fnv64"),
      info(classOf[Fnv64], "fnv64"),
      exprs => Fnv64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info(classOf[ShingleHashes], "shingle_hashes"),
      exprs => ShingleHashes(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("simhash64_native"),
      info(classOf[SimHash64Native], "simhash64_native"),
      exprs => SimHash64Native(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("dot_f32"),
      info(classOf[DotF32], "dot_f32"),
      exprs => DotF32(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("cosine_f32"),
      info(classOf[CosineF32], "cosine_f32"),
      exprs => CosineF32(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("sqdist_f32"),
      info(classOf[SqDistF32], "sqdist_f32"),
      exprs => SqDistF32(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info(classOf[NfcNormalize], "nfc_normalize"),
      exprs => NfcNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      info(classOf[StripAccents], "strip_accents"),
      exprs => StripAccents(exprs.head)))
    ext.injectOptimizerRule(_ => RewriteVectorHof)
  }
}
