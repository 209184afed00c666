package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization kernels — the normalization pass a
  * multilingual corpus needs BEFORE tokenization/dedup (café composed vs
  * decomposed must fingerprint identically). JDK-only
  * (`java.text.Normalizer`), surfaced as codegen'd Catalyst expressions
  * so the pass stays inside whole-stage codegen; Spark has no built-in
  * NFC/accent-strip (`lower`/`trim` only), which puts this squarely in
  * custom-Expression tier (b) of the operator preference order.
  *
  * Reference frame: the reference ships record values as opaque bytes
  * and leaves canonicalization to the consumer; this is the consumer-side
  * normalize step, semantics matched to utf8proc (DuckDB's
  * `nfc_normalize` / `strip_accents`) so the oracle can mirror it.
  */
object UnicodeKernels {

  /** Canonical composition (NFC). Strings already in NFC (the common
    * case — ASCII fast path inside the JDK) pass through untouched. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    if (out eq str) s else UTF8String.fromString(out)
  }

  /** Accent/diacritic strip: canonical decomposition (NFD) then drop
    * every combining mark (`\p{Mn}`), recompose. é→e, ñ→n; ß and CJK
    * pass through (no combining marks) — the same contract as
    * utf8proc/DuckDB `strip_accents`. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < nfd.length && !hasMark) {
      if (Character.getType(nfd.charAt(i)) == Character.NON_SPACING_MARK) hasMark = true
      i += 1
    }
    if (!hasMark) return s // ASCII/no-accent fast path: zero allocation
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string)` — codegen'd Unicode canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `strip_accents(string)` — codegen'd diacritic removal (NFD − Mn → NFC). */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernels.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeKernels.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeNorm {
  import org.apache.spark.sql.GraftColumns.{column, expression}

  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def stripAccents(c: Column): Column = column(StripAccents(expression(c)))

  /** Register `nfc_normalize` / `strip_accents` for SQL use (same names
    * as the DuckDB twins). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents", exprs => StripAccents(exprs.head), "built-in")
  }
}
