package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation — the WordPiece
  * matching loop of Wu et al. (arXiv:1609.08144 §4.1) as used by BERT
  * (arXiv:1810.04805): at each position take the LONGEST vocabulary piece
  * that matches, prefix continuation pieces with "##", and collapse the
  * whole word to "[UNK]" the moment no piece matches. The reference
  * engine has no tokenizer (all record-level computation is user
  * lambdas, `streams/.../kstream/ValueMapper.java`); this is part of the
  * Spark-native LLM-pipeline layer, implemented at custom-Expression
  * tier (b) of the operator preference order so the per-word matching
  * loop runs inside whole-stage codegen instead of a 6-deep interpreted
  * higher-order-function pipeline.
  *
  * Code-point based throughout (positions, lengths, substrings count
  * Unicode code points, not UTF-16 chars), so segmentations agree with
  * engines whose `substr`/`len` are code-point semantics (DuckDB — the
  * oracle mirror) even for supplementary-plane input; pinned by
  * WordPieceSpec's emoji case.
  */
object WordPieceKernel {

  /** Segment one word against `vocab`; pieces joined by single spaces,
    * continuations "##"-prefixed, no-match => "[UNK]". Probes at most
    * `maxLen` set lookups per consumed position — O(len × maxLen).
    *
    * `bert = false` (the original mode): the vocab holds RAW substrings
    * and a piece may match at any position — "##" is an output marker
    * only. `bert = true` (the BERT convention, bert-base `vocab.txt`):
    * continuation pieces are DISTINCT vocab entries spelled with the
    * "##" prefix, so the interior lookup key is "##" + substring — a
    * vocab can admit `ing` word-initially while rejecting (or separately
    * admitting) `##ing` mid-word, which changes segmentations. */
  def encode(w: UTF8String, vocab: java.util.HashSet[String], maxLen: Int,
      bert: Boolean): UTF8String = {
    val s = w.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(s.length + 8)
    var pos = 0
    var pieces = 0
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var found = 0
      while (l >= 1 && found == 0) {
        val cand = new String(cps, pos, l)
        val key = if (bert && pos > 0) "##" + cand else cand
        if (vocab.contains(key)) found = l else l -= 1
      }
      if (found == 0) return UTF8String.fromString("[UNK]")
      if (pieces > 0) sb.append(" ##")
      sb.append(new String(cps, pos, found))
      pos += found
      pieces += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `wordpiece_encode(word)` against a run-provided vocabulary. The vocab
  * ships to executors as a task-binary reference object (one copy per
  * executor, like a broadcast — the BloomMightContain precedent); it is
  * bounded small by contract (top-K pieces + alphabet, K ≈ hundreds to a
  * few 10k), never corpus-sized. */
case class WordPieceEncode(child: Expression, vocab: Seq[String], maxPieceLen: Int,
    bertContinuations: Boolean = false)
    extends UnaryExpression {
  require(maxPieceLen >= 1)

  override def dataType: DataType = StringType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    WordPieceKernel.encode(input.asInstanceOf[UTF8String], set, maxPieceLen,
      bertContinuations)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordPieceKernel.encode($c, $ref, $maxPieceLen, $bertContinuations)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPiece {
  import org.apache.spark.sql.GraftColumns.{column, expression}

  /** `bertContinuations = false` keeps the original position-independent
    * vocab mode; `true` is the BERT convention — `##`-prefixed pieces are
    * distinct vocab entries matched only word-interior. */
  def encode(c: Column, vocab: Seq[String], maxPieceLen: Int = 6,
      bertContinuations: Boolean = false): Column =
    column(WordPieceEncode(expression(c), vocab, maxPieceLen, bertContinuations))
}
