package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece) Viterbi segmentation — Kudo,
  * arXiv:1804.10959 §3: each vocabulary piece carries an independent
  * log-probability and a word's segmentation is the max-probability
  * piece sequence, found by one left-to-right DP pass. The third member
  * of the tokenizer triad beside the BPE merge-replay (q_bpe_encode) and
  * WordPiece maximal munch (q_wordpiece_encode).
  *
  * Determinism contract: DP improvements are STRICT (`>`), and at each
  * end position candidate last-piece lengths are probed LONGEST FIRST —
  * so on an exact score tie the segmentation with the longer last piece
  * wins. Same contract in eval and codegen; pinned by UnigramSpec's
  * brute-force optimality property. Code-point positions throughout
  * (matches the WordPiece kernel). A word with any uncovered position
  * segments to "[UNK]".
  */
object UnigramKernel {

  /** Max-prob segmentation, pieces joined by single spaces. */
  def viterbi(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): UTF8String = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val back = run(cps, n, vocab, maxLen)
    if (back == null) return UTF8String.fromString("[UNK]")
    val sb = new java.lang.StringBuilder(n + 8)
    renderFrom(sb, cps, back, n)
    UTF8String.fromString(sb.toString)
  }

  /** The winning path's total log-prob (NaN when uncoverable/empty —
    * callers treat NaN as "[UNK] scored"). */
  def viterbiScore(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Double = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return Double.NaN
    val dp = scores(cps, n, vocab, maxLen)
    if (dp(n) == Double.NegativeInfinity) Double.NaN else dp(n)
  }

  private def scores(cps: Array[Int], n: Int,
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int): Array[Double] = {
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    dp(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = math.min(maxLen, j)
      while (l >= 1) { // longest-first: ties keep the longer last piece
        val i = j - l
        if (dp(i) != Double.NegativeInfinity) {
          val p = vocab.get(new String(cps, i, l))
          if (p != null && dp(i) + p > dp(j)) dp(j) = dp(i) + p
        }
        l -= 1
      }
      j += 1
    }
    dp
  }

  /** DP with backpointers; null when position n is unreachable. */
  private def run(cps: Array[Int], n: Int,
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int): Array[Int] = {
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    dp(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = math.min(maxLen, j)
      while (l >= 1) {
        val i = j - l
        if (dp(i) != Double.NegativeInfinity) {
          val p = vocab.get(new String(cps, i, l))
          if (p != null && dp(i) + p > dp(j)) { dp(j) = dp(i) + p; back(j) = i }
        }
        l -= 1
      }
      j += 1
    }
    if (back(n) == -1) null else back
  }

  private def renderFrom(sb: java.lang.StringBuilder, cps: Array[Int],
      back: Array[Int], n: Int): Unit = {
    val i = back(n)
    if (i > 0) { renderFrom(sb, cps, back, i); sb.append(' ') }
    sb.append(new String(cps, i, n - i))
  }

  // ---- soft-EM support: forward-backward over the segmentation lattice
  // (Kudo, arXiv:1804.10959 §3.2 — the paper's exact E-step, where hard
  // EM substitutes the Viterbi path). Same lattice, same longest-first
  // probe bound, log-space throughout.

  /** Numerically stable log(exp(a) + exp(b)). */
  private def lse(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  private def forward(cps: Array[Int], n: Int,
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int): Array[Double] = {
    val a = Array.fill(n + 1)(Double.NegativeInfinity)
    a(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = math.min(maxLen, j)
      while (l >= 1) {
        val i = j - l
        if (a(i) != Double.NegativeInfinity) {
          val p = vocab.get(new String(cps, i, l))
          if (p != null) a(j) = lse(a(j), a(i) + p)
        }
        l -= 1
      }
      j += 1
    }
    a
  }

  /** log Z(w): total probability over ALL segmentations (NaN when
    * uncoverable/empty). Always >= [[viterbiScore]] — the Viterbi path is
    * one term of the sum. */
  def marginalScore(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Double = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return Double.NaN
    val a = forward(cps, n, vocab, maxLen)
    if (a(n) == Double.NegativeInfinity) Double.NaN else a(n)
  }

  /** Posterior expected piece counts E[count(p) | w] over the lattice:
    * for each occurrence w[i..i+l), weight = exp(alpha(i) + logp +
    * beta(i+l) - logZ), summed per distinct piece. Empty map when the
    * word is uncoverable (the hard path's [UNK] analogue). Deterministic
    * per word — key order follows the (i, longest-first l) scan. */
  def marginals(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): org.apache.spark.sql.catalyst.util.MapData = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    val acc = new java.util.LinkedHashMap[String, java.lang.Double]()
    if (n > 0) {
      val a = forward(cps, n, vocab, maxLen)
      if (a(n) != Double.NegativeInfinity) {
        val b = Array.fill(n + 1)(Double.NegativeInfinity)
        b(n) = 0.0
        var i = n - 1
        while (i >= 0) {
          var l = math.min(maxLen, n - i)
          while (l >= 1) {
            if (b(i + l) != Double.NegativeInfinity) {
              val p = vocab.get(new String(cps, i, l))
              if (p != null) b(i) = lse(b(i), p + b(i + l))
            }
            l -= 1
          }
          i -= 1
        }
        i = 0
        while (i < n) {
          var l = math.min(maxLen, n - i)
          while (l >= 1) {
            if (a(i) != Double.NegativeInfinity &&
                b(i + l) != Double.NegativeInfinity) {
              val piece = new String(cps, i, l)
              val p = vocab.get(piece)
              if (p != null) {
                val wgt = math.exp(a(i) + p + b(i + l) - a(n))
                val prev = acc.get(piece)
                acc.put(piece, if (prev == null) wgt else prev + wgt)
              }
            }
            l -= 1
          }
          i += 1
        }
      }
    }
    val keys = new Array[Any](acc.size)
    val vals = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue.doubleValue()
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** Integer-lattice forward-backward (r12): [[UnigramKernel.marginals]]
  * re-founded on the fixed-point log2 grid so the soft E-step is
  * bit-exact cross-engine — logsumexp via [[graft.functions.UnigramIntLm
  * .logAdd]] (delta-LUT), posterior occurrence weights via
  * [[graft.functions.UnigramIntLm.exp2Fp]] (2^-20 count units). Same
  * lattice, same scan order (positions ascending, candidate lengths
  * longest-first) as the float kernel; the SQL mirror nests the logadd
  * chain in exactly the longest-first fold order, since quantized logadd
  * is commutative but NOT associative. */
object UnigramIntKernel {
  import graft.functions.UnigramIntLm.{NegInf, exp2Fp, logAdd}

  private def forward(cps: Array[Int], n: Int,
      vocab: java.util.HashMap[String, java.lang.Long], maxLen: Int): Array[Long] = {
    val a = Array.fill(n + 1)(NegInf)
    a(0) = 0L
    var j = 1
    while (j <= n) {
      var l = math.min(maxLen, j)
      while (l >= 1) {
        val i = j - l
        if (a(i) != NegInf) {
          val p = vocab.get(new String(cps, i, l))
          if (p != null) a(j) = logAdd(a(j), a(i) + p)
        }
        l -= 1
      }
      j += 1
    }
    a
  }

  /** Posterior expected piece counts in 2^-20 fixed-point units:
    * weight per occurrence w[i..i+l) = exp2Fp(max(0, logZ − (α(i) +
    * score + β(i+l)))) — the deficit clamps at 0 because LUT rounding
    * can nudge one path's score a few ulps past the quantized total.
    * Empty map when the word is uncoverable. */
  def marginalsFp(w: UTF8String, vocab: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): org.apache.spark.sql.catalyst.util.MapData = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    val acc = new java.util.LinkedHashMap[String, java.lang.Long]()
    if (n > 0) {
      val a = forward(cps, n, vocab, maxLen)
      if (a(n) != NegInf) {
        val b = Array.fill(n + 1)(NegInf)
        b(n) = 0L
        var i = n - 1
        while (i >= 0) {
          var l = math.min(maxLen, n - i)
          while (l >= 1) {
            if (b(i + l) != NegInf) {
              val p = vocab.get(new String(cps, i, l))
              if (p != null) b(i) = logAdd(b(i), p + b(i + l))
            }
            l -= 1
          }
          i -= 1
        }
        i = 0
        while (i < n) {
          var l = math.min(maxLen, n - i)
          while (l >= 1) {
            if (a(i) != NegInf && b(i + l) != NegInf) {
              val piece = new String(cps, i, l)
              val p = vocab.get(piece)
              if (p != null) {
                val wgt = exp2Fp(math.max(0L, a(n) - (a(i) + p + b(i + l))))
                val prev = acc.get(piece)
                acc.put(piece, if (prev == null) wgt else prev + wgt)
              }
            }
            l -= 1
          }
          i += 1
        }
      }
    }
    val keys = new Array[Any](acc.size)
    val vals = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue.longValue()
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** `unigram_segment(word)` under a run-provided (piece -> logprob) model;
  * the model ships as a task-binary reference object, bounded small by
  * contract (seed top-K + alphabet). */
case class UnigramSegment(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.viterbi(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnigramKernel.viterbi($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** `unigram_score(word)` — the winning path's total log-prob (NaN when
  * the word is uncoverable). */
case class UnigramScore(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.viterbiScore(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnigramKernel.viterbiScore($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramScore =
    copy(child = newChild)
}

/** `unigram_marginals(word)` — posterior expected piece counts
  * (map<piece, E[count]>) over the full segmentation lattice: the soft-EM
  * E-step quantity. */
case class UnigramMarginals(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, DoubleType, valueContainsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.marginals(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnigramKernel.marginals($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramMarginals =
    copy(child = newChild)
}

/** `unigram_marginals_fp(word)` — posterior expected piece counts in
  * 2^-20 fixed-point units under an INTEGER (piece -> fixed-point log2)
  * model: the soft E-step on the bit-exact grid (r12). */
case class UnigramMarginalsFp(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType,
      org.apache.spark.sql.types.LongType, valueContainsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    UnigramIntKernel.marginalsFp(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramIntVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnigramIntKernel.marginalsFp($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramMarginalsFp =
    copy(child = newChild)
}

/** `unigram_marginal_score(word)` — log Z(w), the marginal likelihood over
  * all segmentations (the soft-EM objective term; NaN when uncoverable). */
case class UnigramMarginalScore(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Double], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.marginalScore(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.UnigramKernel.marginalScore($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramMarginalScore =
    copy(child = newChild)
}

object Unigram {
  import org.apache.spark.sql.GraftColumns.{column, expression}

  private def toMap(logProbs: Map[String, Double]) = {
    val m = new java.util.HashMap[String, java.lang.Double](logProbs.size * 2)
    logProbs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  def segment(c: Column, logProbs: Map[String, Double], maxPieceLen: Int = 6): Column =
    column(UnigramSegment(expression(c), toMap(logProbs), maxPieceLen))

  def score(c: Column, logProbs: Map[String, Double], maxPieceLen: Int = 6): Column =
    column(UnigramScore(expression(c), toMap(logProbs), maxPieceLen))

  def marginals(c: Column, logProbs: Map[String, Double], maxPieceLen: Int = 6): Column =
    column(UnigramMarginals(expression(c), toMap(logProbs), maxPieceLen))

  def marginalScore(c: Column, logProbs: Map[String, Double], maxPieceLen: Int = 6): Column =
    column(UnigramMarginalScore(expression(c), toMap(logProbs), maxPieceLen))

  def marginalsFp(c: Column, scoresFp: Map[String, Long], maxPieceLen: Int = 6): Column = {
    val m = new java.util.HashMap[String, java.lang.Long](scoresFp.size * 2)
    scoresFp.foreach { case (k, v) => m.put(k, v) }
    column(UnigramMarginalsFp(expression(c), m, maxPieceLen))
  }
}
