package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Distributed Bloom filter over 64-bit hash columns — the runtime
  * prefilter for membership joins whose build side is too big to
  * broadcast as an exact set but whose bit array is not (a 100 M-n-gram
  * eval set is ~1.6 GB of longs but a 1% bloom is ~120 MB; at k=3/10
  * bits-per-key it prunes ~99% of probe rows before the exact join).
  *
  * Build is fully distributed: each partition folds its hashes into a
  * local bit array, arrays OR-merge in a treeReduce — the driver sees one
  * m/8-byte array, never the keys (same pattern as Spark's own
  * `DataFrameStatFunctions.bloomFilter`, reimplemented here so the bit
  * positions are a pure function of our 60-bit md5/fnv hashes and the
  * membership test is a codegen'd [[BloomMightContain]] predicate).
  *
  * Positions derive from the affine family `((h mod P)·(2i+1) + 7919·i)
  * mod P mod m` (P = 2³¹−1) — the same parameterization as the MinHash
  * signatures, k independent probes per key.
  */
object GraftBloom {
  private val P = 2147483647L // 2^31 - 1

  private def position(h: Long, i: Int, m: Int): Int =
    (Math.floorMod(Math.floorMod(h, P) * (2 * i + 1) + 7919L * i, P) % m).toInt

  private def setBits(words: Array[Long], h: Long, k: Int): Unit = {
    val m = words.length * 64
    var i = 0
    while (i < k) {
      val pos = position(h, i, m)
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Membership probe (no false negatives). Referenced from generated
    * code. */
  def mightContain(words: Array[Long], h: Long, k: Int): Boolean = {
    val m = words.length * 64
    var i = 0
    while (i < k) {
      val pos = position(h, i, m)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build the filter from a long-typed hash column; `numBits` must be a
    * multiple of 64. Distributed: per-partition fold + OR treeReduce. */
  def build(hashes: DataFrame, hashCol: String, numBits: Int, k: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(k >= 1)
    val nWords = numBits / 64
    hashes.select(hashCol).rdd
      .mapPartitions { it =>
        val w = new Array[Long](nWords)
        it.foreach(r => setBits(w, r.getLong(0), k))
        Iterator.single(w)
      }
      .treeReduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
  }

  /** Column predicate: `mightContain(bloom, hashCol)`. */
  def mightContainCol(c: Column, words: Array[Long], k: Int): Column = {
    import org.apache.spark.sql.GraftColumns.{column, expression}
    column(BloomMightContain(expression(c), words, k))
  }
}

/** Codegen'd bloom membership probe over a 64-bit hash column; the bit
  * array ships to executors as a task-binary reference object (one copy
  * per executor, like a broadcast). */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression with Predicate {

  override protected def nullSafeEval(input: Any): Any =
    GraftBloom.mightContain(words, input.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftBloom.mightContain($ref, $c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
