package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Unigram

/** Integer-lattice Unigram-LM trainer (r11) — the hard-EM trainer of
  * [[UnigramLm]] re-founded on FIXED-POINT log2 arithmetic so the whole
  * 3-round loop is bit-exact cross-engine (the q_kmeans_clusters /
  * LinearModel.SigTable discipline applied to the tokenizer trainer).
  *
  * The model's "log-probability" is `ilog2(c) − ilog2(T)` in 2^-16
  * units, where ilog2 is an integer log2: exponent from the bit length,
  * mantissa from a 1024-entry DATA-INDEPENDENT lookup table
  * (round(log2((1024+i)/1024) · 2^16)). Scores are integers, so Viterbi
  * DP sums and comparisons are exact — the existing
  * [[graft.plans.Unigram]] codegen kernel runs them as integer-valued
  * doubles (|score sums| << 2^53) with its pinned tie-break (strict
  * improvement, candidate lengths probed longest-first). Seeding, the
  * E-step counts and the M-step prune/alphabet-floor are verbatim
  * [[UnigramLm.train]] hard-mode semantics.
  *
  * The float trainer stays the production twin (spec-pinned by
  * UnigramLmSpec); this one is what q_unigram_train / q_unigram_encode
  * expose, with a full DuckDB oracle mirroring every stage (see
  * LlmPipeline's generated CTE chain).
  */
object UnigramIntLm {

  /** 2^16 fixed-point scale. */
  val F: Long = 65536L

  /** Mantissa table: round(log2((1024+i)/1024) · 2^16), i in [0, 1024).
    * Data-independent — interpolated verbatim into the SQL oracle. */
  val Log2Lut: Array[Long] = Array.tabulate(1024)(i =>
    math.round(math.log((1024.0 + i) / 1024.0) / math.log(2.0) * 65536.0))

  /** Fixed-point log2: exponent · 2^16 + mantissa LUT. Exact mirror of
    * the SQL form `(length(bin(c))-1)*65536 + lut[((c*1024 >> b) - 1024)]`. */
  def ilog2(c: Long): Long = {
    require(c >= 1, s"ilog2 domain: $c")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(c)
    val m = ((c << 10) >> b).toInt
    b * F + Log2Lut(m - 1024)
  }

  /** Normalize counts to fixed-point log2 scores (negative longs). */
  def scores(v: Map[String, Long]): Map[String, Long] = {
    val t = ilog2(v.values.sum)
    v.map { case (p, c) => p -> (ilog2(c) - t) }
  }

  /** `rounds` of hard (Viterbi) EM over the distinct-word table
    * (`w`, `f`); returns the final model as piece -> fixed-point score.
    * Each round is ONE distributed segment+count pass with the bounded
    * vocab collected to the driver (the BPE-trainer contract). */
  def train(wf: DataFrame, rounds: Int, maxPieceLen: Int = 6,
      topK: Int = 400): Map[String, Long] = {
    val alphabet: Set[String] = wf
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("c")).distinct()
      .collect().map(_.getString(0)).toSet
    var v: Map[String, Long] =
      UnigramLm.seedCounts(wf, maxPieceLen, topK).toMap
    for (_ <- 1 to rounds) {
      val sd = scores(v).map { case (p, x) => p -> x.toDouble }
      val cnt = wf
        .select(explode(split(
          Unigram.segment(col("w"), sd, maxPieceLen), " ")).as("piece"),
          col("f"))
        .filter(col("piece") =!= "[UNK]")
        .groupBy("piece").agg(sum("f").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      v = (cnt.keySet ++ alphabet).iterator.map { p =>
        p -> math.max(cnt.getOrElse(p, 0L), if (alphabet(p)) 1L else 0L)
      }.filter(_._2 >= 1L).toMap
    }
    scores(v)
  }
}
