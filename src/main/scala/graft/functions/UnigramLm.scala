package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Unigram

/** Unigram-LM tokenizer training (Kudo, arXiv:1804.10959 §3.2) in its
  * hard-EM (Viterbi-EM) form:
  *
  *   seed   — candidate pieces = all substrings up to [[maxPieceLen]],
  *            frequency-ranked, top-K + the full character alphabet
  *            (coverage guarantee); initial probs ∝ substring frequency.
  *   E-step — Viterbi-segment every DISTINCT word under the current
  *            model (codegen'd [[graft.plans.UnigramSegment]]), count
  *            piece usage weighted by word frequency.
  *   M-step — re-normalize: logp(piece) = log(count / total). Pieces
  *            with zero usage drop out (the paper's pruning, taken to
  *            its hard-EM limit); single characters keep a floor count
  *            of 1 so every word stays coverable.
  *
  * Hard EM monotonically improves the VITERBI objective (sum over words
  * of f·score(best path)): the M-step maximizes complete-data likelihood
  * for the current hard assignments, and the next E-step can only find
  * equal-or-better paths — pinned by UnigramSpec. (Soft EM with
  * forward-backward marginals is the paper's exact form; hard EM is the
  * standard large-scale approximation and keeps every per-round job a
  * plain explode + groupBy.)
  *
  * Scale shape (the BPE-trainer contract): the corpus collapses onto the
  * distinct-word table once; each round is ONE distributed pass (segment
  * + explode + partial-agg'd count) whose result — the vocab table,
  * bounded by topK + alphabet — is collected to the driver; the model
  * ships back as a task-binary reference object. Float log-probs make
  * the model engine-internal, so catalog queries over it are rows-only
  * with UnigramSpec property pins (the q_ann_ivf adjudication).
  */
object UnigramLm {

  final case class RoundStats(round: Int, vocabSize: Int, objective: Double)

  final case class Model(logProbs: Map[String, Double], maxPieceLen: Int,
      rounds: Seq[RoundStats])

  /** Seed candidates: (piece, weighted frequency) for the top-K
    * substrings of length 2..maxPieceLen plus every single character.
    * Bounded collect: topK + |alphabet| rows. */
  def seedCounts(wf: DataFrame, maxPieceLen: Int, topK: Int): Seq[(String, Long)] = {
    val lens = array((2 to maxPieceLen).map(lit): _*)
    val pieceArr = flatten(transform(sequence(lit(1), length(col("w"))), i =>
      filter(transform(lens, l =>
        when(i + l - 1 <= length(col("w")), col("w").substr(i, l))),
        p => p.isNotNull)))
    val top = wf.select(explode(pieceArr).as("piece"), col("f"))
      .groupBy("piece").agg(sum("f").as("pf"))
      .orderBy(col("pf").desc, col("piece")).limit(topK)
    val chars = wf.select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("piece"), col("f"))
      .groupBy("piece").agg(sum("f").as("pf"))
    top.unionByName(chars).groupBy("piece").agg(max("pf").as("pf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
  }

  private def normalize(counts: Seq[(String, Long)]): Map[String, Double] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => p -> math.log(c / total) }.toMap
  }

  /** Run `rounds` of hard EM over the distinct-word table `wf`
    * (columns `w`, `f`). */
  def train(wf: DataFrame, rounds: Int, maxPieceLen: Int = 6,
      topK: Int = 400): Model = {
    val alphabet: Set[String] = wf
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("c")).distinct()
      .collect().map(_.getString(0)).toSet
    var logp = normalize(seedCounts(wf, maxPieceLen, topK))
    val stats = Seq.newBuilder[RoundStats]
    for (r <- 1 to rounds) {
      // E-step: segment + usage counts; objective rides the same pass
      val seg = wf.select(col("f"),
        Unigram.segment(col("w"), logp, maxPieceLen).as("sw"),
        Unigram.score(col("w"), logp, maxPieceLen).as("sc"))
      val agg = seg.select(col("f"), col("sw"), col("sc"))
        .agg(sum(col("f").cast("double") * col("sc")).as("obj"))
      val objective = agg.head().getDouble(0)
      val counts = seg
        .select(explode(split(col("sw"), " ")).as("piece"), col("f"))
        .filter(col("piece") =!= "[UNK]")
        .groupBy("piece").agg(sum("f").as("cnt"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      // M-step: prune unused pieces, floor the alphabet for coverage
      val floored = (counts.keySet ++ alphabet).toSeq.map { p =>
        p -> math.max(counts.getOrElse(p, 0L), if (alphabet(p)) 1L else 0L)
      }.filter(_._2 > 0)
      logp = normalize(floored)
      stats += RoundStats(r, logp.size, objective)
    }
    Model(logp, maxPieceLen, stats.result())
  }
}
