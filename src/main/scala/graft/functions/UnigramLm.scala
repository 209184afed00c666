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

  /** Evaluate a trained model on the distinct-word table: (Viterbi
    * objective = sum f·score(best path), marginal objective = sum
    * f·logZ). logZ >= the Viterbi score word-by-word, so the second
    * component dominates the first under ANY model. One distributed
    * pass. */
  def evaluate(wf: DataFrame, model: Model): (Double, Double) = {
    val r = wf.select(
      sum(col("f").cast("double") *
        Unigram.score(col("w"), model.logProbs, model.maxPieceLen)).as("v"),
      sum(col("f").cast("double") *
        Unigram.marginalScore(col("w"), model.logProbs, model.maxPieceLen)).as("m"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Run `rounds` of EM over the distinct-word table `wf` (columns `w`,
    * `f`).
    *
    * `soft = false` (default): hard/Viterbi EM — counts from the single
    * best path, objective = sum f·viterbiScore. `soft = true`: the
    * paper's exact E-step — forward-backward posterior expected counts
    * over the whole lattice ([[Unigram.marginals]], one extra codegen'd
    * expression mirroring the score DP), objective = sum f·logZ (the
    * marginal likelihood; >= the Viterbi objective under the same model
    * term-by-term). Soft expected counts are quantized to 1e-6 units and
    * aggregated as BIGINT micro-counts, so the trained model is
    * bit-identical under any partitioning (the LinearModel discipline);
    * pieces expected fewer than 1 use prune (the paper prunes bottom-η
    * by likelihood loss; a fixed floor keeps the round a single pass),
    * and the alphabet is floored at one expected use for coverage. */
  def train(wf: DataFrame, rounds: Int, maxPieceLen: Int = 6,
      topK: Int = 400, soft: Boolean = false): Model = {
    val alphabet: Set[String] = wf
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("c")).distinct()
      .collect().map(_.getString(0)).toSet
    var logp = normalize(seedCounts(wf, maxPieceLen, topK))
    val stats = Seq.newBuilder[RoundStats]
    // soft counts carry 1e-6 resolution; hard counts are whole uses. The
    // unit cancels in normalize(), so logp is comparable across modes.
    val unit = if (soft) 1000000L else 1L
    for (r <- 1 to rounds) {
      // E-step: counts + objective ride one distributed pass
      val (objective, counts): (Double, Map[String, Long]) =
        if (soft) {
          val seg = wf.select(col("f"),
            Unigram.marginals(col("w"), logp, maxPieceLen).as("m"),
            Unigram.marginalScore(col("w"), logp, maxPieceLen).as("sc"))
          val obj = seg.agg(sum(col("f").cast("double") * col("sc")))
            .head().getDouble(0)
          val micro = seg
            .select(explode(col("m")).as(Seq("piece", "wgt")), col("f"))
            .groupBy("piece")
            .agg(sum(col("f") * round(col("wgt") * lit(1e6)).cast("long"))
              .as("cnt"))
            .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
          (obj, micro)
        } else {
          val seg = wf.select(col("f"),
            Unigram.segment(col("w"), logp, maxPieceLen).as("sw"),
            Unigram.score(col("w"), logp, maxPieceLen).as("sc"))
          val obj = seg.select(col("f"), col("sw"), col("sc"))
            .agg(sum(col("f").cast("double") * col("sc")).as("obj"))
            .head().getDouble(0)
          val cnt = seg
            .select(explode(split(col("sw"), " ")).as("piece"), col("f"))
            .filter(col("piece") =!= "[UNK]")
            .groupBy("piece").agg(sum("f").as("cnt"))
            .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
          (obj, cnt)
        }
      // M-step: prune (hard: unused; soft: expected < 1 use — the
      // flattest threshold at which soft pruning matches hard pruning's
      // bite, so the two modes converge to comparably sharp models),
      // floor the alphabet for coverage
      val keepMin = if (soft) unit else 1L
      val floored = (counts.keySet ++ alphabet).toSeq.map { p =>
        p -> math.max(counts.getOrElse(p, 0L), if (alphabet(p)) unit else 0L)
      }.filter { case (p, c) => if (alphabet(p)) c > 0 else c >= keepMin }
      logp = normalize(floored)
      stats += RoundStats(r, logp.size, objective)
    }
    Model(logp, maxPieceLen, stats.result())
  }
}
