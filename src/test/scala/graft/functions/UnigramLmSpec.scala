package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.{Unigram, UnigramKernel}

/** Unigram-LM tokenizer: Viterbi optimality vs brute-force enumeration,
  * hard-EM objective improvement, partition-independence, codegen. */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Map(
    "a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.25),
    "ba" -> math.log(0.05), "abc" -> math.log(0.15), "c" -> math.log(0.05))

  private def jmap(m: Map[String, Double]) = {
    val h = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => h.put(k, v) }
    h
  }

  /** All segmentations of w into vocab pieces (len <= 6), scored by the
    * same left-to-right fold as the DP. */
  private def enumerate(w: String): Seq[(List[String], Double)] = {
    def go(i: Int): Seq[(List[String], Double)] =
      if (i == w.length) Seq((Nil, 0.0))
      else (1 to math.min(6, w.length - i)).flatMap { l =>
        val p = w.substring(i, i + l)
        vocab.get(p).toSeq.flatMap(lp =>
          go(i + l).map { case (rest, s) => (p :: rest, lp + s) })
      }
    // re-fold left-to-right so float addition order matches the DP
    go(0).map { case (ps, _) =>
      (ps, ps.foldLeft(0.0)((acc, p) => acc + vocab(p)))
    }
  }

  test("Viterbi score equals the brute-force max over all segmentations") {
    for (w <- Seq("ab", "abc", "abab", "ababc", "aabbc", "abcabcab", "bbbb")) {
      val best = enumerate(w).map(_._2).max
      val got = UnigramKernel.viterbiScore(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), jmap(vocab), 6)
      assert(got === best, s"word $w")
      // and the returned segmentation actually scores `best`
      val seg = UnigramKernel.viterbi(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), jmap(vocab), 6)
        .toString.split(" ").toList
      assert(seg.foldLeft(0.0)((acc, p) => acc + vocab(p)) === best, s"word $w: $seg")
    }
  }

  test("uncoverable words segment to [UNK] and score NaN") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("axb")
    assert(UnigramKernel.viterbi(u, jmap(vocab), 6).toString === "[UNK]")
    assert(UnigramKernel.viterbiScore(u, jmap(vocab), 6).isNaN)
  }

  test("score ties keep the longer last piece") {
    // "ab" as one piece vs "a b": make them tie exactly
    val v = Map("a" -> math.log(0.5), "b" -> math.log(0.5),
      "ab" -> (math.log(0.5) + math.log(0.5)))
    val got = UnigramKernel.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), jmap(v), 6)
    assert(got.toString === "ab")
  }

  test("hard-EM objective is non-decreasing over rounds on the corpus") {
    val wf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val model = UnigramLm.train(wf, rounds = 4)
    val objs = model.rounds.map(_.objective)
    assert(objs.size === 4)
    for (Seq(a, b) <- objs.sliding(2))
      assert(b >= a - 1e-9 * math.abs(a), s"objective regressed: $objs")
    // pruning bites: vocab shrinks from the seed within the first rounds
    assert(model.rounds.last.vocabSize <= model.rounds.head.vocabSize)
  }

  test("training is identical across partitionings") {
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val a = UnigramLm.train(base, rounds = 2)
    val b = UnigramLm.train(base.repartition(17), rounds = 2)
    assert(a.logProbs === b.logProbs)
  }

  test("round-trip property: pieces concatenate back to the word (or [UNK])") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random words over a-d plus an out-of-vocab char; random small vocabs
    val wordGen = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'd', 'x'))
      .map(_.mkString)
    val vocabGen = Gen.someOf(Seq("a", "b", "c", "d", "ab", "bc", "cd",
      "abc", "bcd", "abcd")).map(ps =>
      ps.map(p => p -> math.log(1.0 / (ps.size + 1))).toMap)
    val p = Prop.forAll(wordGen, vocabGen) { (w, v) =>
      if (w.isEmpty || v.isEmpty) true
      else {
        val seg = UnigramKernel.viterbi(
          org.apache.spark.unsafe.types.UTF8String.fromString(w), jmap(v), 6)
          .toString
        // WordPiece shares the contract modulo ## markers
        val wp = graft.plans.WordPieceKernel.encode(
          org.apache.spark.unsafe.types.UTF8String.fromString(w),
          { val s = new java.util.HashSet[String](); v.keys.foreach(s.add); s }, 6,
          false)
          .toString
        (seg == "[UNK]" || seg.split(" ").mkString == w) &&
          (wp == "[UNK]" || wp.split(" ").map(_.stripPrefix("##")).mkString == w)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("soft-EM kernel: logZ matches brute-force logsumexp and bounds Viterbi; " +
      "marginals sum to the expected segmentation length") {
    for (w <- Seq("ab", "abc", "abab", "ababc", "aabbc", "abcabcab")) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
      val v = jmap(vocab)
      val z = UnigramKernel.marginalScore(u, v, 6)
      val vit = UnigramKernel.viterbiScore(u, v, 6)
      assert(z >= vit - 1e-12, s"word $w: logZ $z < viterbi $vit")
      val scores = enumerate(w).map(_._2)
      val m = scores.max
      val exact = m + math.log(scores.map(s => math.exp(s - m)).sum)
      assert(math.abs(z - exact) < 1e-9, s"word $w: logZ $z vs exact $exact")
      // sum of posterior expected piece counts == E[segmentation length]
      val md = UnigramKernel.marginals(u, v, 6)
      val total = (0 until md.numElements())
        .map(i => md.valueArray().getDouble(i)).sum
      val expLen = enumerate(w)
        .map { case (ps, s) => ps.length * math.exp(s - exact) }.sum
      assert(math.abs(total - expLen) < 1e-9, s"word $w: $total vs $expLen")
    }
    // uncoverable word: NaN score, empty marginals
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("axb")
    assert(UnigramKernel.marginalScore(u, jmap(vocab), 6).isNaN)
    assert(UnigramKernel.marginals(u, jmap(vocab), 6).numElements() === 0)
  }

  test("soft-EM training reaches >= the hard-EM objective on the fixture") {
    val wf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    // soft EM prunes gradually (expected-count mass keeps weak pieces
    // alive a few rounds longer than a hard zero), so it needs more
    // rounds to reach the optimum hard EM hits by round 2 — on this
    // fixture both land on the identical 55-piece model by round 6
    val hard = UnigramLm.train(wf, rounds = 6)
    val soft = UnigramLm.train(wf, rounds = 6, soft = true)
    // apples-to-apples: evaluate BOTH final models under the marginal
    // likelihood (the objective soft EM optimizes; hard EM approximates)
    val (hardVit, hardMarg) = UnigramLm.evaluate(wf, hard)
    val (softVit, softMarg) = UnigramLm.evaluate(wf, soft)
    info(s"hard: viterbi $hardVit marginal $hardMarg; " +
      s"soft: viterbi $softVit marginal $softMarg")
    assert(softMarg >= hardMarg,
      s"soft-trained marginal $softMarg < hard-trained marginal $hardMarg")
    // logZ dominates the Viterbi score under ANY model
    assert(hardMarg >= hardVit && softMarg >= softVit)
    val objs = soft.rounds.map(_.objective)
    for (Seq(a, b) <- objs.sliding(2))
      assert(b >= a - 1e-6 * math.abs(a), s"soft objective regressed: $objs")
  }

  test("soft-EM training is identical across partitionings") {
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val a = UnigramLm.train(base, rounds = 2, soft = true)
    val b = UnigramLm.train(base.repartition(17), rounds = 2, soft = true)
    assert(a.logProbs === b.logProbs)
  }

  test("segment expression participates in whole-stage codegen") {
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(Unigram.segment(col("text"), Map("a" -> -1.0)))
      .queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
  }
}
