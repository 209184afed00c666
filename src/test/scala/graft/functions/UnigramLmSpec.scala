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
          { val s = new java.util.HashSet[String](); v.keys.foreach(s.add); s }, 6)
          .toString
        (seg == "[UNK]" || seg.split(" ").mkString == w) &&
          (wp == "[UNK]" || wp.split(" ").map(_.stripPrefix("##")).mkString == w)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("segment expression participates in whole-stage codegen") {
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(Unigram.segment(col("text"), Map("a" -> -1.0)))
      .queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
  }
}
