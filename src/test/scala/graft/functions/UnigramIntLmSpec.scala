package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the integer-lattice unigram trainer (the q_unigram_train /
  * q_unigram_encode catalog definition since r11). */
class UnigramIntLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ilog2 is the 10-bit-mantissa quantized log2: within the mantissa " +
      "resolution, monotone, exact on powers of two") {
    import UnigramIntLm.ilog2
    // exact at powers of two (mantissa LUT[0] = 0)
    for (b <- 0 to 40)
      assert(ilog2(1L << b) === b * 65536L, s"2^$b")
    // the mantissa truncates to 10 bits, so the log2 error is bounded by
    // log2(1 + 1/1024) * 2^16 ~ 92.3 fixed-point quanta (~0.0014 in
    // log2) — identical truncation in both engines is what the oracle
    // relies on, not sub-quantum accuracy
    for (c <- Seq(3L, 7L, 100L, 999L, 12345L, 999983L, 1L << 35)) {
      val exact = math.log(c.toDouble) / math.log(2.0) * 65536.0
      val err = exact - ilog2(c) // truncation: ilog2 <= exact (+rounding)
      assert(err >= -1.0 && err <= 93.0,
        s"ilog2($c) = ${ilog2(c)} vs $exact")
    }
    // monotone non-decreasing across a dense range
    var prev = ilog2(1L)
    for (c <- 2L to 5000L) {
      val v = ilog2(c)
      assert(v >= prev, s"ilog2 not monotone at $c")
      prev = v
    }
  }

  test("integer scores sum exactly as doubles (the Viterbi-kernel reuse " +
      "precondition): |score| * maxPieces << 2^53") {
    import UnigramIntLm.{ilog2, scores}
    val v = Map("a" -> 5L, "bc" -> 3L, "abc" -> 1L)
    val s = scores(v)
    // scores are ilog2(c) - ilog2(T), negative, exact as Double
    val t = ilog2(9L)
    assert(s("a") === ilog2(5L) - t)
    assert(s.values.forall(x => x < 0))
    assert(s.values.forall(x => x.toDouble.toLong == x)) // Double-exact
  }

  test("train: alphabet always covered, every piece scored, model is " +
      "deterministic across partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = Seq(("abab", 4L), ("abc", 2L), ("cab", 1L), ("b", 1L))
    def wf(parts: Int) =
      words.toDF("w", "f").repartition(parts)
    val m1 = UnigramIntLm.train(wf(1), rounds = 3)
    val m8 = UnigramIntLm.train(wf(8), rounds = 3)
    assert(m1 === m8, "model depends on partitioning")
    // alphabet floor: every character of the corpus is in the vocab
    for (ch <- Seq("a", "b", "c"))
      assert(m1.contains(ch), s"alphabet char $ch missing")
    // segmenting any training word under the model never yields [UNK]
    val sd = m1.map { case (p, x) => p -> x.toDouble }
    val segs = wf(4).select(col("w"),
        graft.plans.Unigram.segment(col("w"), sd).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(segs.values.forall(!_.contains("[UNK]")), segs.toString)
    // segmentation reassembles the word
    for ((w, s) <- segs) assert(s.replace(" ", "") === w, s"$w -> $s")
  }
}
