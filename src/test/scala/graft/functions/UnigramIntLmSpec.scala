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

  // ---------------------------------------------------- soft lattice (r12)

  test("logAdd: identity on NegInf, symmetric, >= max, within the 2^-6 " +
      "delta-cell resolution of float logsumexp") {
    import UnigramIntLm.{logAdd, NegInf}
    assert(logAdd(NegInf, -5L) === -5L)
    assert(logAdd(-5L, NegInf) === -5L)
    val rng = new scala.util.Random(17)
    for (_ <- 1 to 2000) {
      val a = -rng.nextInt(2000000).toLong
      val b = -rng.nextInt(2000000).toLong
      val got = logAdd(a, b)
      assert(got === logAdd(b, a), "not symmetric")
      assert(got >= math.max(a, b), "lost mass")
      val exact = (math.log(math.pow(2.0, a / 65536.0) +
        math.pow(2.0, b / 65536.0)) / math.log(2.0)) * 65536.0
      // delta quantized to 2^10 fixed-point cells: worst-case cell error
      // ~ d(log2(1+2^-x))/dx * 512 <= 512 * ln2... bounded well under
      // one cell width + rounding
      assert(math.abs(got - exact) <= 600.0, s"logAdd($a,$b)=$got vs $exact")
    }
  }

  test("exp2Fp: exact at integer exponents, monotone non-increasing, " +
      "within one 2^-20 ulp-cell of float 2^-x") {
    import UnigramIntLm.exp2Fp
    assert(exp2Fp(0L) === UnigramIntLm.Exp2Lut(0))
    val rng = new scala.util.Random(23)
    val ds = Seq.fill(2000)(rng.nextInt(25 * 65536).toLong).sorted
    var prevV = Long.MaxValue
    for (d <- ds) {
      val got = exp2Fp(d)
      val exact = math.pow(2.0, -d / 65536.0) * 1048576.0
      assert(math.abs(got - exact) <= exact * 0.001 + 2.0,
        s"exp2Fp($d)=$got vs $exact")
      // monotone non-increasing up to one unit of midpoint-cell rounding
      assert(got <= (if (prevV == Long.MaxValue) prevV else prevV + 1),
        s"not monotone at $d")
      prevV = got
    }
    assert(exp2Fp(22L * 65536L) === 0L) // deep deficits vanish
  }

  test("trainSoft: partition-independent, alphabet covered, expected " +
      "counts conserve roughly one use per corpus position") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = Seq(("abab", 4L), ("abc", 2L), ("cab", 1L), ("b", 1L))
    def wf(parts: Int) = words.toDF("w", "f").repartition(parts)
    val m1 = UnigramIntLm.trainSoft(wf(1), rounds = 3)
    val m8 = UnigramIntLm.trainSoft(wf(8), rounds = 3)
    assert(m1 === m8, "soft model depends on partitioning")
    for (ch <- Seq("a", "b", "c"))
      assert(m1.contains(ch), s"alphabet char $ch missing")
    // per-word marginal expected PIECE counts: between 1 (whole word one
    // piece) and len (all singles); the fp sum over pieces respects that
    val sc = m1
    val mm = wf(2).select(col("w"),
        graft.plans.Unigram.marginalsFp(col("w"), sc).as("m"))
      .as[(String, Map[String, Long])].collect().toMap
    for ((w, m) <- mm) {
      val total = m.values.sum.toDouble / (1L << 20).toDouble
      assert(total >= 0.9 && total <= w.length + 0.1,
        s"$w expected-piece mass $total")
    }
  }

  test("marginalsFp agrees with the float posterior within LUT resolution " +
      "(same lattice, same model up to grid rounding)") {
    import UnigramIntLm.FP1
    val v = Map("a" -> 6L, "b" -> 4L, "ab" -> 5L, "ba" -> 2L, "aba" -> 1L)
    val sFp = UnigramIntLm.scores(v)
    val t = v.values.sum.toDouble
    val sFl = v.map { case (p, c) => p -> math.log(c / t) }
    val jm = new java.util.HashMap[String, java.lang.Long]()
    sFp.foreach { case (k, x) => jm.put(k, x) }
    val jf = new java.util.HashMap[String, java.lang.Double]()
    sFl.foreach { case (k, x) => jf.put(k, x) }
    import org.apache.spark.unsafe.types.UTF8String
    for (w <- Seq("abab", "aba", "ba", "a")) {
      val fp = graft.plans.UnigramIntKernel
        .marginalsFp(UTF8String.fromString(w), jm, 6)
      val fl = graft.plans.UnigramKernel
        .marginals(UTF8String.fromString(w), jf, 6)
      // compare piece-by-piece: integer fp / 2^20 vs float weight
      val fpMap = (0 until fp.numElements()).map { i =>
        fp.keyArray().getUTF8String(i).toString ->
          fp.valueArray().getLong(i).toDouble / FP1.toDouble
      }.toMap
      val flMap = (0 until fl.numElements()).map { i =>
        fl.keyArray().getUTF8String(i).toString ->
          fl.valueArray().getDouble(i)
      }.toMap
      assert(fpMap.keySet === flMap.keySet, s"$w piece sets differ")
      for ((p, x) <- fpMap)
        assert(math.abs(x - flMap(p)) <= 0.02,
          s"$w/$p: fp $x vs float ${flMap(p)}")
    }
  }
}
