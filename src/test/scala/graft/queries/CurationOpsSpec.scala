package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavior pins for the round-6 curation additions: corpus-level line
  * dedup, CCNet perplexity buckets, and incremental MinHash probe. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("corpus line dedup removes every copy of a 3+ occurrence line, keeps order") {
    val boiler = "subscribe to our newsletter today"
    val docs = Seq(
      (0L, s"$boiler\ntwice only line\nunique zero", "en", "web", 10L),
      (1L, s"twice only line\n$boiler\nunique one", "en", "web", 10L),
      (2L, s"unique two\n$boiler", "en", "web", 10L),
      (3L, boiler, "en", "web", 10L) // doc that IS the boilerplate
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("linededup").toFile
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_line_dedup_corpus")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5)))
      .toMap
    // banned everywhere (3 docs + the standalone copy = 4 occurrences);
    // the 2-occurrence line survives — corpus df threshold is 3
    assert(out(0L) === ((3L, 2L, boiler.length.toLong, "twice only line\nunique zero", true)))
    assert(out(1L) === ((3L, 2L, boiler.length.toLong, "twice only line\nunique one", true)))
    assert(out(2L) === ((2L, 1L, boiler.length.toLong, "unique two", true)))
    // a doc losing ALL lines stays in the output, flagged not kept
    assert(out(3L) === ((1L, 0L, boiler.length.toLong, "", false)))
  }

  test("perplexity buckets: per-language discrete terciles partition the corpus") {
    val rows = SparkEntry.queries("q_perplexity_buckets")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    for ((lang, perLang) <- rows.groupBy(_._1)) {
      val n = perLang.length
      val byBucket = perLang.groupBy(_._3).map { case (b, xs) => b -> xs.map(_._2) }
      val tail = byBucket.getOrElse("tail", Array.empty[Long])
      val middle = byBucket.getOrElse("middle", Array.empty[Long])
      val head = byBucket.getOrElse("head", Array.empty[Long])
      assert(tail.length + middle.length + head.length === n)
      // head is never empty (the top tercile always has a resident) and
      // the strict-cum construction bounds the lower buckets
      assert(head.nonEmpty, s"$lang: empty head")
      assert(3 * tail.length < n, s"$lang: |tail|=${tail.length} of $n")
      assert(3 * (tail.length + middle.length) < 2 * n,
        s"$lang: |tail+middle|=${tail.length + middle.length} of $n")
      // score ranges are disjoint and ordered: tail < middle < head
      if (tail.nonEmpty && middle.nonEmpty) assert(tail.max < middle.min)
      if (middle.nonEmpty) assert(middle.max < head.min)
      if (tail.nonEmpty && middle.isEmpty) assert(tail.max < head.min)
    }
  }

  test("incremental probe equals the full-corpus pair family restricted cross-split") {
    // the combined-occupancy cut makes index∪batch banding identical to
    // the full family's, so probe(index, batch) must reproduce EXACTLY
    // the full pair set's cross-split slice — no pair lost, none invented
    val full = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossSplit = full.filter { case (a, b) => (a % 4 == 0) != (b % 4 == 0) }
    val inc = SparkEntry.queries("q_dedup_minhash_incremental")(spark, dir)
      .collect().map { r =>
        val (n, i) = (r.getLong(0), r.getLong(1))
        (math.min(n, i), math.max(n, i))
      }.toSet
    assert(inc === crossSplit, s"missing=${crossSplit -- inc} extra=${inc -- crossSplit}")
  }

  test("unimax water-filling: saturation and uniform level, exact fixture") {
    // langs: aa=10 tokens, bb=1000, cc=1000 → total 2010, B=1005,
    // caps (3 epochs): 30/3000/3000. aa saturates (30·3+0 ≤ 1005);
    // λ = (1005−30) div 2 = 487 for bb and cc.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = (Seq((0L, words(10), "aa")) ++
      (1 to 10).map(i => (i.toLong, words(100), "bb")) ++
      (11 to 30).map(i => (i.toLong, words(50), "cc")))
      .map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("unimax").toFile
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_mixture_unimax")(spark, tmp.toString)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("aa") === ((10L, 30L, 30L, true)))
    assert(out("bb") === ((1000L, 3000L, 487L, false)))
    assert(out("cc") === ((1000L, 3000L, 487L, false)))
  }

  test("unimax invariants hold on the real corpus") {
    val rows = SparkEntry.queries("q_mixture_unimax")(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val unsat = rows.filter(!_._5)
    // saturated languages keep exactly their cap; unsaturated all sit at
    // the same water level λ, which is ≥ every saturated cap and ≤ their own
    for ((_, _, cap, alloc, sat) <- rows if sat) assert(alloc === cap)
    if (unsat.nonEmpty) {
      val levels = unsat.map(_._4).distinct
      assert(levels.size === 1, s"non-uniform level: $levels")
      val lambda = levels.head
      assert(unsat.forall(_._3 >= lambda))
      for ((_, _, cap, _, sat) <- rows if sat) assert(cap <= lambda)
    }
  }

  test("incremental probe verdicts are consistent with the signature rescore") {
    val rows = SparkEntry.queries("q_dedup_minhash_incremental")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    for ((nMatch, est, isDup) <- rows) {
      assert(nMatch >= 0 && nMatch <= 16)
      assert(est === nMatch.toDouble / 16)
      assert(isDup === (nMatch * 2 >= 16))
    }
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("curation").toFile
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp.toString
  }

  test("span removal cuts every occurrence of a cross-doc duplicated 8-token span") {
    val shared = "a b c d e f g h" // exactly one 8-token window
    val dir = docsDir(Seq(
      (0L, s"x0 $shared y0"),
      (1L, s"x1 $shared y1"),
      (2L, "tiny doc")))
    val out = SparkEntry.queries("q_dedup_spans_remove")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // the shared window is flagged (2 occurrences, 2 docs); the
    // prefix/suffix windows are unique so x/y survive in BOTH docs
    assert(out(0L) === ((10L, 8L, "x0 y0")))
    assert(out(1L) === ((10L, 8L, "x1 y1")))
    // spanless docs pass through untouched
    assert(out(2L) === ((2L, 0L, "tiny doc")))
  }

  test("temperature mixture: alpha=0.5 shares are exact integer ppm") {
    val tmp = java.nio.file.Files.createTempDirectory("curation").toFile
    Seq(
      (0L, "one two three", "en"), (1L, "one two three", "en"),
      (2L, "one two three", "en"), (3L, "eins", "de"))
      .map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_mixture_temperature")(spark, tmp.toString)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: 9 tokens -> w = isqrt(9e6) = 3000; de: 1 -> w = 1000; tw = 4000
    assert(out("en") === ((3L, 9L, 900000L, 750000L)))
    assert(out("de") === ((1L, 1L, 100000L, 250000L)))
  }

  test("Kneser-Ney bigram table: exact micro-probabilities, per-context mass <= 1") {
    val tmp = docsDir(Seq((0L, "a b a b"), (1L, "a c")))
    // bigrams: (a,b)x2 (b,a)x1 (a,c)x1; contexts a:3 b:1;
    // N1+(a.)=2 N1+(b.)=1; N1+(.b)=1 N1+(.a)=1 N1+(.c)=1; N1+(..)=3
    // p(b|a) = (5*3 + 3*2*1)e6 / (4*3*3)  = 583333
    // p(a|b) = (1*3 + 3*1*1)e6 / (4*1*3)  = 500000
    // p(c|a) = (1*3 + 3*2*1)e6 / (4*3*3)  = 250000
    val got = SparkEntry.queries("q_ngram_lm_kn")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("a b", 2L, 583333L), ("a c", 1L, 250000L), ("b a", 1L, 500000L)))
    // discounted mass: each context's observed sum stays under 1e6, the
    // residue is the unseen-word smoothing mass
    assert(583333L + 250000L <= 1000000L && 500000L <= 1000000L)
  }

  test("length quantiles: discrete selection at floor((n-1)p) per source") {
    val tmp = java.nio.file.Files.createTempDirectory("curation").toFile
    Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L))
      .map { case (id, n) => (id, "t", "en", "web", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q_length_quantiles")(spark, tmp.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // n=4: p25 idx 0, p50 idx 1, p75 idx 2, p90 idx floor(2.7)=2
    assert(r.toSeq === Seq(("web", 4L, 100L, 10L, 20L, 30L, 30L)))
  }
}
