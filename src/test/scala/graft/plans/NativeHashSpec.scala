package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Custom codegen'd Expressions: FNV-1a vectors, one-pass shingle hashing
  * equivalence with the column-function pipeline, SQL registration, and
  * whole-stage codegen participation. */
class NativeHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 matches published FNV-1a 64 test vectors") {
    val got = Seq("", "a", "foobar").toDF("s")
      .select(NativeHash.fnv64($"s")).collect().map(_.getLong(0))
    assert(got(0) === 0xcbf29ce484222325L)
    assert(got(1) === 0xaf63dc4c8601ec8cL)
    assert(got(2) === 0x85944171f73967e8L)
  }

  test("shingle_hashes = fnv64 over the same shingles the column pipeline builds") {
    val df = Seq(
      "The quick  brown fox JUMPS", "one two",
      // non-ASCII: Turkish dotted I, umlauts, CJK, astral-plane emoji,
      // and a Unicode (non-\s) space U+00A0 that must NOT split tokens
      "İstanbul GRÜSSE 中文 😀emoji😀 a b repeated İstanbul GRÜSSE 中文",
      "tab\tsplit\nandvertical").toDF("t")
    val native = df.select(NativeHash.shingleHashes($"t", 3)).collect()
      .map(_.getSeq[Long](0).toSet)
    val viaStrings = df.select(
        transform(graft.functions.DedupFunctions.wordShingles($"t", 3),
          s => NativeHash.fnv64(s)))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(native === viaStrings)
    assert(native(1).size === 1) // short doc -> whole-text fallback shingle
  }

  test("expressions are SQL-registered and codegen'd") {
    NativeHash.register(spark)
    val viaSql = spark.sql("SELECT fnv64('foobar'), size(shingle_hashes('a b c d', 3))")
      .head()
    assert(viaSql.getLong(0) === 0x85944171f73967e8L)
    assert(viaSql.getInt(1) === 2)
    // participates in whole-stage codegen (no CodegenFallback) — check
    // over a real scan (a local relation folds to LocalTableScan)
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(NativeHash.fnv64(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("fnv_fold_longs: seeded FNV over long lanes, wrapping multiply") {
    // independent reimplementation of the fold (mod-2^64 BigInt arithmetic)
    def ref(seed: Long, xs: Seq[Long]): Long = {
      val M = BigInt(1) << 64
      var h = BigInt(HashKernels.FnvOffset ^ seed) & (M - 1)
      xs.foreach { x =>
        h = ((h ^ (BigInt(x) & (M - 1))) * BigInt(HashKernels.FnvPrime)).mod(M)
      }
      (h - (if (h >= (BigInt(1) << 63)) M else BigInt(0))).toLong
    }
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L)),
      (3L, Seq(2147483646L, 0L, 7919L, 12345L)),
      (1L, Seq.empty[Long]))
    val got = rows.toDF("seed", "xs")
      .select(NativeHash.fnvFoldLongs($"xs", $"seed")).collect().map(_.getLong(0))
    rows.zip(got).foreach { case ((seed, xs), g) =>
      assert(g === ref(seed, xs), s"seed=$seed xs=$xs")
    }
    // different seeds (bands) must produce different keys for equal lanes
    assert(ref(0L, Seq(5L, 6L, 7L, 8L)) !== ref(1L, Seq(5L, 6L, 7L, 8L)))
    // stays inside whole-stage codegen over a real scan
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(NativeHash.fnvFoldLongs(array(col("doc_id")), lit(0L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("md5_simhash64 kernel = the interpreted md5 column fold, bit for bit") {
    import graft.functions.TextFunctions.{normalizeText, tokens}
    import graft.functions.TextFunctions.md5Long
    // the r15 column pipeline the r16 kernel replaces, inlined verbatim
    def oldSimhash(c: org.apache.spark.sql.Column, bits: Int = 60) = {
      val hashes = transform(tokens(normalizeText(c)), t => md5Long(t))
      val powers = array((0 until bits).map(b => lit(1L << b)): _*)
      val votes = aggregate(hashes, array_repeat(lit(0L), bits),
        (acc, h) => zip_with(acc, powers, (a, p) =>
          a + when(h.bitwiseAND(p) =!= 0L, 1L).otherwise(-1L)))
      aggregate(
        zip_with(votes, powers, (v, p) => when(v > 0L, p).otherwise(0L)),
        lit(0L), (acc, x) => acc + x)
    }
    val adversarial = Seq(
      "", " ", "   \t\n\f\r  ", "one",
      "The quick  brown fox JUMPS over", "  lead and trail  ",
      "repeated repeated repeated token votes", // occurrence voting
      "İstanbul GRÜSSE 中文 😀emoji😀 a b", // U+00A0 is NOT \s: one token
      "tab\tsplit\nandvertical\fand\rcr",
      "UPPER lower MiXeD case")
    val seeded = new scala.util.Random(16)
    val fuzz = (1 to 60).map { _ =>
      (1 to seeded.nextInt(12)).map { _ =>
        val len = 1 + seeded.nextInt(8)
        (1 to len).map(_ => (32 + seeded.nextInt(95)).toChar).mkString
      }.mkString(" ")
    }
    val df = (adversarial ++ fuzz).toDF("t")
    val got = df.select(NativeHash.md5SimHash64($"t"), oldSimhash($"t"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // the fold over a real scan stays inside whole-stage codegen
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(NativeHash.md5SimHash64(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("native minhash query finds the same near-dup structure as the md5 path") {
    val dir = "/root/testdata/sf0.001"
    val md5Pairs = graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nativePairs = graft.SparkEntry.queries("q_dedup_minhash_native")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // different hash families -> not identical, but both must surface the
    // dominant near-dup population (high overlap)
    val inter = (md5Pairs & nativePairs).size.toDouble
    assert(inter / math.max(md5Pairs.size, 1) > 0.7,
      s"md5=${md5Pairs.size} native=${nativePairs.size} inter=$inter")
  }
}
