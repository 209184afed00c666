package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Unicode canonicalization expressions on REAL non-ASCII input —
  * the corpus parquet is ASCII-dominated, so the oracle only proves the
  * identity path; these cases pin the actual normalization semantics
  * (composed≡decomposed, mark stripping, CJK/ß passthrough) and the
  * codegen path. */
class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eAcuteComposed = "é" // é as one code point
  private val eAcuteDecomposed = "é" // e + combining acute

  test("NFC composes decomposed sequences; composed input is unchanged") {
    val df = Seq((1L, s"caf$eAcuteDecomposed"), (2L, s"caf$eAcuteComposed"),
      (3L, "plain ascii"), (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select($"id", UnicodeNorm.nfcNormalize($"t").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === s"caf$eAcuteComposed") // recomposed
    assert(got(2L) === s"caf$eAcuteComposed")
    assert(got(3L) === "plain ascii")
    assert(got(4L) === null) // null-safe
  }

  test("stripAccents removes combining marks from BOTH forms; ß and CJK survive") {
    val df = Seq(
      (1L, s"$eAcuteComposed" + "cole"), (2L, s"$eAcuteDecomposed" + "cole"),
      (3L, "straße"), (4L, "中文"), (5L, "nñandu"))
      .toDF("id", "t")
      .select($"id", UnicodeNorm.stripAccents($"t").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "ecole")
    assert(got(2L) === "ecole")
    assert(got(3L) === "straße") // ß is a letter, not a mark
    assert(got(4L) === "中文") // CJK passthrough
    assert(got(5L) === "nnandu")
  }

  test("normalized twins fingerprint identically (the dedup motivation)") {
    import graft.functions.{TextFunctions => T}
    val df = Seq((1L, s"caf$eAcuteComposed latte"), (2L, s"caf$eAcuteDecomposed latte"))
      .toDF("id", "t")
      .select(T.fingerprintHex(UnicodeNorm.nfcNormalize($"t")).as("fp"))
    assert(df.distinct().count() === 1) // same fingerprint after NFC
    // and WITHOUT normalization they differ — the pass is load-bearing
    val raw = Seq((1L, s"caf$eAcuteComposed latte"), (2L, s"caf$eAcuteDecomposed latte"))
      .toDF("id", "t").select(T.fingerprintHex($"t").as("fp"))
    assert(raw.distinct().count() === 2)
  }

  test("SQL registration exposes the DuckDB-named twins; codegen = eval") {
    UnicodeNorm.register(spark)
    val r = spark.sql(
      s"SELECT strip_accents(lower(nfc_normalize('CAF$eAcuteDecomposed'))) AS x")
      .head().getString(0)
    assert(r === "cafe")
    // interpreted (eval) path agrees with codegen: force both via a
    // literal fold vs a column evaluation
    val lit = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"x$eAcuteDecomposed")))
    assert(lit.eval(null).toString === s"x$eAcuteComposed")
  }
}
