package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WordPiece greedy longest-match segmentation: maximal munch, "##"
  * continuations, whole-word [UNK], code-point (not UTF-16) positions,
  * and whole-stage codegen participation. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(vocab: Seq[String], words: String*): Seq[String] =
    words.toDF("w").select(WordPiece.encode($"w", vocab)).collect()
      .map(_.getString(0)).toSeq

  test("greedy longest match wins over shorter prefixes") {
    // "abcab": longest at pos 0 is "abc" (not "ab"), then "ab"
    val got = enc(Seq("a", "b", "c", "ab", "abc"), "abcab", "abc", "ba")
    assert(got === Seq("abc ##ab", "abc", "b ##a"))
  }

  test("any unmatched position collapses the whole word to [UNK]") {
    // 'z' is not in vocab: even though "ab" matches first, the word is UNK
    assert(enc(Seq("a", "b", "ab"), "abz", "z") === Seq("[UNK]", "[UNK]"))
  }

  test("continuation pieces re-match the same position-independent vocab") {
    // vocab has "st" and single chars: "customer"-style interior match
    assert(enc(Seq("c", "u", "s", "t", "st"), "custst") ===
      Seq("c ##u ##st ##st"))
  }

  test("positions count code points: astral-plane emoji is ONE position") {
    // 😀 (U+1F600) is 2 UTF-16 chars but 1 code point — DuckDB substr
    // semantics; a char-based loop would split the surrogate pair
    val got = enc(Seq("😀", "a"), "a😀a", "😀😀")
    assert(got === Seq("a ##😀 ##a", "😀 ##😀"))
  }

  test("max piece length bounds the probe window") {
    val got = Seq("aaaaaaaa").toDF("w")
      .select(WordPiece.encode($"w", Seq("a", "aaaa", "aaaaaaaa"), maxPieceLen = 4))
      .head().getString(0)
    assert(got === "aaaa ##aaaa") // the 8-char piece is never probed
  }

  test("matching loop participates in whole-stage codegen over a real scan") {
    // exchange-free plan: the codegen stage prints as the "*(n)" marker,
    // so check the node type rather than the string form
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(WordPiece.encode(col("text"), Seq("a", "b")))
      .queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
  }
}
