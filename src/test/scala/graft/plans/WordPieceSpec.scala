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

  private def encBert(vocab: Seq[String], words: String*): Seq[String] =
    words.toDF("w")
      .select(WordPiece.encode($"w", vocab, bertContinuations = true))
      .collect().map(_.getString(0)).toSeq

  test("BERT mode: ## pieces are distinct vocab entries, matched only interior") {
    // vocab admits "ing" word-initially but NOT "##ing": "sing" cannot
    // use "ing" at position 1 and falls back to chars; "ingot"-style
    // word-initial use still works. With "##ing" added, "sing" = s ##ing.
    val v1 = Seq("s", "i", "n", "g", "##s", "##i", "##n", "##g", "ing")
    assert(encBert(v1, "sing", "ings") === Seq("s ##i ##n ##g", "ing ##s"))
    val v2 = v1 :+ "##ing"
    assert(encBert(v2, "sing", "ings") === Seq("s ##ing", "ing ##s"))
  }

  test("BERT mode: a word-initial-only piece never matches mid-word ([UNK])") {
    // "ab" exists only unprefixed; position 1 looks up "##ab"/"##a"/"##b",
    // none present -> whole word UNK. Original mode segments it fine.
    assert(encBert(Seq("x", "ab"), "xab") === Seq("[UNK]"))
    assert(enc(Seq("x", "ab"), "xab") === Seq("x ##ab"))
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
