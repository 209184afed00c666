package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Gopher rule functions (arXiv:2112.11446 A1) — hand-computed expected
  * values per rule, plus the empty-doc / short-doc guards that protect
  * the ANSI-mode element_at paths. */
class GopherQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, t: String): Double =
    Seq(t).toDF("t").select(c).head().getDouble(0)

  test("symbolCount counts '#' chars, non-overlapping '...', and '…'") {
    val df = Seq("a # b ## c..... d").toDF("t")
    // 3 '#' chars; "....." contains one non-overlapping "..."
    val got = df.select(TextFunctions.symbolCount($"t").cast("double")).head().getDouble(0)
    assert(got === 4.0)
    // Unicode ellipsis counts like the ASCII spelling (1 per char)
    val got2 = Seq("wait… what… #").toDF("t")
      .select(TextFunctions.symbolCount($"t").cast("double")).head().getDouble(0)
    assert(got2 === 3.0)
  }

  test("symbolToWordRatio: empty doc is 0") {
    assert(one(TextFunctions.symbolToWordRatio($"t"), "") === 0.0)
    assert(one(TextFunctions.symbolToWordRatio($"t"), "# a b c") === 1.0 / 4)
  }

  test("bullet and ellipsis line fractions on trimmed non-blank lines") {
    val t = "- first\n* second\n\n  plain line\nends here...\n"
    assert(one(TextFunctions.bulletLineFrac($"t"), t) === 2.0 / 4)
    assert(one(TextFunctions.ellipsisLineFrac($"t"), t) === 1.0 / 4)
    assert(one(TextFunctions.bulletLineFrac($"t"), "") === 0.0)
  }

  test("alphaWordFrac and gopherStopwordHits") {
    assert(one(TextFunctions.alphaWordFrac($"t"), "abc 123 4d 99") === 2.0 / 4)
    val hits = Seq("The dog and that cat have the ball").toDF("t")
      .select(TextFunctions.gopherStopwordHits($"t")).head().getInt(0)
    assert(hits === 4) // the, and, that, have (stop-list words present)
  }

  test("dupLineFrac / dupLineCharFrac") {
    val t = "aaa\nbb\naaa\nc\naaa"
    // 5 lines, 3 distinct -> 2/5 duplicates
    assert(one(TextFunctions.dupLineFrac($"t"), t) === 2.0 / 5)
    // char mass 3+2+3+1+3=12, distinct mass 3+2+1=6 -> 6/12
    assert(one(TextFunctions.dupLineCharFrac($"t"), t) === 6.0 / 12)
    assert(one(TextFunctions.dupLineFrac($"t"), "") === 0.0)
  }

  test("topNgramCoverageFrac: token chars covered by the top bigram, ≤1") {
    // bigrams: "x y"(3), "y x"(2) -> top "x y" covers every token -> 1.0
    assert(one(TextFunctions.topNgramCoverageFrac($"t", 2), "x y x y x y") === 1.0)
    // partial coverage: "aa bb"(2) at positions 1,3 covers tokens 1-4 of 6
    // -> 8 of 12 token chars
    val got = one(TextFunctions.topNgramCoverageFrac($"t", 2), "aa bb aa bb cc dd")
    assert(got === 8.0 / 12)
    // fewer tokens than n -> no grams -> 0
    assert(one(TextFunctions.topNgramCoverageFrac($"t", 2), "solo") === 0.0)
    assert(one(TextFunctions.topNgramCoverageFrac($"t", 2), "") === 0.0)
  }

  test("topNgramCoverageFrac tie-break: lexicographically smallest gram") {
    // "b c"(1) and "a b"(1) tie at count 1 -> "a b" wins, covers tokens 1-2
    val got = one(TextFunctions.topNgramCoverageFrac($"t", 2), "a b c")
    assert(got === 2.0 / 3)
  }

  test("dupNgramCoverageFrac: token chars covered by duplicated 5-grams, ≤1") {
    // grams: [a b c a b, b c a b c, c a b c a, a b c a b, b c a b c];
    // dup positions {1,4} and {2,5} cover every token -> 1.0 (the old
    // occurrence-mass form reported 36/17 ≈ 2.1 here)
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), "a b c a b c a b c") === 1.0)
    // one dup pair at positions 1 and 6 covers tokens 1-10; z tokens
    // (2 chars each) uncovered -> 10 of 18 token chars
    val t = "u v w x y u v w x y z1 z2 z3 z4"
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), t) === 10.0 / 18)
    // all-unique grams -> 0
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), "p q r s t u") === 0.0)
    // shorter than n tokens -> 0 (guards the sequence/element_at path)
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), "a b") === 0.0)
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), "") === 0.0)
  }

  test("single repeated token doc: every gram identical (flood shape)") {
    val t = Array.fill(40)("w").mkString(" ") // 36 identical 5-grams
    // every token covered by a duplicated gram / the top bigram -> 1.0
    assert(one(TextFunctions.dupNgramCoverageFrac($"t", 5), t) === 1.0)
    assert(one(TextFunctions.topNgramCoverageFrac($"t", 2), t) === 1.0)
  }
}
