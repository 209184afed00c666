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

  test("symbolCount counts '#' chars and non-overlapping '...'") {
    val df = Seq("a # b ## c..... d").toDF("t")
    // 3 '#' chars; "....." contains one non-overlapping "..."
    val got = df.select(TextFunctions.symbolCount($"t").cast("double")).head().getDouble(0)
    assert(got === 4.0)
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

  test("topNgramCharFrac: most frequent bigram char mass over doc chars") {
    val t = "x y x y x y" // 11 chars; bigrams: "x y"(3), "y x"(2)
    val got = one(TextFunctions.topNgramCharFrac($"t", 2), t)
    assert(got === 3.0 * 3 / 11)
    // fewer tokens than n -> no grams -> 0
    assert(one(TextFunctions.topNgramCharFrac($"t", 2), "solo") === 0.0)
    assert(one(TextFunctions.topNgramCharFrac($"t", 2), "") === 0.0)
  }

  test("dupNgramCharFrac: sorted-run singles vs duplicated gram mass") {
    // tokens a b c a b c a b c -> 5 5-grams, "a b c a b" x2 ... compute:
    // grams: [a b c a b, b c a b c, c a b c a, a b c a b, b c a b c]
    // dup grams: "a b c a b"(2), "b c a b c"(2); singleton: "c a b c a"
    // dup mass = 4 * 9 = 36; text chars = 17
    val t = "a b c a b c a b c"
    val got = one(TextFunctions.dupNgramCharFrac($"t", 5), t)
    assert(got === 36.0 / 17)
    // all-unique grams -> 0
    assert(one(TextFunctions.dupNgramCharFrac($"t", 5), "p q r s t u") === 0.0)
    // shorter than n tokens -> 0 (guards the sequence/element_at path)
    assert(one(TextFunctions.dupNgramCharFrac($"t", 5), "a b") === 0.0)
    assert(one(TextFunctions.dupNgramCharFrac($"t", 5), "") === 0.0)
  }

  test("single repeated token doc: every gram identical (flood shape)") {
    val t = Array.fill(40)("w").mkString(" ") // 36 identical 5-grams
    val got = one(TextFunctions.dupNgramCharFrac($"t", 5), t)
    // gram "w w w w w" len 9, 36 occurrences all duplicated
    assert(got === 36.0 * 9 / t.length)
    val top = one(TextFunctions.topNgramCharFrac($"t", 2), t)
    assert(top === 39.0 * 3 / t.length)
  }
}
