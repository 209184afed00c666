package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Line-level cleaning (RefinedWeb-style line-wise correction,
  * arXiv:2306.01116 §3.1.3): the keep-predicate's rule boundaries and the
  * order-preserving within-doc line dedup used by q_repetition_remove. */
class LineFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keeps(line: String): Boolean =
    Seq(line).toDF("l").select(TextFunctions.lineKeep($"l")).head().getBoolean(0)

  test("short, uppercase, marker, and bullet-only lines are dropped") {
    assert(!keeps("HOME"))                       // < 5 chars AND all-caps
    assert(!keeps("shrt"))                       // < 5 chars
    assert(!keeps("READ MORE ARTICLES HERE"))    // uppercase frac > 0.6
    assert(!keeps("This site uses cookies to improve your experience"))
    assert(!keeps("Please enable JavaScript to continue"))
    assert(!keeps("© 2024 Example Corp. All Rights Reserved".toLowerCase))
    assert(!keeps("- 1. 2. 3."))                 // bullets/numbering only
    assert(!keeps("• • •"))
  }

  test("ordinary prose lines survive") {
    assert(keeps("The quick brown fox jumps over the lazy dog."))
    assert(keeps("Results improved by 12% over the baseline (Table 3)."))
    // sentence-case with an acronym stays under the 0.6 uppercase cut
    assert(keeps("NASA launched the mission in 2020."))
  }

  test("uppercase fraction boundary is inclusive at 0.6") {
    // "ABC def" -> 3 uppercase / 7 chars ~= 0.43 keep;
    // "ABCDE f" -> 5/7 ~= 0.71 > 0.6 drop
    assert(keeps("ABC def"))
    assert(!keeps("ABCDE f"))
  }

  test("order-preserving first-occurrence line dedup") {
    val ls = TextFunctions.docLines($"t")
    val kept = Seq("a line\nsecond\na line\nthird\nsecond\na line").toDF("t")
      .select(filter(ls, (l, i) => array_position(ls, l) === i + 1).as("kept"))
      .head().getSeq[String](0)
    assert(kept === Seq("a line", "second", "third"))
  }
}
