package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the signed-division semantics the whole oracle catalog relies on.
  *
  * The round-8 q_window_ewma hash-fail was a semantics-class bug, not a
  * typo: Scala's arithmetic shift `>> k` FLOORS (-5 >> 2 = -2) while
  * DuckDB's integer `//` TRUNCATES toward zero (-5 // 4 = -1, verified
  * against duckdb 1.0.0). The safe pairing — used everywhere in the
  * catalog — is Scala `Long./` == Spark SQL `div` == DuckDB integer `//`
  * (all truncate toward zero). This spec:
  *
  *   1. pins the three-way agreement on a grid of negative/positive
  *      operands (Scala `/` vs Spark `div`; DuckDB's side is pinned by
  *      the documented probe and exercised by every `//` oracle);
  *   2. pins the divergence that caused the bug, so the floor-vs-trunc
  *      distinction stays visible in the test suite;
  *   3. enumerates every Scala-side arithmetic right-shift in main
  *      sources and asserts each sits in an allowlisted non-negative
  *      context — a NEW `>>` on a possibly-signed quantity fails here
  *      until it is consciously reviewed and allowlisted.
  *
  * Signed-numerator oracle sites reviewed this round (all pair trunc
  * with trunc or keep operands non-negative by construction):
  *   - q_window_ewma(_live): `(xm - sm) // 4` vs Scala `(xm - sm) / 4` — trunc/trunc;
  *   - q_cusum_drift(_live): additive + greatest(0, ·) only — no division;
  *   - q_zorder/q_hilbert layouts: `(day - dmin) // span` — dmin is the min, numerator >= 0;
  *   - q_token_mixtures: `(c.b - k.pk) // (c.l - k.ks)` — greedy allocation keeps b >= pk;
  *   - q_pack_fill: `(cum - n_chars) // 4096` — cum is a running sum of n_chars, >= 0;
  *   - ppm/ratio oracles (`* 1000000 // count`): counts, non-negative.
  */
class SignedDivisionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val grid: Seq[(Long, Long)] = for {
    a <- Seq(-1000001L, -17L, -5L, -4L, -1L, 0L, 1L, 5L, 17L, 1000001L)
    b <- Seq(-7L, -4L, -2L, 2L, 4L, 7L)
  } yield (a, b)

  test("Scala Long./ == Spark SQL div on signed operands (trunc toward zero)") {
    import spark.implicits._
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), expr("a div b").as("d"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === a / b, s"div mismatch at ($a, $b)")
      // truncation toward zero, the DuckDB integer `//` contract
      // (probe: -5 // 4 = -1 on duckdb 1.0.0)
      val q = a / b
      assert(math.abs(q) === math.abs(a) / math.abs(b),
        s"not trunc-toward-zero at ($a, $b)")
    }
  }

  test("arithmetic shift floors and MUST NOT pair with DuckDB // (r8 bug)") {
    assert((-5L >> 2) === -2L) // floor
    assert(-5L / 4L === -1L)   // trunc — what DuckDB // does on integers
    // every negative delta not divisible by 4 diverges:
    val diverging = (-100L to 100L).filter(x => (x >> 2) != x / 4)
    assert(diverging.nonEmpty && diverging.forall(x => x < 0 && x % 4 != 0))
  }

  test("every Scala-side >> in main sources is in an allowlisted non-negative context") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    // context regexes: each reviewed site's shape (operand provably >= 0)
    val allowed = Seq(
      """\(bx >> \$i\)""".r,      // Z-order/Hilbert coords, 0..255
      """\(by >> \$i\)""".r,
      """\(hv >> b\)""".r,        // md5Long hashes, non-negative 60-bit
      """\(h >> \(b""".r,         // simhash chunking on md5Long
      """ahash_lo >> """.r,       // aHash halves masked to 32 bits
      """ahash_hi >> """.r,
      """\(x \+ s / x\) >> 1""".r, // isqrt Newton step, x,s >= 0
      """\(rgb >> 16\)""".r,       // ARGB byte extract: & 0xff after the
      """\(rgb >> 8\)""".r,        // shift masks sign bits — shift kind moot
      // UnigramIntLm.ilog2 mantissa extraction: c >= 1 (require-guarded)
      // so c << 10 >= 0 and the shift matches DuckDB's >> on BIGINT
      """\(\(c << 10\) >> b\)""".r,
      // its SQL mirror (a string literal, not Scala arithmetic): operand
      // is a piece/total count, >= 1 by construction
      """\(\(\(\(\$c\) \* 1024\) >> \$b\)""".r,
      // UnigramIntLm.logAdd delta: hi = max(a,b) so hi - min(a,b) >= 0
      """\(hi - math\.min\(a, b\)\) >> 10""".r,
      // UnigramIntLm.exp2Fp: d is a DEFICIT, >= 0 at every call site
      // (kernel: exp2Fp(math.max(0L, ...)); Unigram.scala:273) — q in
      // [0,20], d % 65536 in [0,65535], Exp2Lut values positive
      """val q = d >> 16""".r,
      """Exp2Lut\(\(\(d % 65536L\) >> 6\)""".r,
      // the soft-EM SQL mirrors (string literals -> DuckDB >> on BIGINT,
      // same floor-vs-trunc moot on non-negative operands):
      // logadd delta greatest-least >= 0
      """least\(\(greatest\(\$a, \$b\) - least\(\$a, \$b\)\) >> 10""".r,
      // occurrence deficit d = greatest(0, ...) >= 0 (unigramSoftCntCtes)
      """CASE WHEN \(d >> 16\) > 20""".r,
      """WHERE i = \(d % 65536\) >> 6\) >> \(d >> 16\)""".r
    )
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    assert(files.nonEmpty)
    val offenders = for {
      f <- files
      (line, i) <- new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        .linesIterator.zipWithIndex.toSeq
      // spaced infix `>>` only: `a >> k` is a shift; `struct<k,v>>` is not
      if line.matches(""".* >> .*""") && !line.trim.startsWith("//")
      if !line.trim.startsWith("*") && !line.trim.startsWith("/*")
      if !allowed.exists(_.findFirstIn(line).isDefined)
    } yield s"$f:${i + 1}: ${line.trim}"
    assert(offenders.isEmpty,
      "unreviewed arithmetic shift site(s) — verify the operand cannot be " +
        "negative (or use / which truncates like DuckDB //), then allowlist:\n" +
        offenders.mkString("\n"))
  }
}
