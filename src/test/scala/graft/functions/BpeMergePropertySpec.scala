package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{TextFunctions => T}

/** Randomized model-equivalence pin for [[TextFunctions.bpeMerge]] — the
  * greedy fold every BPE query (char and byte family, 8 catalog oracles)
  * applies per merge round. The reference model is the paper's semantics
  * (Sennrich et al., arXiv:1508.07909 §3): ONE non-overlapping
  * left-to-right pass replacing each adjacent (a, b) with a||b and
  * resuming AFTER the replacement. The fold must agree on every input,
  * including self-chains (a == b), merged-symbol prefixes (b starting
  * with a), and runs that interleave near-misses. */
class BpeMergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The paper's replace: scan left to right, consume both symbols on a
    * match, resume after the merged token. */
  private def naive(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: naive(rest, a, b)
      case x :: rest => x :: naive(rest, a, b)
      case Nil => Nil
    }

  test("fold == single-pass non-overlapping replace on random symbol runs") {
    val alphabet = Vector("a", "b", "c", "ab", "ba", "aa", "61", "6162")
    // (a, b) pairs chosen to hit the adversarial shapes: self-chain,
    // b-prefixed-by-a, merged symbol equal to an alphabet symbol, and
    // hex-pair symbols (the byte family's domain)
    val merges = Seq(("a", "b"), ("a", "a"), ("a", "ab"), ("ab", "a"),
      ("b", "a"), ("61", "6162"))
    val rng = new scala.util.Random(7)
    for ((a, b) <- merges) {
      val cases: Seq[List[String]] = (1 to 60).map { _ =>
        List.fill(1 + rng.nextInt(11))(alphabet(rng.nextInt(alphabet.size)))
      }
      val got = cases.map(_.mkString(" ")).toDF("sw")
        .select(T.bpeMerge(col("sw"), a, b)).collect().map(_.getString(0))
      val want = cases.map(naive(_, a, b).mkString(" "))
      assert(got.toSeq === want,
        s"merge ($a, $b): first divergence at ${
          got.toSeq.zip(want).indexWhere(p => p._1 != p._2)}")
    }
  }
}
