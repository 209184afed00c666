package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ScalaCheck generators driving the hashing kernels: generated inputs
  * with shrinking, checked against reference implementations in plain
  * Scala (the property layer the reference test suite lacks). */
class ScalaCheckPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("fnv64 expression equals the reference FNV-1a fold for arbitrary strings") {
    import spark.implicits._
    def refFnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    // batch the generated strings through one Spark job per sample set
    val gen = Gen.listOfN(20, Gen.asciiPrintableStr)
    check(Prop.forAll(gen) { strs =>
      val nonNull = strs.filter(_ != null)
      if (nonNull.isEmpty) true
      else {
        val got = nonNull.toDF("s")
          .select(graft.plans.NativeHash.fnv64($"s"))
          .collect().map(_.getLong(0)).toSeq
        got == nonNull.map(refFnv)
      }
    })
  }

  test("wordShingles always yields distinct shingles of exactly n words (or the whole text)") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(10, doc)) { docs =>
      if (docs.isEmpty) true
      else {
        val rows = docs.toDF("t")
          .select(DedupFunctions.wordShingles($"t", 3))
          .collect().map(_.getSeq[String](0))
        rows.forall { shingles =>
          shingles.distinct.length == shingles.length &&
            shingles.forall(s => s.split(" ").length == 3 || shingles.length == 1)
        }
      }
    })
  }

  test("bloom filter never false-negatives for arbitrary member hashes") {
    import spark.implicits._
    import graft.plans.GraftBloom
    val members = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(members) { hs =>
      val bloom = GraftBloom.build(hs.toDF("hv").repartition(3), "hv", 1 << 10, 3)
      hs.forall(GraftBloom.mightContain(bloom, _, 3))
    })
  }
}
