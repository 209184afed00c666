package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants of the hashing-trick vectors that the oracle (a literal
  * SQL mirror) cannot itself establish. */
class FeatureHashPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(13)
  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet")
  private def randDoc(n: Int): String =
    Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")

  test("weight mass is bounded by token count; dims stay in [0, 64)") {
    val docs = (0L until 40L).map(id => (id, randDoc(1 + rng.nextInt(30))))
      .toDF("doc_id", "text")
    val rows = FeatureHash.bowRows(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < FeatureHash.Dims)
    }
    val l1 = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(r => math.abs(r.getLong(2))).sum).toMap
    val tokens = docs.select($"doc_id", size(TextFunctions.tokens($"text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // each token contributes +-1 to exactly one dim: |weights|_1 <= n and
    // same parity (cancellation removes 2 at a time)
    l1.foreach { case (id, m) =>
      assert(m <= tokens(id))
      assert((tokens(id) - m) % 2 === 0, s"doc $id parity")
    }
  }

  test("vector is order-invariant (bag semantics) and self-similarity is 1") {
    val doc = randDoc(25)
    val shuffled = rng.shuffle(doc.split(" ").toSeq).mkString(" ")
    val docs = Seq((1L, doc), (2L, shuffled)).toDF("doc_id", "text")
    val rows = FeatureHash.bowRows(docs, "doc_id", "text")
    val norms = FeatureHash.norms(rows, "doc_id")
    val top = FeatureHash.topK(rows, norms, rows, norms, "doc_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the permuted twin is each doc's nearest neighbor at cosine 1.0
    assert(top.toSet === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }
}
