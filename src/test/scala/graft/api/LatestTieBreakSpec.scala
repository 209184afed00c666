package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Deterministic latest-per-key view on timestamp ties: equal-ts updates
  * resolve by value order (documented divergence from the reference's
  * offset order, which a shuffled changelog no longer carries); a non-null
  * update beats a tombstone at the same ts. */
class LatestTieBreakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equal-ts updates resolve deterministically (max value wins)") {
    val b = GraftStreams(spark)
    (1 to 20).foreach { _ =>
      val t = b.table(spark.createDataset(Seq(
        ("k", "aaa", ts(1000L)), ("k", "zzz", ts(1000L)), ("k", "mmm", ts(1000L)))))
      assert(t.toDataset.collect().map(r => (r._1, r._2)).toSeq === Seq(("k", "zzz")))
    }
  }

  test("non-null update beats a tombstone on the same ts") {
    val b = GraftStreams(spark)
    val t = b.table(spark.createDataset(Seq(
      ("k", null.asInstanceOf[String], ts(1000L)), ("k", "live", ts(1000L)))))
    assert(t.toDataset.collect().map(r => (r._1, r._2)).toSeq === Seq(("k", "live")))
  }
}
