package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.ts

/** Changelog (add/subtract) aggregation — the reference's hardest parity
  * item (`kstream/internals/KTableAggregate.java:72-106`,
  * `KTableAggregateTest.java`): when a keyed row is updated or re-keyed,
  * the old value must be subtracted from its previous group and the new
  * value added to its new one. */
class KGroupedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  // changelog of a table keyed by user: region assignment changes over time
  //   u1: eu (t1) -> us (t3)         [re-key: eu loses u1, us gains it]
  //   u2: eu (t2)                    [stable]
  //   u3: us (t4) -> tombstone (t5)  [delete: us loses u3]
  private def changelog: KTable[String, String] = builder.table(
    spark.createDataset(Seq(
      ("u1", "eu", ts(1000L)),
      ("u2", "eu", ts(2000L)),
      ("u1", "us", ts(3000L)),
      ("u3", "us", ts(4000L)),
      ("u3", null.asInstanceOf[String], ts(5000L)))))

  test("groupBy.count subtracts on re-key and delete (KTableAggregateTest)") {
    val got = changelog.groupBy((user, region) => (region, user)).count()
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_._1)
    // final state: u1->us, u2->eu, u3 deleted
    assert(got === Seq(("eu", 1L), ("us", 1L)))
  }

  test("groupBy.aggregate applies adder and subtractor (KTableAggregateTest)") {
    val got = changelog.groupBy((user, region) => (region, 1))
      .aggregate(0)((_, v, agg) => agg + v, (_, v, agg) => agg - v, _ + _)
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_._1)
    // eu: +1(u1) +1(u2) -1(u1 re-key) = 1; us: +1(u1) +1(u3) -1(u3 del) = 1
    assert(got === Seq(("eu", 1), ("us", 1)))
  }

  test("groupBy.reduce with adder/subtractor") {
    // sum of per-user weights grouped by region; weight = user suffix
    val got = changelog.groupBy((user, region) => (region, user.drop(1).toInt))
      .reduce(_ + _, _ - _)
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_._1)
    // eu: +1 +2 -1 = 2 (u2 only); us: +1 +3 -3 = 1 (u1 only)
    assert(got === Seq(("eu", 2), ("us", 1)))
  }

  test("fully retracted groups drop out of the count view") {
    val single = builder.table(spark.createDataset(Seq(
      ("u1", "eu", ts(1000L)),
      ("u1", null.asInstanceOf[String], ts(2000L)))))
    val got = single.groupBy((u, r) => (r, u)).count()
      .toDataset.collect().map(r => (r._1, r._2))
    assert(got.isEmpty)
  }
}
