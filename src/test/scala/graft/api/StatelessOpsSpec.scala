package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.ts

/** Golden per-operator tests for the stateless DSL surface, mirroring the
  * reference's driver-based unit tests (`streams/src/test/java/.../
  * kstream/internals/KStreamFilterTest.java` et al., FIXTURES.md §A.1):
  * keys 0..3, self-describing values "X0".."X3". */
class StatelessOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  private def input: KStream[Int, String] = builder.stream(
    spark.createDataset(Seq(
      (0, "X0", ts(0L)), (1, "X1", ts(10L)), (2, "X2", ts(20L)), (3, "X3", ts(30L)))))

  private def out[K, V](s: KStream[K, V]): Seq[(K, V)] =
    s.toDataset.collect().toSeq.map(r => (r._1, r._2)).sortBy(_.toString)

  test("filter keeps matching records (KStreamFilterTest)") {
    assert(out(input.filter((k, _) => k % 2 == 0)) === Seq((0, "X0"), (2, "X2")))
    assert(out(input.filterNot((k, _) => k % 2 == 0)) === Seq((1, "X1"), (3, "X3")))
  }

  test("where = columnar filter fast path") {
    import org.apache.spark.sql.functions.col
    assert(out(input.where(col("key") > 1)) === Seq((2, "X2"), (3, "X3")))
  }

  test("map transforms key and value (KStreamMapTest)") {
    assert(out(input.map((k, v) => (k * 10, v + "!"))) ===
      Seq((0, "X0!"), (10, "X1!"), (20, "X2!"), (30, "X3!")))
  }

  test("mapValues preserves key (KStreamMapValuesTest)") {
    assert(out(input.mapValues(_.toLowerCase)) ===
      Seq((0, "x0"), (1, "x1"), (2, "x2"), (3, "x3")))
    assert(out(input.mapValuesWithKey((k, v) => s"$v@$k")) ===
      Seq((0, "X0@0"), (1, "X1@1"), (2, "X2@2"), (3, "X3@3")))
  }

  test("selectKey re-keys (KStreamSelectKeyTest)") {
    assert(out(input.selectKey((_, v) => v)) ===
      Seq(("X0", "X0"), ("X1", "X1"), ("X2", "X2"), ("X3", "X3")))
  }

  test("flatMap emits 0..n records (KStreamFlatMapTest)") {
    val got = out(input.flatMap((k, v) => (0 until k).map(i => (k, s"$v-$i"))))
    assert(got === Seq(
      (1, "X1-0"), (2, "X2-0"), (2, "X2-1"), (3, "X3-0"), (3, "X3-1"), (3, "X3-2")))
  }

  test("flatMapValues preserves key (KStreamFlatMapValuesTest)") {
    assert(out(input.flatMapValues(v => Seq(v, v + "x"))) === Seq(
      (0, "X0"), (0, "X0x"), (1, "X1"), (1, "X1x"),
      (2, "X2"), (2, "X2x"), (3, "X3"), (3, "X3x")))
  }

  test("branch routes each record to first matching predicate only (KStreamBranchTest)") {
    val Seq(evens, small, rest) = input.branch(
      (k, _) => k % 2 == 0,
      (k, _) => k < 2, // 0 already went to evens; only 1 lands here
      (_, _) => true)
    assert(out(evens) === Seq((0, "X0"), (2, "X2")))
    assert(out(small) === Seq((1, "X1")))
    assert(out(rest) === Seq((3, "X3")))
  }

  test("split routes to named branches; default catches the rest (KIP-418)") {
    val m = input.splitWithDefault("other",
      "evens" -> ((k, _) => k % 2 == 0),
      "small" -> ((k, _) => k < 2))
    assert(out(m("evens")) === Seq((0, "X0"), (2, "X2")))
    assert(out(m("small")) === Seq((1, "X1"))) // 0 went to evens first
    assert(out(m("other")) === Seq((3, "X3")))
  }

  test("split rejects duplicate branch names (BranchedKStream contract)") {
    intercept[IllegalArgumentException] {
      input.split("a" -> ((k, _) => k % 2 == 0), "a" -> ((_, _) => true))
    }
  }

  test("merge is UNION ALL (KStreamImpl.merge)") {
    val dup = input.merge(input)
    assert(dup.toDataset.count() === 8)
  }

  test("peek passes records through unchanged (KStreamPeekTest)") {
    assert(out(input.peek((_, _) => ())) === out(input))
  }

  test("mapValuesExpr = columnar value transform fast path") {
    import org.apache.spark.sql.functions.{concat, lit, col}
    assert(out(input.mapValuesExpr(concat(col("value"), lit("!")))) ===
      Seq((0, "X0!"), (1, "X1!"), (2, "X2!"), (3, "X3!")))
  }

  test("repartitionByKey keeps data intact and partitions by key (through())") {
    val rp = input.repartitionByKey(2)
    assert(out(rp) === out(input))
    assert(rp.toDF.rdd.getNumPartitions === 2)
  }

  test("describe prints the logical topology") {
    val d = input.filter((k, _) => k > 0).describe()
    assert(d.contains("Filter"))
  }

  test("transform = per-partition PAPI processor (stateless)") {
    val got = out(input.transform[Int, String](it => it.map(r => (r._1, r._2 + "T", r._3))))
    assert(got === Seq((0, "X0T"), (1, "X1T"), (2, "X2T"), (3, "X3T")))
  }
}
