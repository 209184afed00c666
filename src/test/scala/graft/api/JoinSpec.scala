package graft.api

import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.TestSpark.ts

/** Join semantics across all §2.5 flavors, mirroring
  * `KStreamKStreamJoinTest.java:125-352` / `KStreamKTableJoinTest` /
  * `KStreamGlobalKTableJoinTest` / `TableTableJoinIntegrationTest`:
  * left values "X<k>", right values "Y<k>", joined output "X0+Y0". */
class JoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  private def left: KStream[Int, String] = builder.stream(
    spark.createDataset(Seq(
      (0, "X0", ts(0L)), (1, "X1", ts(1000L)), (2, "X2", ts(2000L)), (3, "X3", ts(3000L)))))

  private def right: KStream[Int, String] = builder.stream(
    spark.createDataset(Seq(
      (0, "Y0", ts(100L)), (1, "Y1", ts(1100L)), (2, "Y2", ts(50000L)))))

  private def out[K, V](s: KStream[K, V]): Seq[(K, V)] =
    s.toDataset.collect().toSeq.map(r => (r._1, r._2)).sortBy(_.toString)

  test("stream-stream inner interval join matches within window (KStreamKStreamJoinTest)") {
    // window ±1s: keys 0,1 match; key 2's Y2 is 48s away; key 3 unmatched
    val got = out(left.join(right, JoinWindows.of(Duration.ofSeconds(1)))(_ + "+" + _))
    assert(got === Seq((0, "X0+Y0"), (1, "X1+Y1")))
  }

  test("stream-stream join honors asymmetric before/after") {
    // before=0, after=2s: Y must be in [X.ts, X.ts+2s]
    val w = JoinWindows(beforeMs = 0L, afterMs = 2000L, graceMs = 0L)
    val got = out(left.join(right, w)(_ + "+" + _))
    assert(got === Seq((0, "X0+Y0"), (1, "X1+Y1")))
    // reversed: Y strictly before X => only pairs where right.ts <= left.ts
    val wb = JoinWindows(beforeMs = 2000L, afterMs = 0L, graceMs = 0L)
    assert(out(left.join(right, wb)(_ + "+" + _)) === Seq())
  }

  test("stream-stream left join emits None for unmatched (KStreamKStreamLeftJoinTest)") {
    val got = out(left.leftJoin(right, JoinWindows.of(Duration.ofSeconds(1)))(
      (v, vo) => v + "+" + vo.getOrElse("null")))
    assert(got === Seq((0, "X0+Y0"), (1, "X1+Y1"), (2, "X2+null"), (3, "X3+null")))
  }

  test("stream-table join sees current table value, inner drops misses (KStreamKTableJoinTest)") {
    // table: key 0 updated twice (latest wins), key 9 unused, no key 2/3
    val table = builder.table(spark.createDataset(Seq(
      (0, "old0", ts(0L)), (0, "T0", ts(500L)), (1, "T1", ts(0L)), (9, "T9", ts(0L)))))
    val got = out(left.joinTable(table)(_ + "+" + _))
    assert(got === Seq((0, "X0+T0"), (1, "X1+T1")))
  }

  test("stream-table left join keeps stream record on miss") {
    val table = builder.table(spark.createDataset(Seq((0, "T0", ts(0L)))))
    val got = out(left.leftJoinTable(table)((v, vt) => v + "+" + vt.getOrElse("null")))
    assert(got === Seq((0, "X0+T0"), (1, "X1+null"), (2, "X2+null"), (3, "X3+null")))
  }

  test("table tombstone removes key from join view (KTableSource tombstone)") {
    val table = builder.table[Int, String](spark.createDataset(Seq(
      (0, "T0", ts(0L)), (0, null.asInstanceOf[String], ts(500L)), (1, "T1", ts(0L)))))
    val got = out(left.joinTable(table)(_ + "+" + _))
    assert(got === Seq((1, "X1+T1"))) // key 0 deleted by tombstone
  }

  test("stream-global join via key mapper, not co-partitioned (KStreamGlobalKTableJoinTest)") {
    val global = builder.globalTable[String, String](
      Seq(("even", "E"), ("odd", "O")).toDF("k", "v"), col("k"), col("v"))
    val got = out(left.joinGlobal(global)((k, _) => if (k % 2 == 0) "even" else "odd")(
      (v, gv) => v + "+" + gv))
    assert(got === Seq((0, "X0+E"), (1, "X1+O"), (2, "X2+E"), (3, "X3+O")))
  }

  test("stream-global left join emits None on miss") {
    val global = builder.globalTable[String, String](
      Seq(("even", "E")).toDF("k", "v"), col("k"), col("v"))
    val got = out(left.leftJoinGlobal(global)((k, _) => if (k % 2 == 0) "even" else "odd")(
      (v, gv) => v + "+" + gv.getOrElse("null")))
    assert(got === Seq((0, "X0+E"), (1, "X1+null"), (2, "X2+E"), (3, "X3+null")))
  }

  test("stream-stream outer join emits both-side unmatched (KStreamKStreamOuterJoinTest)") {
    val got = out(left.outerJoin(right, JoinWindows.of(Duration.ofSeconds(1)))(
      (v, vo) => v.getOrElse("null") + "+" + vo.getOrElse("null")))
    assert(got === Seq(
      (0, "X0+Y0"), (1, "X1+Y1"), (2, "X2+null"), (2, "null+Y2"), (3, "X3+null")))
  }

  test("table-table inner/left/outer joins (TableTableJoinIntegrationTest)") {
    val tl = builder.table(spark.createDataset(Seq(
      (0, "L0", ts(0L)), (1, "L1", ts(0L)))))
    val tr = builder.table(spark.createDataset(Seq(
      (1, "R1", ts(0L)), (2, "R2", ts(0L)))))

    val inner = tl.join(tr)(_ + "+" + _).toDataset.collect().map(r => (r._1, r._2)).sorted
    assert(inner === Seq((1, "L1+R1")))

    val leftJ = tl.leftJoin(tr)((l, r) => l + "+" + r.getOrElse("null"))
      .toDataset.collect().map(r => (r._1, r._2)).sorted
    assert(leftJ === Seq((0, "L0+null"), (1, "L1+R1")))

    val outer = tl.outerJoin(tr)((l, r) =>
        l.getOrElse("null") + "+" + r.getOrElse("null"))
      .toDataset.collect().map(r => (r._1, r._2)).sorted
    assert(outer === Seq((0, "L0+null"), (1, "L1+R1"), (2, "null+R2")))
  }

  test("foreign-key join keys result by left key; fk change follows re-point (KIP-213)") {
    // orders keyed by order id, value = (customer fk, payload); the
    // changelog re-points o2 from c1 to c2 — only the latest fk joins
    val orders = builder.table(spark.createDataset(Seq(
      (10, ("c1", "o10"), ts(0L)), (11, ("c1", "o11"), ts(0L)),
      (12, ("c2", "o12"), ts(0L)), (12, ("c3", "o12b"), ts(1000L)),
      (13, ("c9", "o13"), ts(0L)))))
    val customers = builder.table(spark.createDataset(Seq(
      ("c1", "gold", ts(0L)), ("c2", "silver", ts(0L)), ("c3", "bronze", ts(0L)))))

    val inner = orders.fkJoin(customers)(_._1)((o, c) => o._2 + "+" + c)
      .toDataset.collect().map(r => (r._1, r._2)).sorted
    assert(inner === Seq((10, "o10+gold"), (11, "o11+gold"), (12, "o12b+bronze")))

    val leftJ = orders.fkLeftJoin(customers)(_._1)((o, c) => o._2 + "+" + c.getOrElse("null"))
      .toDataset.collect().map(r => (r._1, r._2)).sorted
    assert(leftJ === Seq((10, "o10+gold"), (11, "o11+gold"),
      (12, "o12b+bronze"), (13, "o13+null")))
  }
}
