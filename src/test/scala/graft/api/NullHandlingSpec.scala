package graft.api

import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts

/** Reference null-record semantics at stateful/join boundaries: records
  * with a null key or null value are skipped (droppedRecordsSensor), not
  * grouped, not joined, and never emitted as unmatched left rows —
  * `KStreamKStreamJoinTest.shouldLogAndMeterOnSkippedRecordsWithNullValue`
  * et al. Tombstones on the KTable side are NOT affected (null value is
  * data there). */
class NullHandlingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  private def withNulls: KStream[String, String] = builder.stream(
    spark.createDataset(Seq(
      ("a", "v1", ts(1000L)),
      (null.asInstanceOf[String], "vNullKey", ts(2000L)),
      ("b", null.asInstanceOf[String], ts(3000L)),
      ("a", "v2", ts(4000L)))))

  test("groupByKey drops null-key and null-value records (aggregate null-skip)") {
    val counts = withNulls.groupByKey.count()
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_._1)
    assert(counts === Seq(("a", 2L))) // null-key and null-value rows gone
  }

  test("interval joins skip null records on both sides, even for left/outer") {
    val right = builder.stream(spark.createDataset(Seq(
      ("a", "R", ts(1000L)), (null.asInstanceOf[String], "RNull", ts(2000L)))))
    val leftJ = withNulls.leftJoin(right, JoinWindows.of(Duration.ofSeconds(10)))(
      (v, r) => v + "+" + r.getOrElse("none"))
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_.toString)
    // null-key/null-value left rows are SKIPPED, not emitted as unmatched
    assert(leftJ === Seq(("a", "v1+R"), ("a", "v2+R")))
  }

  test("stream-table join skips null stream records; table tombstones still apply") {
    val table = builder.table(spark.createDataset(Seq(
      ("a", "T1", ts(100L)),
      ("b", "T2", ts(200L)),
      ("b", null.asInstanceOf[String], ts(300L))))) // tombstone: b leaves
    val joined = withNulls.leftJoinTable(table)(
      (v, t) => v + "+" + t.getOrElse("none"))
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_.toString)
    assert(joined === Seq(("a", "v1+T1"), ("a", "v2+T1")))
  }

  test("global lookup join skips null stream records") {
    val g = builder.globalTable[String, String](
      Seq(("a", "G")).toDF("k", "v"), org.apache.spark.sql.functions.col("k"),
      org.apache.spark.sql.functions.col("v"))
    val joined = withNulls.leftJoinGlobal(g)((k, _) => k)(
      (v, gv) => v + "+" + gv.getOrElse("none"))
      .toDataset.collect().map(r => (r._1, r._2)).sortBy(_.toString)
    assert(joined === Seq(("a", "v1+G"), ("a", "v2+G")))
  }
}
