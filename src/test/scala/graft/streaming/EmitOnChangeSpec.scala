package graft.streaming

import graft.TestSpark
import graft.api.GraftStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** KIP-557 emit-on-change semantics (StatefulOps.emitOnChange): idempotent
  * table updates are dropped, transitions flow, the current-value state
  * crosses micro-batches, and in-batch arrivals fold in event-time order. */
class EmitOnChangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def ts(ms: Long) = TestSpark.ts(ms)

  test("idempotent updates are suppressed ACROSS batches; changes emit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[String, (Long, String)](mem.toDF(),
      col("_1"), struct(col("_2").as("_1"), col("_3").as("_2")), col("_4"))
    val q = StatefulOps.emitOnChange(ks)
      .toDF("k", "id", "v")
      .writeStream.format("memory").queryName("eoc_spec")
      .outputMode(OutputMode.Append).start()
    def got() = spark.table("eoc_spec").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    try {
      // batch 1: first write emits; same-value update is a no-op; the
      // value CHANGE emits (order by ts, not arrival: id=3 arrives first
      // but sorts last)
      mem.addData(("A", 3L, "y", ts(3000L)), ("A", 1L, "x", ts(1000L)),
        ("A", 2L, "x", ts(2000L)))
      q.processAllAvailable()
      assert(got() === Set(("A", 1L, "x"), ("A", 3L, "y")), s"got ${got()}")
      // batch 2: the cross-batch no-op ("y" again) is suppressed — state
      // carries the current value; a real change emits
      mem.addData(("A", 4L, "y", ts(4000L)), ("A", 5L, "z", ts(5000L)))
      q.processAllAvailable()
      assert(got() === Set(("A", 1L, "x"), ("A", 3L, "y"), ("A", 5L, "z")),
        s"got ${got()}")
      // independent keys keep independent state
      mem.addData(("B", 6L, "z", ts(6000L)))
      q.processAllAvailable()
      assert(got().contains(("B", 6L, "z")), s"got ${got()}")
    } finally q.stop()
  }

  test("equal timestamps tie-break on the caller's id order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[String, (Long, String)](mem.toDF(),
      col("_1"), struct(col("_2").as("_1"), col("_3").as("_2")), col("_4"))
    val q = StatefulOps.emitOnChange(ks)
      .toDF("k", "id", "v")
      .writeStream.format("memory").queryName("eoc_tie")
      .outputMode(OutputMode.Append).start()
    try {
      // same ts: id 1 ("x") folds before id 2 ("y") regardless of arrival
      mem.addData(("A", 2L, "y", ts(1000L)), ("A", 1L, "x", ts(1000L)))
      q.processAllAvailable()
      val got = spark.table("eoc_tie").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(got === Set((1L, "x"), (2L, "y")), s"got $got")
    } finally q.stop()
  }
}
