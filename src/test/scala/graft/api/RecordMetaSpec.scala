package graft.api

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Consumer-record metadata (`ConsumerRecord.java:37-47` parity): topic /
  * partition / offset / headers lifted from the Kafka source schema and
  * preserved through a stateless DSL chain; duplicate header keys keep
  * Kafka's ordered-multimap semantics. */
class RecordMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bytes(s: String) = s.getBytes(UTF_8)

  /** A DataFrame with the exact Kafka-source schema (sans broker). */
  private def consumerDf = {
    val rows = Seq(
      ("k1", "hello", "orders", 0, 41L,
        Seq(("trace-id", bytes("t-1")), ("schema-id", bytes("7")))),
      ("k2", "world", "orders", 2, 99L,
        Seq(("trace-id", bytes("t-2")), ("trace-id", bytes("t-2b"))))) // dup key
    rows.toDF("k", "v", "topic", "partition", "offset", "hdrs")
      .select(
        col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"),
        lit(new java.sql.Timestamp(1000L)).as("timestamp"),
        col("hdrs").cast("array<struct<key:string,value:binary>>").as("headers"))
  }

  test("metadata survives a stateless map/filter chain; lastHeader picks the newest dup") {
    val s = RecordMeta.fromConsumerRecords(consumerDf)
    val out = s
      .mapValues { case (payload, meta) =>
        (new String(payload, UTF_8).toUpperCase.getBytes(UTF_8), meta)
      }(RecordMeta.payloadEnc)
      .filter((_, vm) => vm._2.offset >= 41L)
      .toDataset.collect()
      .map { case (k, (payload, meta), _) =>
        (new String(k, UTF_8), new String(payload, UTF_8), meta)
      }.sortBy(_._1)

    assert(out.map(r => (r._1, r._2)).toSeq === Seq(("k1", "HELLO"), ("k2", "WORLD")))
    val m1 = out(0)._3
    assert((m1.topic, m1.partition, m1.offset) === ("orders", 0, 41L))
    assert(m1.headers.map(h => h.key -> new String(h.value, UTF_8)) ===
      Seq("trace-id" -> "t-1", "schema-id" -> "7"))
    assert(m1.lastHeader("missing").isEmpty)
    // duplicate header keys: order preserved, lastHeader returns the newest
    val m2 = out(1)._3
    assert(m2.headers.map(_.key) === Seq("trace-id", "trace-id"))
    assert(new String(m2.lastHeader("trace-id").get, UTF_8) === "t-2b")
  }

  test("dedupDelivery drops redelivered (topic, partition, offset) records") {
    // at-least-once redelivery: the same coordinates appear twice with
    // identical payloads; different offsets survive
    val redelivered = consumerDf.unionByName(consumerDf.filter(col("offset") === 41L))
    val s = RecordMeta.fromConsumerRecords(redelivered)
    assert(s.toDataset.count() === 3) // duplicate present pre-dedup
    val out = RecordMeta.dedupDelivery(s, graceMs = 1000L)
      .toDataset.collect()
      .map { case (_, (_, meta), _) => (meta.topic, meta.partition, meta.offset) }
    assert(out.length === 2)
    assert(out.toSet === Set(("orders", 0, 41L), ("orders", 2, 99L)))
  }

  test("producer projection emits Kafka sink columns with headers intact") {
    val s = RecordMeta.fromConsumerRecords(consumerDf)
    val sinkDf = RecordMeta.toProducerRecords(s)
    assert(sinkDf.columns.toSeq === Seq("key", "value", "headers"))
    val hdrs = sinkDf.orderBy("key").collect()(0).getSeq[org.apache.spark.sql.Row](2)
    assert(hdrs.map(_.getString(0)) === Seq("trace-id", "schema-id"))
  }
}
