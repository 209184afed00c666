package graft.api

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Consumer-record metadata — the reference's `ConsumerRecord` fields
  * beyond (key, value, timestamp)
  * (`clients/src/main/java/org/apache/kafka/clients/consumer/ConsumerRecord.java:37-47`):
  * source topic, partition, offset, and headers. Headers keep Kafka's
  * semantics — ordered, duplicate keys allowed — as a `Seq[Header]`.
  *
  * The DSL threads metadata as part of the VALUE (`(payload, meta)`), so
  * every existing operator — map/filter/join/window — preserves it without
  * widening the (key, value, ts) record layout; drop it with
  * `mapValues(_._1)` when no longer needed (the reference's DSL similarly
  * forwards headers through stateless processors).
  */
final case class Header(key: String, value: Array[Byte])

final case class RecordMeta(
    topic: String, partition: Int, offset: Long, headers: Seq[Header]) {
  /** Last header value for a key (Kafka's `Headers.lastHeader`). */
  def lastHeader(key: String): Option[Array[Byte]] =
    headers.reverseIterator.collectFirst { case Header(`key`, v) => v }
}

object RecordMeta {
  implicit val headerEnc: Encoder[Header] = Encoders.product[Header]
  implicit val metaEnc: Encoder[RecordMeta] = Encoders.product[RecordMeta]
  implicit val payloadEnc: Encoder[(Array[Byte], RecordMeta)] =
    Encoders.tuple(Encoders.BINARY, metaEnc)

  /** Lift a DataFrame with the Kafka source schema (key, value, topic,
    * partition, offset, timestamp, headers array<struct<key,value>>) into
    * the metadata-carrying record layout. Exposed separately from the
    * broker source so the mapping is testable without a broker. */
  def fromConsumerRecords(df: DataFrame): KStream[Array[Byte], (Array[Byte], RecordMeta)] = {
    val shaped = df.select(
      col("key"),
      struct(
        col("value").as("_1"),
        struct(col("topic"), col("partition"), col("offset"),
          col("headers")).as("_2")).as(Rec.ValueCol),
      col("timestamp").as(Rec.TsCol))
    new KStream[Array[Byte], (Array[Byte], RecordMeta)](shaped)(
      Encoders.BINARY, payloadEnc)
  }

  /** Effectively-exactly-once intake over an at-least-once source: drop
    * redelivered records by their (topic, partition, offset) identity —
    * the dedup key the reference's EOS transactions make unnecessary
    * (SURVEY §2.7); state is bounded by the watermark in streaming. */
  def dedupDelivery[K](s: KStream[K, (Array[Byte], RecordMeta)],
      graceMs: Long): KStream[K, (Array[Byte], RecordMeta)] = {
    val coords = Seq("__topic", "__partition", "__offset")
    val df = s.toDF
      .withColumn("__topic", col(s"${Rec.ValueCol}._2.topic"))
      .withColumn("__partition", col(s"${Rec.ValueCol}._2.partition"))
      .withColumn("__offset", col(s"${Rec.ValueCol}._2.offset"))
    val deduped =
      if (df.isStreaming)
        Rec.withGrace(df, graceMs).dropDuplicatesWithinWatermark(coords)
      else df.dropDuplicates(coords)
    new KStream[K, (Array[Byte], RecordMeta)](
      deduped.drop(coords: _*))(s.keyEncoder, payloadEnc)
  }

  /** Project a metadata-carrying stream back to Kafka sink columns,
    * forwarding headers (`includeHeaders` write support). */
  def toProducerRecords[K](s: KStream[K, (Array[Byte], RecordMeta)]): DataFrame =
    s.toDF.select(
      col(Rec.KeyCol).cast("binary").as("key"),
      col(s"${Rec.ValueCol}._1").as("value"),
      col(s"${Rec.ValueCol}._2.headers").as("headers"))
}
