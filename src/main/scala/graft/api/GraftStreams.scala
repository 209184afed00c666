package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import Rec._

/** Topology entry point — the reference's `StreamsBuilder`
  * (`streams/.../StreamsBuilder.java`). Sources produce [[KStream]] /
  * [[KTable]] / [[GlobalKTable]] nodes; there is no separate
  * build/optimize/start phase because the Dataset DAG *is* the logical
  * plan and Catalyst performs the §4.1 rewrites (repartition merge/elision
  * ≈ EnsureRequirements + ReuseExchange) as part of normal planning.
  */
final class GraftStreams(val spark: SparkSession) {

  /** `StreamsBuilder.stream(topic)` analogue over an arbitrary DataFrame
    * (batch or streaming): designate key/value/event-time columns — the
    * `TimestampExtractor` (`processor/TimestampExtractor.java`) becomes
    * the `ts` column expression. */
  def stream[K: Encoder, V: Encoder](df: DataFrame, key: Column, value: Column,
      ts: Column): KStream[K, V] =
    new KStream[K, V](df.select(key.as(KeyCol), value.as(ValueCol), ts.as(TsCol)))

  /** Typed source from a Dataset of (key, value, eventTime). */
  def stream[K: Encoder, V: Encoder](ds: Dataset[(K, V, Timestamp)]): KStream[K, V] =
    new KStream[K, V](ds.toDF(KeyCol, ValueCol, TsCol))

  /** `StreamsBuilder.stream` against a Kafka broker via Structured
    * Streaming's Kafka source — the path that consumes a kafkadirect
    * broker over its unmodified TCP protocol (SURVEY.md §2.9). Returns
    * raw (key, value) bytes keyed by the record timestamp; deserialize
    * with `mapValues` / `from_json` / `from_avro` downstream. */
  def kafkaStream(bootstrapServers: String, subscribe: String,
      options: Map[String, String] = Map.empty): KStream[Array[Byte], Array[Byte]] = {
    import org.apache.spark.sql.Encoders
    val df = options.foldLeft(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("subscribe", subscribe)) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select(col("key"), col("value"), col("timestamp").as(TsCol))
    new KStream[Array[Byte], Array[Byte]](df)(Encoders.BINARY, Encoders.BINARY)
  }

  /** `StreamsBuilder.stream(Collection<topic>)` (`StreamsBuilder.java:115`)
    * — subscribe to several topics in one stream. */
  def kafkaStreamTopics(bootstrapServers: String, topics: Seq[String],
      options: Map[String, String] = Map.empty): KStream[Array[Byte], Array[Byte]] =
    kafkaStream(bootstrapServers, topics.mkString(","), options)

  /** `StreamsBuilder.stream(Pattern)` (`StreamsBuilder.java:159`) — regex
    * topic subscription (`subscribePattern`). */
  def kafkaStreamPattern(bootstrapServers: String, pattern: String,
      options: Map[String, String] = Map.empty): KStream[Array[Byte], Array[Byte]] = {
    import org.apache.spark.sql.Encoders
    val df = options.foldLeft(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("subscribePattern", pattern)) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select(col("key"), col("value"), col("timestamp").as(TsCol))
    new KStream[Array[Byte], Array[Byte]](df)(Encoders.BINARY, Encoders.BINARY)
  }

  /** [[kafkaStream]] carrying full consumer-record metadata — topic,
    * partition, offset, headers (`ConsumerRecord.java:37-47`) — in the
    * value as `(payload, RecordMeta)`; headers flow through the DSL like
    * the reference forwards them through stateless processors. */
  def kafkaStreamWithMeta(bootstrapServers: String, subscribe: String,
      options: Map[String, String] = Map.empty): KStream[Array[Byte], (Array[Byte], RecordMeta)] = {
    val df = options.foldLeft(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("subscribe", subscribe)
          .option("includeHeaders", "true")) { case (r, (k, v)) => r.option(k, v) }
      .load()
    RecordMeta.fromConsumerRecords(df)
  }

  /** `StreamsBuilder.table(topic)` (`StreamsBuilder.java:225`): changelog
    * → latest-per-key view; null values are tombstones. */
  def table[K: Encoder, V: Encoder](df: DataFrame, key: Column, value: Column,
      ts: Column): KTable[K, V] =
    new KTable[K, V](
      df.select(key.as(KeyCol), value.as(ValueCol), ts.as(TsCol)), deduped = false)

  def table[K: Encoder, V: Encoder](ds: Dataset[(K, V, Timestamp)]): KTable[K, V] =
    new KTable[K, V](ds.toDF(KeyCol, ValueCol, TsCol), deduped = false)

  /** `StreamsBuilder.globalTable` (`StreamsBuilder.java:335`): broadcast
    * dimension table; must be batch (refresh by rebuilding — the
    * reference's GlobalStreamThread restore loop collapses to a re-read). */
  def globalTable[K: Encoder, V: Encoder](df: DataFrame, key: Column,
      value: Column): GlobalKTable[K, V] = {
    require(!df.isStreaming, "global tables are broadcast snapshots; pass a batch DataFrame")
    new GlobalKTable[K, V](df.select(key.as(KeyCol), value.as(ValueCol)))
  }
}

object GraftStreams {
  def apply(spark: SparkSession): GraftStreams = new GraftStreams(spark)
}

/** Sinks — `KStream.to` / console / memory / foreachBatch
  * (`kstream/KStream.java:458`, `Topology.addSink`). Streaming-side
  * output-mode selection honors table suppression: a suppressed table
  * (final results) emits in append mode after the watermark; an
  * unsuppressed table emits updates per micro-batch — the reference's
  * cache-flush cadence (`StreamsConfig` commit.interval.ms ≈ trigger). */
object GraftSinks {

  /** Start a streaming KStream into an in-memory table (the test harness
    * sink — our TopologyTestDriver output analogue). */
  def toMemory[K, V](s: KStream[K, V], queryName: String,
      outputMode: OutputMode = OutputMode.Append): StreamingQuery =
    s.toDF.writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()

  /** Streaming table → memory sink; update vs append chosen by
    * suppression. */
  def tableToMemory[K, V](t: KTable[K, V], queryName: String): StreamingQuery = {
    val mode = if (t.suppressed) OutputMode.Append else OutputMode.Update
    t.df.writeStream.format("memory").queryName(queryName).outputMode(mode).start()
  }

  /** `KStream.to(kafka)` — at-least-once to a Kafka topic (EOS to Kafka
    * sinks is a documented gap, SURVEY.md §7.4; files/Delta get
    * exactly-once via checkpointing). */
  def toKafka[K, V](s: KStream[K, V], bootstrapServers: String, topic: String,
      checkpoint: String): StreamingQuery =
    s.toDF
      .select(col(Rec.KeyCol).cast("binary").as("key"),
        col(Rec.ValueCol).cast("binary").as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** [[toKafka]] for metadata-carrying streams: forwards the record
    * headers to the sink (`includeHeaders` write path). */
  def toKafkaWithHeaders[K](s: KStream[K, (Array[Byte], RecordMeta)],
      bootstrapServers: String, topic: String, checkpoint: String): StreamingQuery =
    RecordMeta.toProducerRecords(s)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("includeHeaders", "true")
      .option("checkpointLocation", checkpoint)
      .start()

  /** Dynamic topic routing (`TopicNameExtractor`): a computed `topic`
    * column routes each record. */
  def toKafkaRouted[K, V](s: KStream[K, V], bootstrapServers: String,
      topicExpr: Column, checkpoint: String): StreamingQuery =
    s.toDF
      .select(topicExpr.as("topic"),
        col(Rec.KeyCol).cast("binary").as("key"),
        col(Rec.ValueCol).cast("binary").as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming parquet sink (exactly-once via checkpoint+WAL). */
  def toParquetStream[K, V](s: KStream[K, V], path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    s.toDF.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .trigger(trigger).start()

  /** Maintain a queryable materialized view of a streaming KTable as a
    * keyed parquet upsert (exactly-once via checkpoint + idempotent batch
    * merge): each micro-batch's updates overwrite the affected keys; null
    * values delete. The Delta-less IQ/materialization sink — readers see
    * the current table with plain `spark.read.parquet(path)` (plus the
    * `bucket` partition column).
    *
    * Storage is hash-bucketed (`graft.sources.UpsertView`): a batch
    * rewrites only the buckets containing its keys — O(batch × table/n)
    * per trigger, not O(table) — with a per-bucket crash-safe swap. Size
    * `numBuckets` so one bucket is a comfortable rewrite unit at the
    * table's full scale. */
  def upsertParquet[K, V](t: KTable[K, V], path: String, checkpoint: String,
      numBuckets: Int = 16): StreamingQuery = {
    graft.sources.UpsertView.recoverAll(path)
    t.df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.sources.UpsertView.merge(batch.toDF(), path, numBuckets,
          Rec.KeyCol, Rec.ValueCol, Rec.TsCol)
      }
      .start()
  }

  /** PAPI `process` terminal / punctuation-free side effects:
    * foreachBatch. */
  def foreachBatch[K, V](s: KStream[K, V], checkpoint: String)(
      f: (DataFrame, Long) => Unit): StreamingQuery =
    s.toDF.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((d: Dataset[Row], id: Long) => f(d.toDF(), id))
      .start()
}
