package graft.testkit

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.api.{GraftStreams, KStream, Rec}

/** Synchronous topology test harness — the reference's
  * `TopologyTestDriver` (`streams/test-utils/.../TopologyTestDriver.java`):
  * pipe records in, the topology advances deterministically, read the
  * outputs back — no broker, no wall-clock waits.
  *
  * Spark mapping: a MemoryStream source, the topology as a
  * KStream→KStream function, a named memory sink; `pipe` blocks until the
  * micro-batch is fully processed (`processAllAvailable`), and
  * `readOutput` drains only records emitted since the previous read (the
  * reference's output-topic queue semantics).
  */
final class TopologyTestDriver[K: Encoder, V: Encoder, K2: Encoder, V2: Encoder](
    spark: SparkSession,
    topology: KStream[K, V] => KStream[K2, V2],
    outputMode: OutputMode = OutputMode.Append) {

  private implicit val inEnc: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]
  private implicit val outEnc: Encoder[(K2, V2, Timestamp)] = Rec.tupleEnc[K2, V2]
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val mem = MemoryStream[(K, V, Timestamp)]
  private val sinkName =
    s"ttd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
  private val query = topology(
      GraftStreams(spark).stream[K, V](mem.toDF(), col("_1"), col("_2"), col("_3")))
    .toDF.writeStream.format("memory").queryName(sinkName)
    .outputMode(outputMode).start()
  private var drained = 0

  /** Pipe records into the source topic and process them to quiescence. */
  def pipe(records: (K, V, Timestamp)*): Unit = {
    mem.addData(records)
    query.processAllAvailable()
  }

  /** Records the topology emitted since the last read (empty if none). */
  def readOutput(): Seq[(K2, V2, Timestamp)] = {
    val all = spark.table(sinkName).as[(K2, V2, Timestamp)].collect()
    val fresh = all.drop(drained)
    drained = all.length
    fresh.toSeq
  }

  /** Key → latest value over every emission so far (KTable-style view). */
  def readTable(): Map[K2, V2] = {
    drained = 0
    readOutput().foldLeft(Map.empty[K2, V2]) { case (m, (k, v, _)) => m.updated(k, v) }
  }

  def close(): Unit = query.stop()
}
