package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** The `KafkaStreams.metrics()` surface (reference
  * `streams/src/main/java/org/apache/kafka/streams/KafkaStreams.java:384`,
  * sensors registered in `StreamsMetricsImpl` / `processor/internals/
  * StreamThread.java` — process-rate, commit-latency, records-processed,
  * and per-store metrics): a registry of live throughput/latency/state
  * gauges per running topology.
  *
  * Spark-first: every micro-batch already publishes a
  * `StreamingQueryProgress`; this listener folds those into the same
  * gauge names the reference exposes, per query. Attach once per session —
  * all queries report through it, mirroring the one `Metrics` registry per
  * KafkaStreams instance.
  */
final class GraftMetrics private () extends StreamingQueryListener {

  /** Latest + cumulative gauges per query name. */
  final case class QueryMetrics(
      recordsProcessedTotal: Long,
      processRate: Double, // records/s, latest batch (process-rate sensor)
      commitLatencyMs: Double, // batch duration ≈ commit-latency-avg
      stateRows: Long, // sum of stateful-operator rows (store size gauge)
      stateBytes: Long,
      batches: Long, // ≈ commit-total
      running: Boolean)

  private val byQuery = TrieMap.empty[String, QueryMetrics]
  // terminate events carry only the id; started events map it to the name
  private val nameById = TrieMap.empty[String, String]

  /** All registered gauges — `KafkaStreams.metrics()`. */
  def metrics: Map[String, QueryMetrics] = byQuery.toMap

  def metricsFor(queryName: String): Option[QueryMetrics] = byQuery.get(queryName)

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    val name = Option(event.name).getOrElse(event.id.toString)
    nameById.put(event.id.toString, name)
    byQuery.put(name, QueryMetrics(0L, 0.0, 0.0, 0L, 0L, 0L, running = true))
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val prev = byQuery.getOrElse(name, QueryMetrics(0L, 0.0, 0.0, 0L, 0L, 0L, running = true))
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    val stateBytes = Option(p.stateOperators).map(_.map(_.memoryUsedBytes).sum).getOrElse(0L)
    byQuery.put(name, QueryMetrics(
      recordsProcessedTotal = prev.recordsProcessedTotal + p.numInputRows,
      processRate = p.processedRowsPerSecond,
      commitLatencyMs =
        Option(p.batchDuration).map(_.toDouble).getOrElse(prev.commitLatencyMs),
      stateRows = stateRows,
      stateBytes = stateBytes,
      batches = prev.batches + 1,
      running = true))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    // the terminate event carries only the id — resolve the started name
    val name = nameById.remove(event.id.toString).getOrElse(event.id.toString)
    byQuery.updateWith(name)(_.map(_.copy(running = false)))
  }
}

object GraftMetrics {
  /** Attach a fresh registry to the session (idempotent per instance). */
  def attach(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: GraftMetrics): Unit =
    spark.streams.removeListener(m)
}
