package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interactive queries (§2.7): the reference exposes running state through
  * `KafkaStreams.store(name, type)` (`KafkaStreams.java:1064`) with
  * `ReadOnlyKeyValueStore.get/range/all`
  * (`state/ReadOnlyKeyValueStore.java:38-65`).
  *
  * Spark mapping: materialize the view either into a memory-sink table
  * (small/hot views — this wrapper) or read the raw operator state from a
  * checkpoint via the state store data source
  * (`spark.read.format("statestore")` — [[QueryableState.fromCheckpoint]]).
  * Both serve point lookups, range scans, and full scans without touching
  * the running query.
  */
final class QueryableStore(view: () => DataFrame, keyCol: String) {

  /** `ReadOnlyKeyValueStore.get(key)`. */
  def get(key: Any): Option[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) === lit(key)).collect().headOption

  /** `ReadOnlyKeyValueStore.range(from, to)` — inclusive, key-ordered. */
  def range(from: Any, to: Any): Array[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) >= lit(from) && col(keyCol) <= lit(to))
      .orderBy(col(keyCol)).collect()

  /** `ReadOnlyKeyValueStore.all()`. */
  def all(): Array[org.apache.spark.sql.Row] = view().orderBy(col(keyCol)).collect()

  /** `approximateNumEntries()`. */
  def approximateNumEntries(): Long = view().count()
}

/** `ReadOnlyWindowStore` (`state/ReadOnlyWindowStore.java:39-107`): IQ
  * over a windowed aggregation's view — point fetches bounded by window
  * start time, per-key time ranges, and all-keys range scans. Expects the
  * windowed agg's sink columns (key, window start, aggregate...). */
final class QueryableWindowStore(view: () => DataFrame, keyCol: String,
    windowStartCol: String) {

  /** `fetch(key, timeFrom, timeTo)` — windows of one key whose start
    * falls in the (inclusive) range, time-ascending. */
  def fetch(key: Any, from: java.sql.Timestamp, to: java.sql.Timestamp): Array[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) === lit(key) &&
        col(windowStartCol) >= lit(from) && col(windowStartCol) <= lit(to))
      .orderBy(col(windowStartCol)).collect()

  /** `fetch(keyFrom, keyTo, timeFrom, timeTo)` — key+time range scan. */
  def fetchRange(keyFrom: Any, keyTo: Any, from: java.sql.Timestamp,
      to: java.sql.Timestamp): Array[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) >= lit(keyFrom) && col(keyCol) <= lit(keyTo) &&
        col(windowStartCol) >= lit(from) && col(windowStartCol) <= lit(to))
      .orderBy(col(keyCol), col(windowStartCol)).collect()

  /** `all()` — every (key, window) entry. */
  def all(): Array[org.apache.spark.sql.Row] =
    view().orderBy(col(keyCol), col(windowStartCol)).collect()
}

/** `ReadOnlySessionStore` (`state/ReadOnlySessionStore.java:33-59`): IQ
  * over a session-windowed view — all sessions of a key, and sessions
  * overlapping a time range (`findSessions`). Expects the session agg's
  * sink columns (key, session start, session end, aggregate...). */
final class QueryableSessionStore(view: () => DataFrame, keyCol: String,
    startCol: String, endCol: String) {

  /** `fetch(key)` — every session of the key, start-ascending. */
  def fetch(key: Any): Array[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) === lit(key)).orderBy(col(startCol)).collect()

  /** `findSessions(key, earliest, latest)` — sessions OVERLAPPING the
    * range (start <= latest && end >= earliest), like the reference. */
  def findSessions(key: Any, earliest: java.sql.Timestamp,
      latest: java.sql.Timestamp): Array[org.apache.spark.sql.Row] =
    view().filter(col(keyCol) === lit(key) &&
        col(startCol) <= lit(latest) && col(endCol) >= lit(earliest))
      .orderBy(col(startCol)).collect()
}

object QueryableState {

  /** Store over a memory-sink table fed by an update-mode table query
    * (latest row per key wins — the memory sink appends each update).
    * Ordering is primarily the EVENT TIME carried in the sink (`tsCol`,
    * present in every DSL record), so the view is stable however the sink
    * interleaves batches; the insertion sequence only breaks same-ts
    * ties. Tables without a ts column fall back to insertion order. */
  def memoryStore(spark: SparkSession, queryName: String, keyCol: String,
      tsCol: String = "ts"): QueryableStore =
    new QueryableStore(() => {
      val t = spark.table(queryName)
      // latest emitted update per key = current table state
      val cols = t.columns.toIndexedSeq
      val ord =
        if (cols.contains(tsCol)) struct(col(tsCol), col("__seq"))
        else struct(col("__seq"))
      t.withColumn("__seq", monotonically_increasing_id())
        .groupBy(col(keyCol))
        .agg(max_by(struct(cols.map(col): _*), ord).as("m"))
        .select(cols.map(c => col(s"m.$c").as(c)): _*)
    }, keyCol)

  /** Window store over a memory-sink table fed by a windowed aggregation
    * in update mode: latest emission per (key, window start) wins, same
    * event-time-primary ordering as [[memoryStore]]. */
  def memoryWindowStore(spark: SparkSession, queryName: String, keyCol: String,
      windowStartCol: String, tsCol: String = "ts"): QueryableWindowStore =
    new QueryableWindowStore(() => {
      val t = spark.table(queryName)
      val cols = t.columns.toIndexedSeq
      // event-time-primary like memoryStore when a ts column rides along;
      // insertion order only breaks ties
      val ord =
        if (cols.contains(tsCol)) struct(col(tsCol), col("__seq"))
        else struct(col("__seq"))
      t.withColumn("__seq", monotonically_increasing_id())
        .groupBy(col(keyCol), col(windowStartCol))
        .agg(max_by(struct(cols.map(col): _*), ord).as("m"))
        .select(cols.map(c => col(s"m.$c").as(c)): _*)
    }, keyCol, windowStartCol)

  /** Session store over a memory-sink table fed by a session-windowed
    * aggregation: latest emission per (key, session start) wins — merged
    * sessions re-emit with the same start and supersede. Caveat for
    * update-mode feeds: a merge that moves a session's START leaves the
    * superseded (key, old-start) row behind (the memory sink has no
    * retractions); feed from `suppressFinal()` (append mode) when exact
    * final sessions are required. */
  def memorySessionStore(spark: SparkSession, queryName: String, keyCol: String,
      startCol: String, endCol: String): QueryableSessionStore =
    new QueryableSessionStore(() => {
      val t = spark.table(queryName)
      val cols = t.columns.toIndexedSeq
      t.withColumn("__seq", monotonically_increasing_id())
        .groupBy(col(keyCol), col(startCol))
        .agg(max_by(struct(cols.map(col): _*), struct(col(endCol), col("__seq"))).as("m"))
        .select(cols.map(c => col(s"m.$c").as(c)): _*)
    }, keyCol, startCol, endCol)

  /** Store over operator state persisted in a checkpoint — the
    * state-store data source; queryable while the stream runs, from any
    * process that can read the checkpoint (the reference needs RPC
    * routing across instances for this, `KafkaStreams.java:956-1045`). */
  def fromCheckpoint(spark: SparkSession, checkpointPath: String,
      operatorId: Int = 0): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpointPath)
      .option("operatorId", operatorId.toString)
      .load()
}
