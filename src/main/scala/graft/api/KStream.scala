package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

import Rec._

/** Record stream — the reference's `KStream<K,V>`
  * (`streams/.../kstream/KStream.java`), re-expressed over Spark Datasets.
  * Works identically over batch and streaming DataFrames; streaming nodes
  * flow through Structured Streaming (shuffles replace repartition topics,
  * state stores replace changelogs — SURVEY.md §3).
  *
  * Two operator surfaces:
  *   - typed lambdas (parity with the reference's `ValueMapper`/`Predicate`
  *     user-code model, `kstream/ValueMapper.java`);
  *   - columnar variants (`where`, `mapValuesExpr`, …) that stay inside
  *     whole-stage codegen — prefer these in hot paths.
  */
final class KStream[K, V] private[graft] (private[graft] val df: DataFrame)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private implicit def t3: Encoder[(K, V, Timestamp)] = tupleEnc[K, V]
  private[graft] def keyEncoder: Encoder[K] = kEnc
  private def typed: Dataset[(K, V, Timestamp)] = toTyped[K, V](df)
  private def wrap(ds: Dataset[(K, V, Timestamp)]) = new KStream[K, V](fromTyped(ds))

  // ------------------------------------------------- stateless (§2.2)

  /** `KStream.filter` (`kstream/internals/KStreamFilter.java`). */
  def filter(p: (K, V) => Boolean): KStream[K, V] =
    wrap(typed.filter(r => p(r._1, r._2)))

  def filterNot(p: (K, V) => Boolean): KStream[K, V] =
    filter((k, v) => !p(k, v))

  /** Columnar filter fast path (codegen'd; predicate pushdown-eligible). */
  def where(cond: Column): KStream[K, V] = new KStream[K, V](df.filter(cond))

  /** `KStream.selectKey` — marks a repartition point in the reference;
    * here the next stateful op's shuffle re-keys automatically. */
  def selectKey[K2: Encoder](f: (K, V) => K2): KStream[K2, V] =
    new KStream[K2, V](fromTyped(typed.map(r => (f(r._1, r._2), r._2, r._3))(
      tupleEnc[K2, V])))

  /** `KStream.map` (`kstream/internals/KStreamMap.java`). */
  def map[K2: Encoder, V2: Encoder](f: (K, V) => (K2, V2)): KStream[K2, V2] =
    new KStream[K2, V2](fromTyped(typed.map { r =>
      val (k2, v2) = f(r._1, r._2); (k2, v2, r._3)
    }(tupleEnc[K2, V2])))

  /** `KStream.mapValues` (`kstream/internals/KStreamMapValues.java`);
    * key-preserving, so no shuffle is induced downstream. */
  def mapValues[V2: Encoder](f: V => V2): KStream[K, V2] =
    mapValuesWithKey((_, v) => f(v))

  def mapValuesWithKey[V2: Encoder](f: (K, V) => V2): KStream[K, V2] =
    new KStream[K, V2](fromTyped(typed.map(r => (r._1, f(r._1, r._2), r._3))(
      tupleEnc[K, V2])))

  /** Columnar mapValues fast path. */
  def mapValuesExpr(value: Column): KStream[K, V] =
    new KStream[K, V](df.withColumn(ValueCol, value))

  /** Columnar selectKey fast path (key from a column expression — stays
    * inside whole-stage codegen, no typed round-trip). */
  def selectKeyExpr[K2: Encoder](key: Column): KStream[K2, V] =
    new KStream[K2, V](df.withColumn(KeyCol, key))

  /** `KStream.flatMap` (`kstream/internals/KStreamFlatMap.java`). */
  def flatMap[K2: Encoder, V2: Encoder](
      f: (K, V) => IterableOnce[(K2, V2)]): KStream[K2, V2] =
    new KStream[K2, V2](fromTyped(typed.flatMap { r =>
      f(r._1, r._2).iterator.map { case (k2, v2) => (k2, v2, r._3) }
    }(tupleEnc[K2, V2])))

  /** `KStream.flatMapValues` (`kstream/internals/KStreamFlatMapValues.java`). */
  def flatMapValues[V2: Encoder](f: V => IterableOnce[V2]): KStream[K, V2] =
    new KStream[K, V2](fromTyped(typed.flatMap { r =>
      f(r._2).iterator.map(v2 => (r._1, v2, r._3))
    }(tupleEnc[K, V2])))

  /** `KStream.branch` (`kstream/internals/KStreamBranch.java`) —
    * first-matching-predicate wins, each record goes to exactly one
    * branch (predicates are exclusivized like the reference processor). */
  def branch(predicates: ((K, V) => Boolean)*): Seq[KStream[K, V]] =
    predicates.zipWithIndex.map { case (p, i) =>
      val earlier = predicates.take(i)
      filter((k, v) => p(k, v) && !earlier.exists(q => q(k, v)))
    }

  /** `KStream.split()` named branches (KIP-418, Kafka 2.8 `BranchedKStream`
    * — parity-plus over the reference's positional `branch`): same
    * first-match-wins routing, branches addressed by name. */
  def split(branches: (String, (K, V) => Boolean)*): Map[String, KStream[K, V]] = {
    val names = branches.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate branch names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    names.zip(branch(branches.map(_._2): _*)).toMap
  }

  /** [[split]] plus `Branched.defaultBranch()`: records matching no
    * predicate land in `defaultName`. */
  def splitWithDefault(defaultName: String,
      branches: (String, (K, V) => Boolean)*): Map[String, KStream[K, V]] = {
    require(!branches.exists(_._1 == defaultName), s"branch named '$defaultName' collides")
    val preds = branches.map(_._2)
    split(branches: _*) +
      (defaultName -> filter((k, v) => !preds.exists(p => p(k, v))))
  }

  /** `KStream.merge` — UNION ALL (`kstream/internals/KStreamImpl.java:328`). */
  def merge(other: KStream[K, V]): KStream[K, V] =
    new KStream[K, V](df.unionByName(other.df))

  /** `KStream.peek` (`kstream/internals/KStreamPeek.java`). */
  def peek(action: (K, V) => Unit): KStream[K, V] =
    wrap(typed.map { r => action(r._1, r._2); r })

  /** `KStream.through(topic)` — explicit repartition point; Spark shuffles
    * by key instead of round-tripping a topic (`KStream.java:431`). */
  def repartitionByKey(numPartitions: Int): KStream[K, V] =
    new KStream[K, V](df.repartition(numPartitions, col(KeyCol)))

  /** Custom `StreamPartitioner` (`processor/StreamPartitioner.java`):
    * route records by arbitrary expressions instead of the key hash. */
  def repartitionBy(numPartitions: Int, exprs: Column*): KStream[K, V] =
    new KStream[K, V](df.repartition(numPartitions, exprs: _*))

  /** PAPI `process`/`transform` analogue over whole partitions
    * (`kstream/KStream.java:576`); stateless — stateful transforms belong
    * to `flatMapGroupsWithState` on the grouped stream. */
  def transform[K2: Encoder, V2: Encoder](
      f: Iterator[(K, V, Timestamp)] => Iterator[(K2, V2, Timestamp)]): KStream[K2, V2] =
    new KStream[K2, V2](fromTyped(typed.mapPartitions(f)(tupleEnc[K2, V2])))

  // ------------------------------------------------- grouping (§2.3)

  /** Reference null-handling at stateful/join boundaries
    * (`kstream/internals/KStreamKStreamJoin.java:86-89`,
    * `KStreamAggregate.java` null-skip, `KStreamKTableJoinProcessor
    * .java:56-62`): records with a null key or null value are
    * logged-and-skipped (droppedRecordsSensor), never grouped or joined.
    * A no-op for non-nullable columns — Catalyst prunes the
    * trivially-true filter. */
  private def droppingNulls: DataFrame =
    df.filter(col(KeyCol).isNotNull && col(ValueCol).isNotNull)

  /** `KStream.groupByKey` (`kstream/KGroupedStreamImpl.java`); null
    * key/value records drop (the aggregate processor's null-skip). */
  def groupByKey: KGroupedStream[K, V] = new KGroupedStream[K, V](droppingNulls)

  /** `KStream.groupBy(selector)` — key change; the downstream shuffle
    * replaces the reference's `-repartition` topic
    * (`kstream/internals/KStreamImpl.java:640`). */
  def groupBy[K2: Encoder](f: (K, V) => K2): KGroupedStream[K2, V] =
    selectKey(f).groupByKey

  // ------------------------------------------------- joins (§2.5)

  private def sides[VO: Encoder](other: KStream[K, VO]) = {
    // both join sides drop null key/value records (KStreamKStreamJoin's
    // null-skip applies before the window store on each side)
    val l = droppingNulls
      .select(col(KeyCol), col(ValueCol).as("l_value"), col(TsCol).as("l_ts"))
    val r = other.droppingNulls.select(col(KeyCol).as("r_key"),
      col(ValueCol).as("r_value"), col(TsCol).as("r_ts"))
    (l, r)
  }

  /** KStream⋈KStream inner interval join
    * (`kstream/internals/KStreamKStreamJoin.java:86-100`): matches when
    * `other.ts ∈ [ts - before, ts + after]`. Streaming: both sides need
    * grace (watermark); Spark plans a stream-stream interval join. */
  def join[VO: Encoder, VR: Encoder](other: KStream[K, VO], windows: JoinWindows)(
      joiner: (V, VO) => VR): KStream[K, VR] = {
    val (l, r) = sides(other)
    val lw = withGraceOn(l, "l_ts", windows.graceMs)
    val rw = withGraceOn(r, "r_ts", windows.graceMs)
    val joined = lw.join(rw, intervalCond(windows))
      .select(col(KeyCol).as("_1"), col("l_value").as("_2"), col("r_value").as("_3"),
        col("l_ts").as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, implicitly[Encoder[VO]], Encoders.TIMESTAMP))
    new KStream[K, VR](fromTyped(joined.map(r4 => (r4._1, joiner(r4._2, r4._3), r4._4))(
      tupleEnc[K, VR])))
  }

  /** Left interval join: unmatched left records emit `joiner(v, None)`.
    * Native left-outer interval join (streaming-capable with grace on both
    * sides); emission timing is watermark-final rather than the
    * reference's eager spurious-null (`KStreamKStreamJoin.java:97-99`) —
    * set equivalence, documented divergence (SURVEY.md §7.4). */
  def leftJoin[VO: Encoder, VR: Encoder](other: KStream[K, VO], windows: JoinWindows)(
      joiner: (V, Option[VO]) => VR): KStream[K, VR] = {
    val (l, r) = sides(other)
    val lw = withGraceOn(l, "l_ts", windows.graceMs)
    val rw = withGraceOn(r, "r_ts", windows.graceMs)
    // Option encoder decodes the nullable unmatched side directly
    val joined = lw.join(rw, intervalCond(windows), "left_outer")
      .select(col(KeyCol).as("_1"), col("l_value").as("_2"), col("r_value").as("_3"),
        col("l_ts").as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, optionEnc[VO], Encoders.TIMESTAMP))
    new KStream[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])))
  }

  /** Full outer interval join (`KStream.java:1527` outerJoin): unmatched
    * records from either side emit with the other side None. Native
    * full-outer interval join; same watermark-final emission caveat as
    * [[leftJoin]]. */
  def outerJoin[VO: Encoder, VR: Encoder](other: KStream[K, VO], windows: JoinWindows)(
      joiner: (Option[V], Option[VO]) => VR): KStream[K, VR] = {
    val (l, r) = sides(other)
    val lw = withGraceOn(l, "l_ts", windows.graceMs)
    val rw = withGraceOn(r, "r_ts", windows.graceMs)
    val joined = lw.join(rw, intervalCond(windows), "full_outer")
      .select(coalesce(col(KeyCol), col("r_key")).as("_1"), col("l_value").as("_2"),
        col("r_value").as("_3"), coalesce(col("l_ts"), col("r_ts")).as("_4"))
      .as(Encoders.tuple(kEnc, optionEnc[V], optionEnc[VO], Encoders.TIMESTAMP))
    new KStream[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])))
  }

  private def intervalCond(windows: JoinWindows): Column =
    col(KeyCol) === col("r_key") &&
      col("r_ts") >= col("l_ts") - expr(s"INTERVAL ${windows.beforeMs} MILLISECONDS") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL ${windows.afterMs} MILLISECONDS")

  /** KStream⋈KTable temporal lookup join
    * (`kstream/internals/KStreamKTableJoinProcessor.java:55-76`): each
    * stream record sees the table's current value for its key; no output
    * on table updates. Batch: joins the table's final view; streaming
    * against a static table: stream-static join per micro-batch; streaming
    * against a LIVE changelog table: stateful lookup join
    * (`graft.streaming.StreamingTableJoin.streamTableJoin`). */
  def joinTable[VT: Encoder, VR: Encoder](table: KTable[K, VT])(
      joiner: (V, VT) => VR): KStream[K, VR] = {
    if (df.isStreaming && table.df.isStreaming)
      return new KStream[K, VR](fromTyped(
        graft.streaming.StreamingTableJoin.streamTableJoin(
          new KStream[K, V](droppingNulls), table, inner = true)(
          (v, t) => joiner(v, t.get))))
    val t = table.latestDF.select(col(KeyCol).as("t_key"), col(ValueCol).as("t_value"))
    val joined = droppingNulls.join(t, col(KeyCol) === col("t_key"))
      .select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col("t_value").as("_3"),
        col(TsCol).as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, implicitly[Encoder[VT]], Encoders.TIMESTAMP))
    new KStream[K, VR](fromTyped(joined.map(r4 => (r4._1, joiner(r4._2, r4._3), r4._4))(
      tupleEnc[K, VR])))
  }

  /** Left variant: misses emit `joiner(v, None)` — single left-outer pass
    * with Option-decoded table side. */
  def leftJoinTable[VT: Encoder, VR: Encoder](table: KTable[K, VT])(
      joiner: (V, Option[VT]) => VR): KStream[K, VR] = {
    if (df.isStreaming && table.df.isStreaming)
      return new KStream[K, VR](fromTyped(
        graft.streaming.StreamingTableJoin.streamTableJoin(
          new KStream[K, V](droppingNulls), table, inner = false)(joiner)))
    val t = table.latestDF.select(col(KeyCol).as("t_key"), col(ValueCol).as("t_value"))
    val joined = droppingNulls.join(t, col(KeyCol) === col("t_key"), "left_outer")
      .select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col("t_value").as("_3"),
        col(TsCol).as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, optionEnc[VT], Encoders.TIMESTAMP))
    new KStream[K, VR](fromTyped(joined.map(t4 => (t4._1, joiner(t4._2, t4._3), t4._4))(
      tupleEnc[K, VR])))
  }

  /** KStream⋈GlobalKTable lookup join with arbitrary key mapper
    * (`kstream/internals/KStreamGlobalKTableJoin.java`): the global table
    * is broadcast — no shuffle of the stream, the 100 TB-safe dimension
    * join. */
  def joinGlobal[GK: Encoder, GV: Encoder, VR: Encoder](global: GlobalKTable[GK, GV])(
      keyMapper: (K, V) => GK)(joiner: (V, GV) => VR): KStream[K, VR] = {
    val keyed = fromTyped(toTyped[K, V](droppingNulls)
      .map(r => ((r._1, r._2, r._3), keyMapper(r._1, r._2), r._3))(
      Encoders.tuple(t3, implicitly[Encoder[GK]], Encoders.TIMESTAMP)))
      .toDF("rec", "gk", "gts")
    val g = global.df.select(col(KeyCol).as("g_key"), col(ValueCol).as("g_value"))
    val joined = keyed.join(broadcast(g), col("gk") === col("g_key"))
      .select(col("rec").as("_1"), col("g_value").as("_2"))
      .as(Encoders.tuple(t3, implicitly[Encoder[GV]]))
    new KStream[K, VR](fromTyped(joined.map { case (rec, gv) =>
      (rec._1, joiner(rec._2, gv), rec._3)
    }(tupleEnc[K, VR])))
  }

  def leftJoinGlobal[GK: Encoder, GV: Encoder, VR: Encoder](global: GlobalKTable[GK, GV])(
      keyMapper: (K, V) => GK)(joiner: (V, Option[GV]) => VR): KStream[K, VR] = {
    val keyed = fromTyped(toTyped[K, V](droppingNulls)
      .map(r => ((r._1, r._2, r._3), keyMapper(r._1, r._2), r._3))(
      Encoders.tuple(t3, implicitly[Encoder[GK]], Encoders.TIMESTAMP)))
      .toDF("rec", "gk", "gts")
    val g = global.df.select(col(KeyCol).as("g_key"), col(ValueCol).as("g_value"))
    val joined = keyed.join(broadcast(g), col("gk") === col("g_key"), "left_outer")
      .select(col("rec").as("_1"), col("g_value").as("_2"))
      .as(Encoders.tuple(t3, optionEnc[GV]))
    new KStream[K, VR](fromTyped(joined.map { case (rec, gv) =>
      (rec._1, joiner(rec._2, gv), rec._3)
    }(tupleEnc[K, VR])))
  }

  // ------------------------------------------------- tables & sinks

  /** Treat this stream as a changelog and materialize the latest-per-key
    * table view (`StreamsBuilder.table` / `KTableSource.java`). */
  def toTable: KTable[K, V] = new KTable[K, V](df, deduped = false)

  /** `KStream.to` — terminal write. Batch: parquet at `path`. */
  def toParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)

  /** `KStream.foreach` (terminal peek, `KStreamImpl.java:358`) — runs
    * per-record on the executors, like the reference's terminal processor;
    * the action must be serializable and side-effect executor-locally. */
  def foreach(action: (K, V) => Unit): Unit =
    typed.foreach(r => action(r._1, r._2))

  /** `KStream.print` — console sink analogue. */
  def print(): Unit = df.show(20, truncate = false)

  /** `Topology.describe()` (`Topology.java:767`): the topology IS the
    * Catalyst logical plan here — print it. */
  def describe(): String = df.queryExecution.logical.treeString

  /** Named observable metrics over the stream — the reference's
    * per-processor metrics surface (`late-record-drop`, process-rate …):
    * batch queries surface them via QueryExecutionListener, streaming via
    * `StreamingQueryProgress.observedMetrics`. */
  def observe(name: String, exprs: (String, Column)*): KStream[K, V] =
    new KStream[K, V](df.observe(name,
      exprs.head._2.as(exprs.head._1), exprs.tail.map { case (n, c) => c.as(n) }: _*))

  /** At-least-once source/sink dedup: drop records with a duplicate id
    * seen within the watermark window — the standard mitigation for the
    * Kafka sink's at-least-once delivery (state is bounded by the
    * watermark, unlike full-history dropDuplicates). */
  def dedupWithinGrace(idCols: Seq[String], graceMs: Long): KStream[K, V] =
    new KStream[K, V](
      if (df.isStreaming)
        withGrace(df, graceMs).dropDuplicatesWithinWatermark(idCols)
      else df.dropDuplicates(idCols))

  /** Typed view for tests and interop. */
  def toDataset: Dataset[(K, V, Timestamp)] = typed

  /** Columnar view (key, value, ts). */
  def toDF: DataFrame = df

  private def withGraceOn(d: DataFrame, tsCol: String, graceMs: Long): DataFrame =
    if (d.isStreaming) d.withWatermark(tsCol, s"$graceMs milliseconds") else d
}
