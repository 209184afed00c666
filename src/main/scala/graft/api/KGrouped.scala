package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import Rec._

/** `KGroupedStream` (`kstream/KGroupedStream.java`): aggregation entry
  * point after `groupByKey`/`groupBy`. All aggregations are incremental
  * hash aggregations (SURVEY.md §2.4); Spark adds map-side partial
  * aggregation on top — strictly less shuffle than the reference's
  * repartition-then-fold.
  *
  * Divergence: the reference folds strictly in per-partition log order;
  * Spark's partial aggregation requires a `merge` — aggregate() therefore
  * takes a Merger-style combine like sessions do
  * (`kstream/Merger.java`), and non-mergeable folds belong in
  * `flatMapGroupsWithState`.
  */
final class KGroupedStream[K, V] private[graft] (private[graft] val df: DataFrame)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private implicit def t3: Encoder[(K, V, Timestamp)] = tupleEnc[K, V]
  private def typed = toTyped[K, V](df)

  /** `KGroupedStream.count` (`kstream/internals/KStreamAggregate.java`):
    * codegen'd columnar count, table timestamp = max event time. */
  def count(): KTable[K, Long] = {
    val out = df.groupBy(col(KeyCol))
      .agg(F.count(lit(1)).as(ValueCol), max(col(TsCol)).as(TsCol))
    new KTable[K, Long](out, deduped = true)(kEnc, Encoders.scalaLong)
  }

  /** `KGroupedStream.reduce` (`kstream/internals/KStreamReduce.java`). */
  def reduce(reducer: (V, V) => V): KTable[K, V] =
    aggregateInternal[V](None)(
      (agg, v) => agg.map(reducer(_, v)).orElse(Some(v)),
      (a, b) => (a, b) match {
        case (Some(x), Some(y)) => Some(reducer(x, y))
        case _ => a.orElse(b)
      })(vEnc)

  /** `KGroupedStream.aggregate(Initializer, Aggregator)` + Merger
    * (`kstream/KGroupedStream.java:240`). */
  def aggregate[VA: Encoder](initializer: => VA)(
      aggregator: (K, V, VA) => VA, merger: (VA, VA) => VA): KTable[K, VA] = {
    val typedAgg = new FoldAggregator[K, V, VA](
      () => initializer, aggregator, merger, implicitly[Encoder[VA]])
    val out = typed.groupByKey(_._1)
      .agg(typedAgg.toColumn.name("agg"))
      .select(col("key").as(KeyCol), col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[K, VA](out, deduped = true)
  }

  private def aggregateInternal[VA](init: => Option[VA])(
      add: (Option[VA], V) => Option[VA],
      combine: (Option[VA], Option[VA]) => Option[VA])(
      implicit vaEnc: Encoder[VA]): KTable[K, VA] = {
    val typedAgg = new OptFoldAggregator[K, V, VA](add, combine, vaEnc)
    val out = typed.groupByKey(_._1)
      .agg(typedAgg.toColumn.name("agg"))
      .select(col("key").as(KeyCol), col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[K, VA](out, deduped = true)
  }

  /** Per-key fold strictly in event-time order — the reference's
    * per-partition log-order fold (`StreamTask.process` pops records in
    * timestamp order, `PartitionGroup.java:92-123`), for aggregators that
    * are not merge-commutative. Materializes each group in memory; use
    * only where groups are bounded (batch parity path — streaming
    * non-commutative folds belong in flatMapGroupsWithState). */
  def aggregateOrdered[VA: Encoder](initializer: => VA)(
      aggregator: (K, V, VA) => VA): KTable[K, VA] = {
    implicit val outEnc: Encoder[(K, VA, Timestamp)] =
      Encoders.tuple(kEnc, implicitly[Encoder[VA]], Encoders.TIMESTAMP)
    // stage locals so the task closure captures only the user functions
    val init: () => VA = () => initializer
    val aggFn = aggregator
    val out = typed.groupByKey(_._1)
      .mapGroups { (k: K, it: Iterator[(K, V, Timestamp)]) =>
        val rows = it.toArray.sortBy(_._3.getTime)
        var acc = init()
        rows.foreach(r => acc = aggFn(k, r._2, acc))
        (k, acc, rows.last._3)
      }
    new KTable[K, VA](out.toDF(KeyCol, ValueCol, TsCol), deduped = true)
  }

  /** Columnar aggregation fast path: arbitrary Spark SQL aggregate
    * expressions over the value column; stays fully codegen'd. */
  def aggExpr(exprs: (String, Column)*): DataFrame =
    df.groupBy(col(KeyCol)).agg(
      exprs.head._2.as(exprs.head._1),
      exprs.tail.map { case (n, c) => c.as(n) }: _*)

  /** `KGroupedStream.cogroup(aggregator)` — start a multi-stream cogroup
    * (KIP-150, Kafka 2.5); see [[CogroupedKStream]]. */
  def cogroup[VA](aggregator: (K, V, VA) => VA): CogroupedKStream[K, VA] =
    new CogroupedKStream[K, VA](Seq(CogroupedKStream.entry(df, aggregator)))

  /** `windowedBy(TimeWindows)` (`kstream/TimeWindowedKStream.java`). */
  def windowedBy(w: TimeWindows): TimeWindowedKStream[K, V] =
    new TimeWindowedKStream[K, V](df, w)

  /** `windowedBy(SessionWindows)` (`kstream/SessionWindowedKStream.java`). */
  def windowedBy(w: SessionWindows): SessionWindowedKStream[K, V] =
    new SessionWindowedKStream[K, V](df, w)

  /** `windowedBy(SlidingWindows)` (`kstream/SlidingWindowedKStream.java`). */
  def windowedBy(w: SlidingWindows): SlidingWindowedKStream[K, V] =
    new SlidingWindowedKStream[K, V](df, w)

  private def maxTs(a: Timestamp, b: Timestamp): Timestamp =
    if (a == null) b else if (b == null) a else if (a.after(b)) a else b
}

/** Tumbling/hopping windowed aggregation
  * (`kstream/internals/KStreamWindowAggregate.java`): records are assigned
  * their window(s), the window becomes part of the key, and the grouped
  * aggregation machinery is reused — hopping windows explode to
  * size/advance rows exactly like `Windows.windowsFor`
  * (`kstream/TimeWindows.java:176-186`). */
final class TimeWindowedKStream[K, V] private[graft] (
    df: DataFrame, w: TimeWindows)(implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private implicit def t3: Encoder[(K, V, Timestamp)] = tupleEnc[K, V]

  // IMPORTANT: grouping must use the native window() column — its
  // event-time metadata is what drives watermark state eviction and
  // late-record dropping; re-wrapping start/end into a plain struct before
  // the aggregation would silently disable both.
  private def rewrap(aggregated: DataFrame, valueCol: String, tsCol: String): DataFrame =
    aggregated.select(
      struct(col(KeyCol).as("key"), col("gw.start").as("start"), col("gw.end").as("end"))
        .as(KeyCol),
      col(valueCol).as(ValueCol), col(tsCol).as(TsCol))

  def count()(implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], Long] = {
    val out = withGrace(df, w.graceMs)
      .groupBy(window(col(TsCol), w.sizeExpr, w.slideExpr).as("gw"), col(KeyCol))
      .agg(F.count(lit(1)).as(ValueCol), max(col(TsCol)).as(TsCol))
    new KTable[Windowed[K], Long](rewrap(out, ValueCol, TsCol), deduped = true)(
      wEnc, Encoders.scalaLong)
  }

  def reduce(reducer: (V, V) => V)(
      implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], V] = {
    val agg = new OptFoldAggregator[K, V, V](
      (b, v) => b.map(reducer(_, v)).orElse(Some(v)),
      (a, b) => (a, b) match {
        case (Some(x), Some(y)) => Some(reducer(x, y))
        case _ => a.orElse(b)
      }, vEnc)
    aggWith(agg)
  }

  def aggregate[VA: Encoder](initializer: => VA)(
      aggregator: (K, V, VA) => VA, merger: (VA, VA) => VA)(
      implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], VA] =
    aggWith(new FoldAggregator[K, V, VA](
      () => initializer, aggregator, merger, implicitly[Encoder[VA]]))

  private def aggWith[BUF, VA](
      agg: org.apache.spark.sql.expressions.Aggregator[(K, V, Timestamp), BUF, (VA, Timestamp)])(
      implicit wEnc: Encoder[Windowed[K]], vaEnc: Encoder[VA]): KTable[Windowed[K], VA] = {
    val rowAgg = new RowFoldAdapter[K, V, BUF, (VA, Timestamp)](agg, kEnc, vEnc)
    val out = toTyped[K, V](withGrace(df, w.graceMs))
      .groupBy(window(col("_3"), w.sizeExpr, w.slideExpr).as("gw"), col("_1").as(KeyCol))
      .agg(rowAgg.toColumn.name("agg"))
      .select(
        struct(col(KeyCol).as("key"), col("gw.start").as("start"), col("gw.end").as("end"))
          .as(KeyCol),
        col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[Windowed[K], VA](out, deduped = true)
  }
}

/** Per-record sliding-window aggregation
  * (`kstream/internals/KStreamSlidingWindowAggregate.java:141-239`): the
  * final table holds, per key, one window ending at each record timestamp
  * (`createWindows` left window) plus each non-empty window opening just
  * after a record (right window, `:196-214`), aggregated over the records
  * inside.
  *
  * Spark-first shape: both window families are RANGE frames over the
  * per-key timestamp order — one shuffle on the key, one sort, zero
  * self-joins — then a `dropDuplicates` on (key, window end) removes
  * right-windows that coincide with another record's left window exactly
  * as the reference's store dedups by window start. Batch analytics path;
  * RANGE frames are unsupported over unbounded streams, so the streaming
  * twin is hopping windows or a flatMapGroupsWithState fold. */
final class SlidingWindowedKStream[K, V] private[graft] (
    df: DataFrame, w: SlidingWindows)(implicit kEnc: Encoder[K], vEnc: Encoder[V]) {
  import org.apache.spark.sql.expressions.Window

  require(!df.isStreaming,
    "sliding windows are a batch analytics path; use hopping windows or " +
      "flatMapGroupsWithState for streaming")

  private val sizeUs = w.sizeMs * 1000L

  /** Both window families with an arbitrary columnar aggregate over the
    * value column, evaluated on each frame.
    *
    * Both frames share the partition and sort, so Catalyst plans ONE
    * WindowExec: one shuffle on the key, one sort, one buffered pass
    * evaluating both frames — then a 1→2 generator emits (window end,
    * aggregate) pairs and the by-end dedup drops right windows that
    * coincide with a later record's left window. */
  def aggExpr(name: String, agg: Column => Column): DataFrame = {
    require(name != "n" && name != "end_us" && name != "max_ts_us",
      s"aggregate name '$name' collides with an internal column")
    val base = df.withColumn("ts_us", unix_micros(col(TsCol)))
    val byKey = Window.partitionBy(col(KeyCol)).orderBy(col("ts_us"))
    // left window (t-size, t]: the trailing frame ending at this record
    val leftF = byKey.rangeBetween(-(sizeUs - 1), 0)
    // right window (t, t+size]: opens just after this record; non-empty only
    val rightF = byKey.rangeBetween(1, sizeUs)
    // window expressions must resolve in a plain Project (the analyzer
    // cannot lift them out of a generator) — evaluate both frames first,
    // then explode the two (end, aggregate) candidates per record
    val evaluated = base.select(col(KeyCol), col("ts_us"),
      agg(col(ValueCol)).over(leftF).as("agg_l"),
      F.count(lit(1)).over(leftF).as("n_l"),
      max(col("ts_us")).over(leftF).as("max_l"),
      agg(col(ValueCol)).over(rightF).as("agg_r"),
      F.count(lit(1)).over(rightF).as("n_r"),
      max(col("ts_us")).over(rightF).as("max_r"))
    evaluated.select(col(KeyCol), explode(array(
        struct(col("ts_us").as("end_us"), col("agg_l").as(name),
          col("n_l").as("n"), col("max_l").as("max_ts_us")),
        struct((col("ts_us") + sizeUs).as("end_us"), col("agg_r").as(name),
          col("n_r").as("n"), col("max_r").as("max_ts_us")))).as("w"))
      .filter(col("w.n") > 0)
      .select(col(KeyCol), col("w.end_us").as("end_us"),
        col(s"w.$name").as(name), col("w.max_ts_us").as("max_ts_us"))
      .dropDuplicates(KeyCol, "end_us")
      .select(col(KeyCol),
        timestamp_micros(col("end_us") - sizeUs).as("window_start"),
        timestamp_micros(col("end_us")).as("window_end"),
        col(name), timestamp_micros(col("max_ts_us")).as(TsCol))
  }

  def count()(implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], Long] = {
    val out = aggExpr("cnt", v => F.count(lit(1)))
    val keyed = out.select(
      struct(col(KeyCol).as("key"), col("window_start").as("start"),
        col("window_end").as("end")).as(KeyCol),
      col("cnt").as(ValueCol), col(TsCol))
    new KTable[Windowed[K], Long](keyed, deduped = true)(wEnc, Encoders.scalaLong)
  }
}

/** Session-windowed aggregation
  * (`kstream/internals/KStreamSessionWindowAggregate.java:99-178`):
  * sessions within the inactivity gap merge; Spark's `session_window`
  * performs the same merge, and custom aggregates ride on the built-in
  * machinery (the session `Merger` becomes the aggregate's combine). */
final class SessionWindowedKStream[K, V] private[graft] (
    df: DataFrame, w: SessionWindows)(implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  def count()(implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], Long] = {
    val out = withGrace(df, w.graceMs)
      .groupBy(session_window(col(TsCol), w.gapExpr).as("sw"), col(KeyCol))
      .agg(F.count(lit(1)).as(ValueCol), max(col(TsCol)).as(TsCol))
      .select(
        struct(col(KeyCol).as("key"), col("sw.start").as("start"), col("sw.end").as("end"))
          .as(KeyCol),
        col(ValueCol), col(TsCol))
    new KTable[Windowed[K], Long](out, deduped = true)(wEnc, Encoders.scalaLong)
  }

  /** Columnar session aggregation (count/sum/min/max/...). */
  def aggExpr(exprs: (String, Column)*)(
      implicit wEnc: Encoder[Windowed[K]]): DataFrame =
    withGrace(df, w.graceMs)
      .groupBy(session_window(col(TsCol), w.gapExpr).as("sw"), col(KeyCol))
      .agg(exprs.head._2.as(exprs.head._1), exprs.tail.map { case (n, c) => c.as(n) }: _*)

  /** Typed session reduce — Spark's session aggregation performs the
    * window merging; the reducer doubles as the session `Merger`
    * (`kstream/Merger.java`). */
  def reduce(reducer: (V, V) => V)(
      implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], V] =
    aggWith(new OptFoldAggregator[K, V, V](
      (b, v) => b.map(reducer(_, v)).orElse(Some(v)),
      (a, b) => (a, b) match {
        case (Some(x), Some(y)) => Some(reducer(x, y))
        case _ => a.orElse(b)
      }, vEnc))

  /** Typed session aggregate with explicit Merger
    * (`SessionWindowedKStream.aggregate(Initializer, Aggregator, Merger)`,
    * `kstream/SessionWindowedKStream.java:232`). */
  def aggregate[VA: Encoder](initializer: => VA)(
      aggregator: (K, V, VA) => VA, merger: (VA, VA) => VA)(
      implicit wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], VA] =
    aggWith(new FoldAggregator[K, V, VA](
      () => initializer, aggregator, merger, implicitly[Encoder[VA]]))

  private def aggWith[BUF, VA](
      agg: org.apache.spark.sql.expressions.Aggregator[(K, V, Timestamp), BUF, (VA, Timestamp)])(
      implicit wEnc: Encoder[Windowed[K]], vaEnc: Encoder[VA]): KTable[Windowed[K], VA] = {
    val rowAgg = new RowFoldAdapter[K, V, BUF, (VA, Timestamp)](agg, kEnc, vEnc)
    val out = toTyped[K, V](withGrace(df, w.graceMs))
      .groupBy(session_window(col("_3"), w.gapExpr).as("sw"), col("_1").as(KeyCol))
      .agg(rowAgg.toColumn.name("agg"))
      .select(
        struct(col(KeyCol).as("key"), col("sw.start").as("start"), col("sw.end").as("end"))
          .as(KeyCol),
        col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[Windowed[K], VA](out, deduped = true)
  }
}
