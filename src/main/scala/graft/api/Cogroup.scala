package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

import Rec._

/** `CogroupedKStream` — Kafka 2.5's KIP-150 cogroup (the release line
  * right after the reference's 2.2, same lineage as our SlidingWindows
  * and foreign-key join parity-plus): several co-grouped streams fold
  * into ONE accumulator per key, each stream applying its OWN aggregator,
  * in record order. Replaces the N-way outer-join-of-aggregates topology
  * the reference era required (one state store instead of N + join
  * stores).
  *
  * Spark-first shape: the sides union into one keyed stream (each side's
  * value riding a nullable slot of the union schema — no serialization,
  * no common supertype), then ONE per-key fold applies the slot's
  * aggregator in event-time order. One shuffle total, like the
  * reference's single repartition topic; the fold is the
  * `aggregateOrdered` log-order path since per-stream aggregators need
  * not be merge-commutative (batch parity path — a streaming cogroup
  * rides `StatefulOps.flatTransformWithState`).
  */
final class CogroupedKStream[K, VA] private[graft] (
    entries: Seq[(DataFrame, (K, Any, VA) => VA)])(implicit kEnc: Encoder[K]) {

  /** `CogroupedKStream.cogroup(other, aggregator)` — add another grouped
    * stream with its own aggregator over the shared accumulator. */
  def cogroup[V2](other: KGroupedStream[K, V2])(aggregator: (K, V2, VA) => VA)(
      implicit v2Enc: Encoder[V2]): CogroupedKStream[K, VA] =
    new CogroupedKStream[K, VA](entries :+ CogroupedKStream.entry(other.df, aggregator))

  /** `CogroupedKStream.aggregate(Initializer)` — the shared fold. Records
    * from every side apply in event-time order (ties: side order, the
    * deterministic stand-in for the reference's offset order). Streaming
    * sides take the live incremental path ([[aggregateUpdates]]). */
  def aggregate(initializer: => VA)(implicit vaEnc: Encoder[VA]): KTable[K, VA] = {
    val all = union()
    val kConv = new LazyConv[K](kEnc)
    val folds = entries.map(_._2)
    val init: () => VA = () => initializer
    implicit val outEnc: Encoder[(K, VA, Timestamp)] =
      Encoders.tuple(kEnc, vaEnc, Encoders.TIMESTAMP)

    // streaming: the table IS an update stream (one refreshed row per
    // updated key per micro-batch — KTable changelog semantics; sinks
    // upsert by key, e.g. GraftSinks.upsertParquet). A downstream
    // latest-per-key re-aggregation would be illegal after the update-mode
    // stateful fold, so the df stays the raw update stream (deduped);
    // sinks needing the guaranteed-final row under exact ts ties use
    // [[aggregateUpdates]] and pick max-seq per key.
    if (all.isStreaming)
      return new KTable[K, VA](
        aggregateUpdates(initializer).toDF(KeyCol, ValueCol, TsCol, "seq")
          .drop("seq"), deduped = true)

    val out = all.groupByKey(row => kConv(row.get(0)))
      .mapGroups { (k, it) =>
        val rows = CogroupedKStream.sortedByTs(it)
        var acc = init()
        rows.foreach(r => acc = CogroupedKStream.applyRow(folds, k, r, acc))
        (k, acc, rows.last.getAs[Timestamp](1))
      }
    new KTable[K, VA](out.toDF(KeyCol, ValueCol, TsCol), deduped = true)
  }

  /** Live incremental fold: the accumulator IS the state — records fold
    * in as they arrive (the reference's per-record processing), one
    * refreshed emission per updated key per micro-batch (cache-flush
    * cadence). The monotone per-key `seq` lets sinks pick the final
    * emission deterministically even under ts ties across batches. */
  def aggregateUpdates(initializer: => VA)(
      implicit vaEnc: Encoder[VA]): org.apache.spark.sql.Dataset[(K, VA, Timestamp, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val all = union()
    val kConv = new LazyConv[K](kEnc)
    val folds = entries.map(_._2)
    val init: () => VA = () => initializer
    implicit val stateEnc: Encoder[(VA, Timestamp, Long)] =
      Encoders.tuple(vaEnc, Encoders.TIMESTAMP, Encoders.scalaLong)
    implicit val liveOutEnc: Encoder[(K, VA, Timestamp, Long)] =
      Encoders.tuple(kEnc, vaEnc, Encoders.TIMESTAMP, Encoders.scalaLong)
    all.groupByKey(row => kConv(row.get(0)))
      .flatMapGroupsWithState[(VA, Timestamp, Long), (K, VA, Timestamp, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, rows, state) =>
        var (acc, maxTs, seq) =
          state.getOption.getOrElse((init(), null: Timestamp, 0L))
        CogroupedKStream.sortedByTs(rows).foreach { r =>
          acc = CogroupedKStream.applyRow(folds, k, r, acc)
          maxTs = GroupAggs.maxTs(maxTs, r.getAs[Timestamp](1))
        }
        seq += 1
        state.update((acc, maxTs, seq))
        Iterator.single((k, acc, maxTs, seq))
      }
  }

  private def union(): DataFrame = CogroupedKStream.union(entries)

  /** `CogroupedKStream.windowedBy(TimeWindows)` —
    * `TimeWindowedCogroupedKStream`: the shared fold per (key, window). */
  def windowedBy(w: TimeWindows): TimeWindowedCogroup[K, VA] =
    new TimeWindowedCogroup[K, VA](entries, w)

  /** `CogroupedKStream.windowedBy(SessionWindows)` —
    * `SessionWindowedCogroupedKStream`: the shared fold per merged
    * session; session merging requires the Merger at aggregate time. */
  def windowedBy(w: SessionWindows): SessionWindowedCogroup[K, VA] =
    new SessionWindowedCogroup[K, VA](entries, w)
}

/** `TimeWindowedCogroupedKStream` (KIP-150): cogroup fold scoped to
  * tumbling/hopping windows — the window joins the key exactly like
  * `TimeWindowedKStream`, the fold machinery is the cogroup's. Batch
  * parity path (the ordered fold is not merge-commutative); a streaming
  * windowed cogroup rides `aggregateUpdates` with a window-bucketed key. */
final class TimeWindowedCogroup[K, VA] private[graft] (
    entries: Seq[(DataFrame, (K, Any, VA) => VA)], w: TimeWindows)(
    implicit kEnc: Encoder[K]) {
  import org.apache.spark.sql.Row

  def aggregate(initializer: => VA)(
      implicit vaEnc: Encoder[VA], wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], VA] = {
    // window() expands hopping windows (one row per covering window) in
    // the Project, so the per-(key, window) fold sees every record
    val all = withGrace(CogroupedKStream.union(entries), w.graceMs)
      .withColumn("gw", window(col(TsCol), w.sizeExpr, w.slideExpr))
    val kConv = new LazyConv[K](kEnc)
    val folds = entries.map(_._2)
    val init: () => VA = () => initializer
    val sizeMs = w.sizeMs
    implicit val gkEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val outEnc: Encoder[(Windowed[K], VA, Timestamp)] =
      Encoders.tuple(wEnc, vaEnc, Encoders.TIMESTAMP)
    val out = all.groupByKey { row =>
      (kConv(row.get(0)), row.getAs[Row]("gw").getAs[Timestamp]("start").getTime)
    }.mapGroups { (gk, it) =>
      val rows = CogroupedKStream.sortedByTs(it)
      var acc = init()
      rows.foreach(r => acc = CogroupedKStream.applyRow(folds, gk._1, r, acc))
      (Windowed(gk._1, new Timestamp(gk._2), new Timestamp(gk._2 + sizeMs)),
        acc, rows.last.getAs[Timestamp](1))
    }
    new KTable[Windowed[K], VA](out.toDF(KeyCol, ValueCol, TsCol), deduped = true)
  }

  /** Live incremental windowed fold — the streaming twin of [[aggregate]]
    * (accumulator-as-state per (key, window), one refreshed emission per
    * updated window per micro-batch; monotone per-window `seq` for
    * deterministic final-pick at the sink, as in
    * `CogroupedKStream.aggregateUpdates`). */
  def aggregateUpdates(initializer: => VA)(
      implicit vaEnc: Encoder[VA], wEnc: Encoder[Windowed[K]]):
      org.apache.spark.sql.Dataset[(Windowed[K], VA, Timestamp, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(entries.exists(_._1.isStreaming),
      "aggregateUpdates is the live incremental path (event-time state " +
        "eviction needs a watermark); use aggregate for batch")
    // assign covering windows arithmetically (TimeWindows.windowsFor):
    // window() would add a second event-time column next to the
    // watermarked ts, which stateful ops reject
    val advUs = w.advanceMs * 1000L
    val sizeUs = w.sizeMs * 1000L
    val nWin = (sizeUs - 1) / advUs + 1
    val base = withGrace(CogroupedKStream.union(entries), w.graceMs)
    val sMax = expr(s"unix_micros($TsCol) - pmod(unix_micros($TsCol), $advUs)")
    val all = base
      .withColumn("wstart_us",
        explode(sequence(sMax - lit((nWin - 1) * advUs), sMax, lit(advUs))))
      .filter(col("wstart_us") + sizeUs > expr(s"unix_micros($TsCol)"))
    val kConv = new LazyConv[K](kEnc)
    val folds = entries.map(_._2)
    val init: () => VA = () => initializer
    val sizeMs = w.sizeMs
    implicit val gkEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val stateEnc: Encoder[(VA, Timestamp, Long)] =
      Encoders.tuple(vaEnc, Encoders.TIMESTAMP, Encoders.scalaLong)
    implicit val outEnc: Encoder[(Windowed[K], VA, Timestamp, Long)] =
      Encoders.tuple(wEnc, vaEnc, Encoders.TIMESTAMP, Encoders.scalaLong)
    val graceMs = w.graceMs
    all.groupByKey { row =>
      // wstart_us rides as the LAST column of the exploded row
      (kConv(row.get(0)), row.getLong(row.length - 1) / 1000L)
    }.flatMapGroupsWithState[(VA, Timestamp, Long), (Windowed[K], VA, Timestamp, Long)](
      OutputMode.Update, GroupStateTimeout.EventTimeTimeout) { (gk, rows, state) =>
      // per-(key, window) state is evicted once the watermark passes the
      // window end + grace (the reference's windowed-store retention);
      // without the timeout a long-running stream accumulates one state
      // row per closed window forever
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val windowEndMs = gk._2 + sizeMs
        val wm = state.getCurrentWatermarkMs()
        if (windowEndMs + graceMs <= wm) {
          // window already closed: late records are DROPPED
          // (KStreamWindowAggregate's observedStreamTime check) even when
          // the state hasn't timed out yet — folding them would re-emit a
          // closed window; eviction follows via the pending timeout
          Iterator.empty
        } else {
          var (acc, maxTs, seq) = state.getOption.getOrElse((init(), null: Timestamp, 0L))
          CogroupedKStream.sortedByTs(rows).foreach { r =>
            acc = CogroupedKStream.applyRow(folds, gk._1, r, acc)
            maxTs = GroupAggs.maxTs(maxTs, r.getAs[Timestamp](1))
          }
          seq += 1
          state.update((acc, maxTs, seq))
          state.setTimeoutTimestamp(math.max(windowEndMs + graceMs, wm + 1))
          Iterator.single((Windowed(gk._1, new Timestamp(gk._2),
            new Timestamp(gk._2 + sizeMs)), acc, maxTs, seq))
        }
      }
    }
  }
}

/** `SessionWindowedCogroupedKStream` (KIP-150): cogroup fold per merged
  * session — Spark's `session_window` performs the session merging, the
  * `Merger` combines the merged sessions' accumulators (the same
  * Initializer+Aggregator+Merger contract as
  * `SessionWindowedKStream.aggregate`). Rides the relational session
  * grouping, so watermark eviction works when the sides are streams. */
final class SessionWindowedCogroup[K, VA] private[graft] (
    entries: Seq[(DataFrame, (K, Any, VA) => VA)], w: SessionWindows)(
    implicit kEnc: Encoder[K]) {

  def aggregate(initializer: => VA)(merger: (VA, VA) => VA)(
      implicit vaEnc: Encoder[VA], wEnc: Encoder[Windowed[K]]): KTable[Windowed[K], VA] = {
    val all = withGrace(CogroupedKStream.union(entries), w.graceMs)
    val agg = new CogroupSessionAggregator[K, VA](
      () => initializer, entries.map(_._2), merger, new LazyConv[K](kEnc), vaEnc)
    val out = all
      .groupBy(session_window(col(TsCol), w.gapExpr).as("sw"), col(KeyCol))
      .agg(agg.toColumn.name("agg"))
      .select(
        struct(col(KeyCol).as("key"), col("sw.start").as("start"), col("sw.end").as("end"))
          .as(KeyCol),
        col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[Windowed[K], VA](out, deduped = true)
  }
}

/** Row-input cogroup fold for the session path: dispatches each record to
  * its side's aggregator by the src tag; merge is the session Merger.
  * Row layout: (key, ts, src, v0..vn). */
private[graft] final class CogroupSessionAggregator[K, VA](
    init: () => VA, folds: Seq[(K, Any, VA) => VA], merger: (VA, VA) => VA,
    kConv: LazyConv[K], vaEnc: Encoder[VA])
    extends org.apache.spark.sql.expressions.Aggregator[
      org.apache.spark.sql.Row, (VA, Timestamp), (VA, Timestamp)] {
  import GroupAggs.maxTs
  def zero: (VA, Timestamp) = (init(), null)
  def reduce(b: (VA, Timestamp), r: org.apache.spark.sql.Row): (VA, Timestamp) =
    (CogroupedKStream.applyRow(folds, kConv(r.get(0)), r, b._1),
      maxTs(b._2, r.getAs[Timestamp](1)))
  def merge(a: (VA, Timestamp), b: (VA, Timestamp)): (VA, Timestamp) =
    (merger(a._1, b._1), maxTs(a._2, b._2))
  def finish(b: (VA, Timestamp)): (VA, Timestamp) = b
  def bufferEncoder: Encoder[(VA, Timestamp)] = Encoders.tuple(vaEnc, Encoders.TIMESTAMP)
  def outputEncoder: Encoder[(VA, Timestamp)] = bufferEncoder
}

private[graft] object CogroupedKStream {
  import org.apache.spark.sql.Row

  /** Union rows in event-time order; ties resolve by side order (the
    * deterministic stand-in for the reference's offset order). */
  def sortedByTs(rows: IterableOnce[Row]): Seq[Row] =
    rows.iterator.toSeq.sortBy { r =>
      val ts = r.getAs[Timestamp](1); (ts.getTime, ts.getNanos, r.getInt(2))
    }

  /** Dispatch one union row to its side's aggregator (layout:
    * key, ts, src, v0..vn). */
  def applyRow[K, VA](folds: Seq[(K, Any, VA) => VA], k: K, r: Row, acc: VA): VA = {
    val i = r.getInt(2)
    folds(i)(k, r.get(3 + i), acc)
  }

  /** Erase one side's value type behind its decoded aggregator. */
  def entry[K, V, VA](df: DataFrame, agg: (K, V, VA) => VA)(
      implicit vEnc: Encoder[V]): (DataFrame, (K, Any, VA) => VA) = {
    val conv = new LazyConv[V](vEnc)
    (df, (k: K, a: Any, acc: VA) => agg(k, conv(a), acc))
  }

  /** Tag-union of every side onto one schema: each side's value rides its
    * own nullable slot (no serialization, no common supertype). */
  def union[K, VA](entries: Seq[(DataFrame, (K, Any, VA) => VA)]): DataFrame = {
    val valueTypes = entries.map(_._1.schema(ValueCol).dataType)
    val sides = entries.zipWithIndex.map { case ((d, _), i) =>
      val slots = valueTypes.zipWithIndex.map { case (dt, j) =>
        (if (i == j) col(ValueCol) else lit(null).cast(dt)).as(s"v$j")
      }
      d.select(col(KeyCol) +: col(TsCol) +: lit(i).as("src") +: slots: _*)
    }
    sides.reduce(_ unionByName _)
  }
}
