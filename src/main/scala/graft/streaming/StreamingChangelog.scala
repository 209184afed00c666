package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.api.{FoldAggregator, KStream, Rec, RowFoldAdapter}

/** Streaming `KGroupedTable` — the full changelog re-key aggregation
  * (`kstream/internals/KTableRepartitionMap.java` +
  * `KTableAggregate.java:72-106`) running incrementally:
  *
  *   stage 1 (append-mode flatMapGroupsWithState keyed by the ORIGINAL
  *   key): track each key's latest value; every update emits
  *   `-old` / `+new` delta events — the `Change(new, old)` pair routed
  *   through the repartition topic in the reference;
  *
  *   stage 2 (streaming aggregation keyed by the NEW key): a typed
  *   delta-fold applies the adder for `+` deltas and the subtractor for
  *   `-` deltas — Spark's update-mode agg emits refreshed results per
  *   micro-batch.
  *
  * Append-mode stage 1 is what makes the downstream aggregation legal in
  * one query (update-mode flatMapGroupsWithState cannot be followed by
  * stateful ops).
  */
object StreamingChangelog {

  /** Stage 1 alone: the re-keyed ±delta stream as a typed Dataset —
    * `Change(new, old)` pairs the reference routes through the
    * repartition topic. Reused by [[groupByAggregate]] and by
    * `KTable.groupBy` on streaming changelogs (which feeds the columnar
    * `KGroupedTable` surface with it). */
  def deltaStream[K: Encoder, V: Encoder, K2: Encoder, V2: Encoder](
      changelog: KStream[K, V])(
      selector: (K, V) => (K2, V2)): org.apache.spark.sql.Dataset[(K2, (V2, Boolean), Timestamp)] = {
    implicit val ov: Encoder[Option[V]] = Rec.optionEnc[V]
    implicit val deltaEnc: Encoder[(K2, (V2, Boolean), Timestamp)] =
      Encoders.tuple(implicitly[Encoder[K2]],
        Encoders.tuple(implicitly[Encoder[V2]], Encoders.scalaBoolean),
        Encoders.TIMESTAMP)
    implicit val t3: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]

    val sel = selector
    // per-original-key latest value; emit ±deltas per update
    changelog.toDataset
      .groupByKey(_._1)
      .flatMapGroupsWithState[Option[V], (K2, (V2, Boolean), Timestamp)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var current: Option[V] = state.getOption.flatten
        val out = scala.collection.mutable.ArrayBuffer.empty[(K2, (V2, Boolean), Timestamp)]
        rows.toSeq.sortBy(r => (r._3.getTime, r._3.getNanos)).foreach { case (_, v, ts) =>
          current.foreach { old =>
            val (k2, v2) = sel(key, old)
            out += ((k2, (v2, false), ts)) // subtract the superseded value
          }
          current = Option(v)
          current.foreach { nv =>
            val (k2, v2) = sel(key, nv)
            out += ((k2, (v2, true), ts)) // add the new value
          }
        }
        state.update(current)
        out.iterator
      }
  }

  /** Re-keyed streaming aggregation with adder/subtractor; returns the
    * update stream as a DataFrame (key, value, ts). Null changelog values
    * are tombstones. */
  def groupByAggregate[K: Encoder, V: Encoder, K2: Encoder, V2: Encoder, VA: Encoder](
      changelog: KStream[K, V])(selector: (K, V) => (K2, V2))(
      initializer: => VA)(
      adder: (K2, V2, VA) => VA, subtractor: (K2, V2, VA) => VA,
      merger: (VA, VA) => VA): DataFrame = {
    implicit val deltaEnc: Encoder[(K2, (V2, Boolean), Timestamp)] =
      Encoders.tuple(implicitly[Encoder[K2]],
        Encoders.tuple(implicitly[Encoder[V2]], Encoders.scalaBoolean),
        Encoders.TIMESTAMP)
    val deltas = deltaStream(changelog)(selector)

    // stage 2: typed delta fold keyed by the new key
    val agg = new FoldAggregator[K2, (V2, Boolean), VA](
      () => initializer,
      (k2, vb, acc) => if (vb._2) adder(k2, vb._1, acc) else subtractor(k2, vb._1, acc),
      merger,
      implicitly[Encoder[VA]])
    val rowAgg = new RowFoldAdapter[K2, (V2, Boolean), (VA, Timestamp), (VA, Timestamp)](
      agg, implicitly[Encoder[K2]],
      Encoders.tuple(implicitly[Encoder[V2]], Encoders.scalaBoolean))
    deltas
      .groupBy(col("_1").as(Rec.KeyCol))
      .agg(rowAgg.toColumn.name("agg"))
      .select(col(Rec.KeyCol), col("agg._1").as(Rec.ValueCol), col("agg._2").as(Rec.TsCol))
  }

  /** Streaming `KGroupedTable.count`. */
  def groupByCount[K: Encoder, V: Encoder, K2: Encoder](
      changelog: KStream[K, V])(selector: (K, V) => K2): DataFrame = {
    implicit val le: Encoder[Long] = Encoders.scalaLong
    groupByAggregate[K, V, K2, Long, Long](changelog)((k, v) => (selector(k, v), 1L))(0L)(
      (_, _, acc) => acc + 1, (_, _, acc) => acc - 1, _ + _)
  }
}
