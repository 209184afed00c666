package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.api.{KStream, KTable, Rec}

/** Streaming KTable⋈KTable changelog join — the reference's symmetric
  * update-driven join (`kstream/internals/KTableKTableInnerJoin.java:78-106`
  * with mirrored processors + `KTableKTableJoinMerger`): an update on
  * EITHER side looks up the other side's current value and emits the new
  * joined result; a tombstone removes the side and (for inner) retracts
  * the key.
  *
  * Spark mapping (SURVEY.md §7.4 risk #1): union both changelogs tagged by
  * side, keep (latest-left, latest-right) per key in
  * `flatMapGroupsWithState`, emit the joined value once per micro-batch
  * per updated key (the reference's cache-flush cadence). Null values are
  * tombstones. Emitted `None` joined values mean "key left the join view"
  * — downstream sinks upsert/delete by key.
  */
object StreamingTableJoin {

  /** Update stream of the joined table: one record per (batch, updated
    * key) carrying the current joined value — `Some(out)` when the join
    * produces a row, `None` when the key dropped out (tombstone). */
  def innerJoin[K: Encoder, VL: Encoder, VR: Encoder, OUT: Encoder](
      left: KStream[K, VL], right: KStream[K, VR])(
      joiner: (VL, VR) => OUT): Dataset[(K, Option[OUT])] =
    fullJoin(left, right) { (l, r) =>
      for (lv <- l; rv <- r) yield joiner(lv, rv)
    }

  /** Left variant: emits whenever the left side exists. */
  def leftJoin[K: Encoder, VL: Encoder, VR: Encoder, OUT: Encoder](
      left: KStream[K, VL], right: KStream[K, VR])(
      joiner: (VL, Option[VR]) => OUT): Dataset[(K, Option[OUT])] =
    fullJoin(left, right) { (l, r) => l.map(lv => joiner(lv, r)) }

  /** Streaming KStream⋈KTable enrichment join against a LIVE changelog
    * table (`kstream/internals/KStreamKTableJoinProcessor.java:55-76`):
    * each stream record is emitted once, joined with the table's current
    * value for its key; table updates only mutate the join state — they
    * produce NO output (unlike the symmetric table-table join above).
    * Tombstones (null table values) clear the key's state.
    *
    * Spark mapping: union of the two sides tagged by origin, grouped by
    * key, `flatMapGroupsWithState` in Append mode holding the table's
    * latest value per key. Within a micro-batch rows apply in event-time
    * order with table updates ordered before stream lookups at equal ts —
    * a deterministic stand-in for the reference's offset order. Stream
    * records with null values are dropped (`KStreamKTableJoinProcessor`'s
    * null-skip + skipped-records metric). Append mode keeps downstream
    * streaming aggregations legal.
    *
    * `inner=false` gives the left variant: misses emit `joiner(v, None)`.
    */
  def streamTableJoin[K: Encoder, V: Encoder, VT: Encoder, VR: Encoder](
      stream: KStream[K, V], table: KTable[K, VT], inner: Boolean)(
      joiner: (V, Option[VT]) => VR): Dataset[(K, VR, Timestamp)] = {
    implicit val ov: Encoder[Option[V]] = Rec.optionEnc[V]
    implicit val ovt: Encoder[Option[VT]] = Rec.optionEnc[VT]
    implicit val tagged: Encoder[(K, Boolean, Option[V], Option[VT], Timestamp)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaBoolean, ov, ovt,
        Encoders.TIMESTAMP)
    implicit val stateEnc: Encoder[(Option[VT], Timestamp)] =
      Encoders.tuple(ovt, Encoders.TIMESTAMP)
    implicit val outEnc: Encoder[(K, VR, Timestamp)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[VR]], Encoders.TIMESTAMP)

    val s = stream.toDataset.map(r => (r._1, true, Option(r._2), Option.empty[VT], r._3))
    val t = new KStream[K, VT](table.df).toDataset
      .map(r => (r._1, false, Option.empty[V], Option(r._2), r._3))
    val joinFn = joiner
    val innerFlag = inner

    s.union(t)
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[VT], Timestamp), (K, VR, Timestamp)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var cur = state.getOption.map(_._1).getOrElse(Option.empty[VT])
        var curTs = state.getOption.map(_._2).getOrElse(new Timestamp(0L))
        val out = Seq.newBuilder[(K, VR, Timestamp)]
        // event-time order; table updates before stream lookups at equal ts
        rows.toSeq.sortBy(r => (r._5.getTime, r._5.getNanos, r._2)).foreach { r =>
          if (!r._2) { cur = r._4; curTs = r._5 }
          else if (r._3.isDefined && (!innerFlag || cur.isDefined))
            out += ((r._1, joinFn(r._3.get, cur), r._5))
        }
        state.update((cur, curTs))
        out.result().iterator
      }
  }

  /** General form: `view` maps the two current side values to the joined
    * value (None = no row for this key). */
  def fullJoin[K: Encoder, VL: Encoder, VR: Encoder, OUT: Encoder](
      left: KStream[K, VL], right: KStream[K, VR])(
      view: (Option[VL], Option[VR]) => Option[OUT]): Dataset[(K, Option[OUT])] = {
    implicit val ovl: Encoder[Option[VL]] = Rec.optionEnc[VL]
    implicit val ovr: Encoder[Option[VR]] = Rec.optionEnc[VR]
    implicit val oout: Encoder[Option[OUT]] = Rec.optionEnc[OUT]
    implicit val tagged: Encoder[(K, Boolean, Option[VL], Option[VR], Timestamp)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaBoolean, ovl, ovr,
        Encoders.TIMESTAMP)
    implicit val stateEnc: Encoder[(Option[VL], Option[VR])] = Encoders.tuple(ovl, ovr)
    implicit val outEnc: Encoder[(K, Option[OUT])] =
      Encoders.tuple(implicitly[Encoder[K]], oout)

    val l = left.toDataset.map(r => (r._1, true, Option(r._2), Option.empty[VR], r._3))
    val r = right.toDataset.map(r => (r._1, false, Option.empty[VL], Option(r._2), r._3))
    val viewFn = view

    l.union(r)
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[VL], Option[VR]), (K, Option[OUT])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        var (curL, curR) = state.getOption.getOrElse((Option.empty[VL], Option.empty[VR]))
        // apply this batch's updates in event-time order (changelog order)
        // (millis, nanos) keeps sub-millisecond event times ordered
        rows.toSeq.sortBy(row => (row._5.getTime, row._5.getNanos)).foreach { row =>
          if (row._2) curL = row._3 else curR = row._4
        }
        state.update((curL, curR))
        Iterator.single((key, viewFn(curL, curR)))
      }
  }
}
