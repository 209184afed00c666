package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.api.{KStream, Rec}

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
        rows.toSeq.sortBy(_._5.getTime).foreach { row =>
          if (row._2) curL = row._3 else curR = row._4
        }
        state.update((curL, curR))
        Iterator.single((key, viewFn(curL, curR)))
      }
  }
}
