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
    * deterministic stand-in for the reference's offset order). */
  def aggregate(initializer: => VA)(implicit vaEnc: Encoder[VA]): KTable[K, VA] = {
    val valueTypes = entries.map(_._1.schema(ValueCol).dataType)
    val sides = entries.zipWithIndex.map { case ((d, _), i) =>
      val slots = valueTypes.zipWithIndex.map { case (dt, j) =>
        (if (i == j) col(ValueCol) else lit(null).cast(dt)).as(s"v$j")
      }
      d.select(col(KeyCol) +: col(TsCol) +: lit(i).as("src") +: slots: _*)
    }
    val all = sides.reduce(_ unionByName _)

    val kConv = new LazyConv[K](kEnc)
    val folds = entries.map(_._2)
    val init: () => VA = () => initializer
    implicit val outEnc: Encoder[(K, VA, Timestamp)] =
      Encoders.tuple(kEnc, vaEnc, Encoders.TIMESTAMP)
    val out = all.groupByKey(row => kConv(row.get(0)))
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy { r =>
          val ts = r.getAs[Timestamp](1); (ts.getTime, ts.getNanos, r.getInt(2))
        }
        var acc = init()
        rows.foreach { r =>
          val i = r.getInt(2)
          acc = folds(i)(k, r.get(3 + i), acc)
        }
        (k, acc, rows.last.getAs[Timestamp](1))
      }
    new KTable[K, VA](out.toDF(KeyCol, ValueCol, TsCol), deduped = true)
  }
}

private[graft] object CogroupedKStream {
  /** Erase one side's value type behind its decoded aggregator. */
  def entry[K, V, VA](df: DataFrame, agg: (K, V, VA) => VA)(
      implicit vEnc: Encoder[V]): (DataFrame, (K, Any, VA) => VA) = {
    val conv = new LazyConv[V](vEnc)
    (df, (k: K, a: Any, acc: VA) => agg(k, conv(a), acc))
  }
}
