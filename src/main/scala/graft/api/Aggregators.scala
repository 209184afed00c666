package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed fold aggregators backing the DSL's `aggregate`/`reduce` — the
  * reference's `Initializer` + `Aggregator` + `Merger` triple
  * (`kstream/Initializer.java`, `Aggregator.java`, `Merger.java`) mapped
  * onto `org.apache.spark.sql.expressions.Aggregator`.
  *
  * Top-level classes (no `$outer`) so task serialization only captures the
  * user lambdas; every buffer also threads max-event-time so result tables
  * carry the reference's table timestamp semantics. */
private[graft] object GroupAggs {
  def maxTs(a: Timestamp, b: Timestamp): Timestamp =
    if (a == null) b else if (b == null) a else if (a.after(b)) a else b
}

/** `aggregate(initializer)(aggregator, merger)` over (K, V, ts) records. */
private[graft] final class FoldAggregator[K, V, VA](
    init: () => VA, aggr: (K, V, VA) => VA, mrg: (VA, VA) => VA,
    vaEnc: Encoder[VA])
    extends Aggregator[(K, V, Timestamp), (VA, Timestamp), (VA, Timestamp)] {
  import GroupAggs.maxTs
  def zero: (VA, Timestamp) = (init(), null)
  def reduce(b: (VA, Timestamp), r: (K, V, Timestamp)): (VA, Timestamp) =
    (aggr(r._1, r._2, b._1), maxTs(b._2, r._3))
  def merge(a: (VA, Timestamp), b: (VA, Timestamp)): (VA, Timestamp) =
    (mrg(a._1, b._1), maxTs(a._2, b._2))
  def finish(b: (VA, Timestamp)): (VA, Timestamp) = b
  def bufferEncoder: Encoder[(VA, Timestamp)] = Encoders.tuple(vaEnc, Encoders.TIMESTAMP)
  def outputEncoder: Encoder[(VA, Timestamp)] = bufferEncoder
}

/** Emptiness-tracked fold for `reduce` (no initializer): buffer is
  * (hasValue, value, maxTs) so primitive V stays encodable without
  * Option. */
private[graft] final class OptFoldAggregator[K, V, VA](
    add: (Option[VA], V) => Option[VA],
    combine: (Option[VA], Option[VA]) => Option[VA],
    vaEnc: Encoder[VA])
    extends Aggregator[(K, V, Timestamp), (Boolean, VA, Timestamp), (VA, Timestamp)] {
  import GroupAggs.maxTs
  def zero = (false, null.asInstanceOf[VA], null)
  def reduce(b: (Boolean, VA, Timestamp), r: (K, V, Timestamp)) = {
    val res = add(if (b._1) Some(b._2) else None, r._2)
    (res.isDefined, res.getOrElse(null.asInstanceOf[VA]), maxTs(b._3, r._3))
  }
  def merge(a: (Boolean, VA, Timestamp), b: (Boolean, VA, Timestamp)) = {
    val res = combine(if (a._1) Some(a._2) else None, if (b._1) Some(b._2) else None)
    (res.isDefined, res.getOrElse(null.asInstanceOf[VA]), maxTs(a._3, b._3))
  }
  def finish(b: (Boolean, VA, Timestamp)) = (b._2, b._3)
  def bufferEncoder = Encoders.tuple(Encoders.scalaBoolean, vaEnc, Encoders.TIMESTAMP)
  def outputEncoder = Encoders.tuple(vaEnc, Encoders.TIMESTAMP)
}

/** External-value converter: Spark's analyzer binds an unbound typed
  * aggregate on a *relational* groupBy with a generic Row deserializer, so
  * product-typed fields arrive as `Row`; atomic externals (String, boxed
  * numbers, Timestamp) arrive as themselves. This rebuilds the typed value
  * when needed. */
private[graft] object ExternalConv {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.CatalystTypeConverters
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}

  def expressionEncoderFor[T](e: Encoder[T]): ExpressionEncoder[T] = e match {
    case ee: ExpressionEncoder[T @unchecked] => ee
    case ag: AgnosticEncoder[T @unchecked] => ExpressionEncoder(ag)
  }

  def make[T](enc: Encoder[T]): Any => T = {
    lazy val (toCat, deser) = {
      val ee = expressionEncoderFor(enc).resolveAndBind()
      (CatalystTypeConverters.createToCatalystConverter(ee.schema),
        ee.createDeserializer())
    }
    (x: Any) =>
      x match {
        case r: Row => deser(toCat(r).asInstanceOf[InternalRow])
        case other => other.asInstanceOf[T]
      }
  }
}

/** Serializable [[ExternalConv]] wrapper: ships only the Encoder; the
  * converter (analyzer-bound, not serializable) builds lazily on each
  * executor. For converters captured directly in task closures. */
private[graft] final class LazyConv[T](enc: Encoder[T]) extends Serializable {
  @transient private lazy val conv = ExternalConv.make[T](enc)
  def apply(x: Any): T = conv(x)
}

/** Adapts a (K, V, ts)-tuple aggregator to Row input for use on a
  * relational groupBy (the windowed path, where grouping must stay on the
  * native window() column). Row layout: (_1=key, _2=value, _3=ts). */
private[graft] final class RowFoldAdapter[K, V, BUF, OUT](
    delegate: Aggregator[(K, V, Timestamp), BUF, OUT],
    kEnc: Encoder[K], vEnc: Encoder[V])
    extends Aggregator[org.apache.spark.sql.Row, BUF, OUT] {
  @transient private lazy val kConv = ExternalConv.make[K](kEnc)
  @transient private lazy val vConv = ExternalConv.make[V](vEnc)
  def zero: BUF = delegate.zero
  def reduce(b: BUF, r: org.apache.spark.sql.Row): BUF =
    delegate.reduce(b, (kConv(r.get(0)), vConv(r.get(1)), r.getAs[Timestamp](2)))
  def merge(a: BUF, b: BUF): BUF = delegate.merge(a, b)
  def finish(b: BUF): OUT = delegate.finish(b)
  def bufferEncoder: Encoder[BUF] = delegate.bufferEncoder
  def outputEncoder: Encoder[OUT] = delegate.outputEncoder
}

/** Adder/subtractor fold over (+new, -old) changelog deltas —
  * `KTableAggregate.java:72-106`. */
private[graft] final class DeltaFoldAggregator[K, V, VA](
    init: () => VA, adder: (K, V, VA) => VA, subtractor: (K, V, VA) => VA,
    mrg: (VA, VA) => VA, vaEnc: Encoder[VA])
    extends Aggregator[(K, V, Boolean, Timestamp), (VA, Timestamp), (VA, Timestamp)] {
  import GroupAggs.maxTs
  def zero = (init(), null)
  def reduce(b: (VA, Timestamp), r: (K, V, Boolean, Timestamp)) = {
    val va = if (r._3) adder(r._1, r._2, b._1) else subtractor(r._1, r._2, b._1)
    (va, maxTs(b._2, r._4))
  }
  def merge(a: (VA, Timestamp), b: (VA, Timestamp)) = (mrg(a._1, b._1), maxTs(a._2, b._2))
  def finish(b: (VA, Timestamp)) = b
  def bufferEncoder = Encoders.tuple(vaEnc, Encoders.TIMESTAMP)
  def outputEncoder = bufferEncoder
}
