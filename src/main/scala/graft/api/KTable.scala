package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import Rec._

/** Changelog table — the reference's `KTable<K,V>`
  * (`streams/.../kstream/KTable.java`): latest value per key, null value =
  * tombstone, updates flow as `Change(new, old)` pairs
  * (`kstream/internals/Change.java`).
  *
  * Representation: a (key, value, ts) changelog DataFrame plus a `deduped`
  * invariant (true ⇒ at most one live row per key, e.g. aggregation
  * results). The latest view derives via `max_by(value, ts)` — an
  * update-mode streaming aggregation or a batch hash agg; tombstones drop
  * out of the view.
  *
  * `suppressed` marks final-results emission
  * (`suppress(untilWindowCloses)`, `kstream/Suppressed.java:134`): in
  * streaming it selects append output mode after the watermark instead of
  * per-batch updates.
  */
final class KTable[K, V] private[graft] (
    private[graft] val df: DataFrame,
    private[graft] val deduped: Boolean,
    val suppressed: Boolean = false)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private implicit def t3: Encoder[(K, V, Timestamp)] = tupleEnc[K, V]

  /** Latest-per-key live rows (tombstones removed) —
    * `KTableSource.java:105` materialization.
    *
    * Determinism: equal-ts updates tie-break on the value itself (the
    * reference is deterministic in offset order, which a re-shuffled
    * changelog no longer carries); non-null beats tombstone at the same
    * ts. Unorderable value types (maps) fall back to ts-only ordering.
    *
    * Precondition: record ts is non-null (the DSL stamps every record) —
    * `max_by` skips rows whose ordering struct is null, so a key whose
    * rows ALL had null ts would vanish rather than keep one row. */
  def latestDF: DataFrame = {
    val live =
      if (deduped) df
      else df.groupBy(col(KeyCol))
        .agg(max_by(struct(col(ValueCol), col(TsCol)), tieOrder).as("m"))
        .select(col(KeyCol), col(s"m.$ValueCol").as(ValueCol), col(s"m.$TsCol").as(TsCol))
    live.filter(col(ValueCol).isNotNull)
  }

  /** (ts, value) when the value type is orderable, else ts alone. */
  private def tieOrder: Column = {
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    if (RowOrdering.isOrderable(df.schema(ValueCol).dataType))
      struct(col(TsCol), col(ValueCol))
    else struct(col(TsCol))
  }

  private def latestTyped: Dataset[(K, V, Timestamp)] = toTyped[K, V](latestDF)
  private def viewTable(d: DataFrame) = new KTable[K, V](d, deduped = true, suppressed)

  /** `KTable.filter` (`kstream/internals/KTableFilter.java`): rows leaving
    * the predicate become tombstones — i.e. vanish from the view. */
  def filter(p: (K, V) => Boolean): KTable[K, V] =
    viewTable(fromTyped(latestTyped.filter(r => p(r._1, r._2))))

  def filterNot(p: (K, V) => Boolean): KTable[K, V] = filter((k, v) => !p(k, v))

  /** Columnar filter fast path. */
  def where(cond: Column): KTable[K, V] = viewTable(latestDF.filter(cond))

  /** `KTable.mapValues` (`kstream/internals/KTableMapValues.java`). */
  def mapValues[V2: Encoder](f: V => V2): KTable[K, V2] =
    new KTable[K, V2](fromTyped(latestTyped.map(r => (r._1, f(r._2), r._3))(
      tupleEnc[K, V2])), deduped = true, suppressed)

  /** `KTable.transformValues` (`kstream/internals/KTableTransformValues
    * .java`): value transform over the table view; stateful variants ride
    * `graft.streaming.StatefulOps` on the update stream. */
  def transformValues[V2: Encoder](f: (K, V) => V2): KTable[K, V2] =
    new KTable[K, V2](fromTyped(latestTyped.map(r => (r._1, f(r._1, r._2), r._3))(
      tupleEnc[K, V2])), deduped = true, suppressed)

  /** `KTable.toStream` (`KTable.java:363`): the update stream; in batch,
    * the final view's rows. */
  def toStream: KStream[K, V] = new KStream[K, V](latestDF)

  /** `KTable.toStream(KeyValueMapper)` (`KTable.java:390`): re-key while
    * converting to a stream. */
  def toStream[K2: Encoder](mapper: (K, V) => K2): KStream[K2, V] =
    toStream.selectKey(mapper)

  /** `suppress(untilWindowCloses)` — final results only. */
  def suppressFinal(): KTable[K, V] = new KTable[K, V](df, deduped, suppressed = true)

  /** `KTable.groupBy` (`KTable.java:584`): re-key the changelog; updates
    * must subtract from the old group and add to the new one
    * (`kstream/internals/KTableRepartitionMap.java`). */
  def groupBy[K2: Encoder, V2: Encoder](selector: (K, V) => (K2, V2)): KGroupedTable[K2, V2] = {
    if (df.isStreaming) {
      // live changelog: ±deltas from flatMapGroupsWithState (append mode,
      // so the KGroupedTable's downstream aggregation stays legal in one
      // streaming query) — KTableRepartitionMap.java incrementally
      val deltas = graft.streaming.StreamingChangelog
        .deltaStream(new KStream[K, V](df))(selector)
        .select(col("_1").as(KeyCol), col("_2._1").as(ValueCol),
          col("_2._2").as("isAdd"), col("_3").as(TsCol))
      return new KGroupedTable[K2, V2](deltas)
    }
    // Replay the changelog as (+new, -old) deltas: adds from every live
    // row version, subtracts from every superseded (lagged) version —
    // KTableAggregate.java:72-106 semantics, batch-replayed. Same
    // deterministic (ts, value) tie-break as latestDF.
    val byKey = Window.partitionBy(col(KeyCol)).orderBy(tieOrder)
    val adds = df.filter(col(ValueCol).isNotNull)
      .select(col(KeyCol), col(ValueCol), lit(true).as("isAdd"), col(TsCol))
    val subs = df.withColumn("old_value", lag(col(ValueCol), 1).over(byKey))
      .filter(col("old_value").isNotNull)
      .select(col(KeyCol), col("old_value").as(ValueCol), lit(false).as("isAdd"), col(TsCol))
    val deltas = adds.unionByName(subs)
      .as(Encoders.tuple(kEnc, vEnc, Encoders.scalaBoolean, Encoders.TIMESTAMP))
      .map { case (k, v, isAdd, ts) =>
        val (k2, v2) = selector(k, v); (k2, v2, isAdd, ts)
      }(Encoders.tuple(implicitly[Encoder[K2]], implicitly[Encoder[V2]],
        Encoders.scalaBoolean, Encoders.TIMESTAMP))
    new KGroupedTable[K2, V2](deltas.toDF(KeyCol, ValueCol, "isAdd", TsCol))
  }

  // ---------------------------------------- KTable⋈KTable joins (§2.5)

  /** Inner join of the two tables' current views
    * (`kstream/internals/KTableKTableInnerJoin.java`). */
  def join[VO: Encoder, VR: Encoder](other: KTable[K, VO])(
      joiner: (V, VO) => VR): KTable[K, VR] = {
    val l = latestDF
    val r = other.latestDF.select(col(KeyCol).as("r_key"), col(ValueCol).as("r_value"))
    val joined = l.join(r, col(KeyCol) === col("r_key"))
      .select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col("r_value").as("_3"),
        col(TsCol).as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, implicitly[Encoder[VO]], Encoders.TIMESTAMP))
    new KTable[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])), deduped = true, suppressed)
  }

  /** Left join (`KTableKTableLeftJoin.java`): right misses join as None —
    * native left-outer pass with Option-decoded right side. */
  def leftJoin[VO: Encoder, VR: Encoder](other: KTable[K, VO])(
      joiner: (V, Option[VO]) => VR): KTable[K, VR] = {
    val r = other.latestDF.select(col(KeyCol).as("r_key"), col(ValueCol).as("r_value"))
    val joined = latestDF.join(r, col(KeyCol) === col("r_key"), "left_outer")
      .select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col("r_value").as("_3"),
        col(TsCol).as("_4"))
      .as(Encoders.tuple(kEnc, vEnc, optionEnc[VO], Encoders.TIMESTAMP))
    new KTable[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])), deduped = true, suppressed)
  }

  /** Outer join (`KTableKTableOuterJoin.java`): either side may be None —
    * native full-outer pass, both sides Option-decoded. */
  def outerJoin[VO: Encoder, VR: Encoder](other: KTable[K, VO])(
      joiner: (Option[V], Option[VO]) => VR): KTable[K, VR] = {
    val r = other.latestDF.select(col(KeyCol).as("r_key"), col(ValueCol).as("r_value"),
      col(TsCol).as("r_ts"))
    val joined = latestDF.join(r, col(KeyCol) === col("r_key"), "full_outer")
      .select(coalesce(col(KeyCol), col("r_key")).as("_1"), col(ValueCol).as("_2"),
        col("r_value").as("_3"), coalesce(col(TsCol), col("r_ts")).as("_4"))
      .as(Encoders.tuple(kEnc, optionEnc[V], optionEnc[VO], Encoders.TIMESTAMP))
    new KTable[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])), deduped = true, suppressed)
  }

  // ------------------------------------- foreign-key join (KIP-213)

  /** Foreign-key table-table join — Kafka 2.4's
    * `KTable.join(other, foreignKeyExtractor, joiner)` (KIP-213; lands
    * just after the reference's 2.2 line, the natural next step of its
    * `KTableKTableInnerJoin`). The result keeps THIS table's key: each
    * row joins the `other` row addressed by `fk(value)`, and an update
    * on the right side re-joins every left row referencing it.
    *
    * The reference-lineage implementation routes subscription/response
    * topics; Spark-first the whole machinery collapses to deriving the
    * fk column and equi-joining the two latest views — one shuffle on
    * fk, zero when the right view is small enough for AQE to broadcast.
    * Live-changelog variant: `streaming.StreamingTableJoin.fkJoin`. */
  def fkJoin[KO: Encoder, VO: Encoder, VR: Encoder](other: KTable[KO, VO])(
      fk: V => KO)(joiner: (V, VO) => VR): KTable[K, VR] = {
    val joined = fkJoined(other, fk, "inner")
      .as(Encoders.tuple(kEnc, vEnc, implicitly[Encoder[VO]], Encoders.TIMESTAMP))
    new KTable[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])), deduped = true, suppressed)
  }

  /** Left variant (`KTable.leftJoin(other, foreignKeyExtractor, ...)`):
    * rows whose fk misses (or is null) join with None. */
  def fkLeftJoin[KO: Encoder, VO: Encoder, VR: Encoder](other: KTable[KO, VO])(
      fk: V => KO)(joiner: (V, Option[VO]) => VR): KTable[K, VR] = {
    val joined = fkJoined(other, fk, "left_outer")
      .as(Encoders.tuple(kEnc, vEnc, optionEnc[VO], Encoders.TIMESTAMP))
    new KTable[K, VR](fromTyped(joined.map(t => (t._1, joiner(t._2, t._3), t._4))(
      tupleEnc[K, VR])), deduped = true, suppressed)
  }

  private def fkJoined[KO: Encoder, VO: Encoder](other: KTable[KO, VO],
      fk: V => KO, how: String): DataFrame = {
    implicit val l4: Encoder[(K, V, KO, Timestamp)] =
      Encoders.tuple(kEnc, vEnc, implicitly[Encoder[KO]], Encoders.TIMESTAMP)
    val l = latestTyped.map(r => (r._1, r._2, fk(r._2), r._3))
      .toDF(KeyCol, ValueCol, "fkey", TsCol)
    val r = other.latestDF.select(col(KeyCol).as("r_key"), col(ValueCol).as("r_value"))
    l.join(r, col("fkey") === col("r_key"), how)
      .select(col(KeyCol).as("_1"), col(ValueCol).as("_2"), col("r_value").as("_3"),
        col(TsCol).as("_4"))
  }

  /** Typed view of the live rows. */
  def toDataset: Dataset[(K, V, Timestamp)] = latestTyped
}

/** `KGroupedTable` (`kstream/KGroupedTable.java:85-390`): aggregation over
  * a re-keyed changelog with adder/subtractor semantics
  * (`kstream/internals/KTableAggregate.java:72-106`). Holds (+new, -old)
  * delta records; aggregations fold adds and subtracts — which requires
  * the same adder/subtractor-inverse contract the reference imposes. */
final class KGroupedTable[K, V] private[graft] (deltas: DataFrame)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private val t4 = Encoders.tuple(kEnc, vEnc, Encoders.scalaBoolean, Encoders.TIMESTAMP)
  private def typed: Dataset[(K, V, Boolean, Timestamp)] =
    deltas.select(col(KeyCol).as("_1"), col(ValueCol).as("_2"),
      col("isAdd").as("_3"), col(TsCol).as("_4")).as(t4)

  /** `KGroupedTable.count` — adds minus subtracts. */
  def count(): KTable[K, Long] = {
    val out = deltas.groupBy(col(KeyCol))
      .agg(sum(when(col("isAdd"), 1L).otherwise(-1L)).as(ValueCol),
        max(col(TsCol)).as(TsCol))
      .filter(col(ValueCol) > 0)
    new KTable[K, Long](out, deduped = true)(kEnc, Encoders.scalaLong)
  }

  /** `KGroupedTable.aggregate(initializer, adder, subtractor)`. */
  def aggregate[VA: Encoder](initializer: => VA)(
      adder: (K, V, VA) => VA, subtractor: (K, V, VA) => VA,
      merger: (VA, VA) => VA): KTable[K, VA] = {
    val agg = new DeltaFoldAggregator[K, V, VA](
      () => initializer, adder, subtractor, merger, implicitly[Encoder[VA]])
    val out = typed.groupByKey(_._1)
      .agg(agg.toColumn.name("agg"))
      .select(col("key").as(KeyCol), col("agg._1").as(ValueCol), col("agg._2").as(TsCol))
    new KTable[K, VA](out, deduped = true)
  }

  /** `KGroupedTable.reduce(adder, subtractor)`.
    *
    * Subtractions can reach a partial buffer before any addition (deltas
    * fold in partition order), so the buffer splits into an additive side
    * and a retracted side — each folded with the *adder* — and the
    * subtractor applies once at finish: `sub(fold(adds), fold(subs))`.
    * Valid under the same abelian adder/subtractor contract the reference
    * imposes on `KGroupedTable.reduce`; Option-encoded sides keep empty
    * buffers encodable for primitive V. */
  def reduce(adder: (V, V) => V, subtractor: (V, V) => V): KTable[K, V] = {
    implicit val ove: Encoder[Option[V]] = Rec.optionEnc[V](vEnc)
    implicit val bufEnc: Encoder[(Option[V], Option[V])] = Encoders.tuple(ove, ove)
    def fold(acc: Option[V], v: V): Option[V] = Some(acc.map(adder(_, v)).getOrElse(v))
    def comb(a: Option[V], b: Option[V]): Option[V] = (a, b) match {
      case (Some(x), Some(y)) => Some(adder(x, y))
      case _ => a.orElse(b)
    }
    val t = aggregate[(Option[V], Option[V])]((None, None))(
      (_, v, b) => (fold(b._1, v), b._2),
      (_, v, b) => (b._1, fold(b._2, v)),
      (a, b) => (comb(a._1, b._1), comb(a._2, b._2)))
    // groups whose additions were fully retracted drop from the view
    t.filter((_, pn) => pn._1.isDefined)
      .mapValues { case (p, n) => n.fold(p.get)(subtractor(p.get, _)) }(vEnc)
  }

  /** Columnar aggregation over the deltas: each (name, addExpr, subExpr)
    * contributes addExpr for adds and subExpr for retracts — codegen'd. */
  def aggExpr(exprs: (String, Column, Column)*): DataFrame = {
    val cols = exprs.map { case (n, a, s) =>
      sum(when(col("isAdd"), a).otherwise(s)).as(n)
    }
    deltas.groupBy(col(KeyCol)).agg(cols.head, cols.tail: _*)
  }
}

/** `GlobalKTable` (`streams/.../kstream/GlobalKTable.java`): a table small
  * enough to replicate to every instance — in Spark, a broadcast
  * DataFrame; joins against it never shuffle the stream side. */
final class GlobalKTable[K, V] private[graft] (private[graft] val df: DataFrame)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V])
