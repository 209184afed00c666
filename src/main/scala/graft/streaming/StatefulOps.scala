package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.api.{KStream, Rec}

/** PAPI surface (§2.8): the reference's `Processor`/`Transformer` with a
  * `ProcessorContext` (state store access, `forward`, `schedule`
  * punctuation — `processor/Processor.java`, `ProcessorContext.java`,
  * `PunctuationType.java`) mapped onto `flatMapGroupsWithState`:
  * per-key state ≈ the attached KV store, timeouts ≈ punctuators, the
  * returned iterator ≈ multiple `forward` calls.
  *
  * Works over batch (state folds within the batch, no timers) and
  * streaming (incremental state + processing-/event-time timeouts).
  */
object StatefulOps {

  /** Per-record stateful transform with an explicit state type — the
    * `transform(TransformerSupplier, stateStore)` analogue. The handler
    * sees (key, new records, state handle) and forwards 0..n outputs. */
  def flatTransformWithState[K: Encoder, V: Encoder, S: Encoder, OUT: Encoder](
      stream: KStream[K, V],
      outputMode: OutputMode = OutputMode.Append,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      handler: (K, Iterator[(V, Timestamp)], GroupState[S]) => Iterator[OUT]): Dataset[OUT] = {
    implicit val t3: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]
    stream.toDataset
      .groupByKey(_._1)
      .flatMapGroupsWithState[S, OUT](outputMode, timeout) {
        (key: K, rows: Iterator[(K, V, Timestamp)], state: GroupState[S]) =>
          handler(key, rows.map(r => (r._2, r._3)), state)
      }
  }

  /** `suppress(Suppressed.untilTimeLimit(d))`
    * (`kstream/Suppressed.java:148`, buffer eviction in
    * `KTableSuppressProcessor.java:82-107`): hold the latest value per key
    * and emit it only once the delay elapses without a newer update —
    * implemented with processing-time timeouts (the reference's
    * wall-clock-advance eviction). Streaming only.
    *
    * NOTE: processing-time timeouts make Spark schedule follow-up
    * micro-batches continuously (punctuation needs wall-clock progress);
    * run the query with a real `Trigger.ProcessingTime` interval, and
    * don't rely on `processAllAvailable` for quiescence — it may never
    * observe one. */
  def suppressUntilTimeLimit[K: Encoder, V: Encoder](
      stream: KStream[K, V], delayMs: Long): Dataset[(K, V)] = {
    implicit val kvEnc: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    flatTransformWithState[K, V, (K, V), (K, V)](
      stream, OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (key, rows, state) =>
        if (state.hasTimedOut) {
          val out = state.getOption.iterator
          state.remove()
          out
        } else {
          var latest: Option[V] = None
          rows.foreach { case (v, _) => latest = Some(v) }
          latest.foreach { v =>
            state.update((key, v))
            state.setTimeoutDuration(delayMs)
          }
          Iterator.empty
        }
    }
  }

  /** Running deduplication over an id expression — keep-first semantics
    * with per-key seen-state; the streaming analogue of exact dedup (for
    * batch, `dropDuplicates` compiles to the same shape). */
  def dropDuplicatesStateful(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.dropDuplicates(idCols)

  /** Latest-value-per-key as an explicitly-managed state handle — the
    * queryable `KTableSource` materialization via mapGroupsWithState
    * (update mode), for cases where the built-in agg isn't expressive
    * enough. */
  def materializeLatest[K: Encoder, V: Encoder](
      stream: KStream[K, V]): Dataset[(K, V)] = {
    implicit val kvEnc: Encoder[(K, V)] =
      Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[V]])
    implicit val vtEnc: Encoder[(V, Timestamp)] =
      Encoders.tuple(implicitly[Encoder[V]], Encoders.TIMESTAMP)
    implicit val t3: Encoder[(K, V, Timestamp)] = Rec.tupleEnc[K, V]
    stream.toDataset
      .groupByKey(_._1)
      .mapGroupsWithState[(V, Timestamp), (K, V)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, V, Timestamp)], state: GroupState[(V, Timestamp)]) =>
          var current = state.getOption
          rows.foreach { r =>
            if (current.forall(c => !r._3.before(c._2))) current = Some((r._2, r._3))
          }
          current.foreach(state.update)
          (key, current.map(_._1).getOrElse(null.asInstanceOf[V]))
      }
  }
}
