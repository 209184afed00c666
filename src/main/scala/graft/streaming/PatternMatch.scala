package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.api.KStream

/** Streaming CEP — Flink-CEP / MATCH_RECOGNIZE territory the reference
  * DSL lacks: a caller-supplied DFA runs over each key's records in
  * event-time order and counts accepting transitions, incrementally
  * across micro-batches (the automaton state IS the stream state, so a
  * pattern may span batches). The batch twin is `q_pattern_match`'s
  * regex over the materialized type-string.
  *
  * State per key = (dfa state, accept count, max ts, seq) — constant
  * size, unbounded-stream safe; the monotone `seq` lets sinks pick each
  * key's final emission deterministically. */
object PatternMatch {

  /** Per-key DFA fold: `step(state, value) => (nextState, accepted)`.
    * Emits the refreshed (key, count, maxTs, seq) per updated key per
    * micro-batch. */
  def countStream[K: Encoder, V: Encoder](ks: KStream[K, V], init: Int)(
      step: (Int, V) => (Int, Boolean)): Dataset[(K, Long, Timestamp, Long)] = {
    implicit val stateEnc: Encoder[(Int, Long, Timestamp, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, Encoders.TIMESTAMP,
        Encoders.scalaLong)
    implicit val outEnc: Encoder[(K, Long, Timestamp, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong, Encoders.TIMESTAMP,
        Encoders.scalaLong)
    val stepFn = step
    val initState = init
    ks.toDataset
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long, Timestamp, Long), (K, Long, Timestamp, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, rows, state) =>
        var (dfa, count, maxTs, seq) =
          state.getOption.getOrElse((initState, 0L, null: Timestamp, 0L))
        rows.toSeq.sortBy(r => (r._3.getTime, r._3.getNanos)).foreach { r =>
          val (next, accepted) = stepFn(dfa, r._2)
          dfa = next
          if (accepted) count += 1
          if (maxTs == null || r._3.after(maxTs)) maxTs = r._3
        }
        seq += 1
        state.update((dfa, count, maxTs, seq))
        Iterator.single((k, count, maxTs, seq))
      }
  }
}
