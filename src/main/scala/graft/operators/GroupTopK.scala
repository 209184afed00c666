package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.api.Rec

/** Bounded per-group top-k selection over STRING-keyed items with
  * integer scores — the sibling of [[TopK]] (which serves the ANN hot
  * path: Long ids, Double scores, no streaming surface). Same scale
  * argument: a `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
  * window ships every (group, item, score) row of a group to one task
  * and sorts it; this typed aggregation reduces each map task's slice to
  * a k-entry buffer BEFORE the exchange (top-k distributes over union:
  * topK(A ∪ B) = topK(topK(A) ∪ topK(B))), so per-group network cost is
  * #partitions·k rows and no task ever holds a whole group.
  *
  * What this variant adds over [[TopK]]:
  *   - string items and groups (vocabulary words, doc ids as strings) on
  *     an all-integer score grid — oracle-exact with no double rounding;
  *   - an un-exploded STATE surface ([[topKState]]/[[fromState]], the
  *     [[KMinValues]] pattern): the buffer is a legal streaming
  *     aggregation state, bounded at k entries per group forever and
  *     sinkable in complete mode (q_weighted_sample_live).
  *
  * Ordering contract (what makes the result oracle-exact rather than
  * merely "some top k"): score descending (or ascending with
  * `smallestFirst`), ties broken by item string ascending — exactly the
  * order `ORDER BY n DESC, item` / `ORDER BY n ASC, item` produces, so a
  * DuckDB row_number window mirrors the selection bit-for-bit (ASCII
  * string comparison agrees across Scala and DuckDB).
  *
  * Input contract: ONE row per (group, item) — pre-aggregate scores
  * first (e.g. `groupBy(g, item).count`). Partial top-k over partial
  * counts would not be top-k of totals.
  */
object GroupTopK {

  /** Bounded best-first fold: buffer = Seq of at most k (item, score)
    * entries, sorted best-first under the (score, item) order. Insert is
    * a linear scan (k is small by contract); merge is a merge of two
    * best-first runs cut at k — associative, commutative,
    * partitioning-independent (GroupTopKSpec pins bit-equality). */
  private[graft] final class GroupTopKAgg(k: Int, smallestFirst: Boolean)
      extends Aggregator[(String, String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
    require(k > 0, s"GroupTopK needs k > 0, got $k")

    /** Strict "a ranks before b" under score order then item asc. */
    private def beats(a: (String, Long), b: (String, Long)): Boolean =
      if (a._2 != b._2) { if (smallestFirst) a._2 < b._2 else a._2 > b._2 }
      else a._1 < b._1

    def zero: Seq[(String, Long)] = Vector.empty

    def reduce(buf: Seq[(String, Long)], r: (String, String, Long)): Seq[(String, Long)] = {
      val e = (r._2, r._3)
      if (buf.size >= k && !beats(e, buf.last)) buf // loses to the worst kept
      else {
        val at = buf.indexWhere(b => beats(e, b))
        val p = if (at < 0) buf.size else at
        ((buf.take(p) :+ e) ++ buf.drop(p)).take(k)
      }
    }

    def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] = {
      val out = Vector.newBuilder[(String, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        if (j >= b.size || (i < a.size && !beats(b(j), a(i)))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

    def bufferEncoder: Encoder[Seq[(String, Long)]] =
      Rec.seqEnc(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    def outputEncoder: Encoder[Seq[(String, Long)]] = bufferEncoder
  }

  /** Per-group top-k state: (groupCol, topk array<struct<_1,_2>>) — ONE
    * partial-agg'd typed aggregation to a ≤ k-entry best-first buffer
    * per group. This un-exploded form is the STREAMING surface: a
    * `groupByKey.agg` whose state is the bounded buffer, sinkable in
    * complete mode (q_weighted_sample_live). `itemCol` must cast to
    * string; `scoreCol` to long. */
  def topKState(df: DataFrame, groupCol: String, itemCol: String,
      scoreCol: String, k: Int, smallestFirst: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new GroupTopKAgg(k, smallestFirst).toColumn.name("topk")
    df.select(col(groupCol).cast("string"), col(itemCol).cast("string"),
        col(scoreCol).cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .agg(agg)
      .toDF(groupCol, "topk")
  }

  /** Explode a [[topKState]] table to (groupCol, rank, item, score)
    * rows, rank 1-based best-first. */
  def fromState(state: DataFrame, groupCol: String): DataFrame =
    state
      .select(col(groupCol), posexplode(col("topk")).as(Seq("__i", "__e")))
      .select(col(groupCol), (col("__i") + 1L).as("rank"),
        col("__e._1").as("item"), col("__e._2").as("score"))

  /** Per-group top-k rows: (groupCol, rank, item, score), rank 1-based
    * in (score desc|asc, item asc) order. */
  def topK(df: DataFrame, groupCol: String, itemCol: String,
      scoreCol: String, k: Int, smallestFirst: Boolean = false): DataFrame =
    fromState(topKState(df, groupCol, itemCol, scoreCol, k, smallestFirst),
      groupCol)
}
