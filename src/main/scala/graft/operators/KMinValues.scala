package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.api.Rec

/** K-minimum-values (KMV / bottom-k) distinct sketch (Bar-Yossef et al.
  * 2002; Beyer et al., SIGMOD 2007) — the sketch class
  * [[HyperLogLog]] does NOT cover: because the summary is an actual
  * sample of the hashed key space (the k smallest distinct hash values),
  * two groups' sketches support SET ALGEBRA — union, intersection and
  * Jaccard estimates between groups — which register sketches cannot do.
  * This is what a corpus intake uses to answer "how much does source A
  * overlap source B?" without ever joining the two key sets.
  *
  * The reference engine has no sketches (its aggregations materialize
  * per-key state; kafkadirect `streams/` aggregates are exact); this is
  * part of the Spark-native analytic layer, with the engine-exactness
  * discipline of [[CountMinSketch]]/[[HyperLogLog]]: keys hash through
  * md5 (`TextFunctions.md5Long`, 60-bit) then drop to 50 bits
  * (`h div 1024`) so every hash is exactly representable in both a
  * BIGINT and an IEEE double (< 2^53 — lets the bounded fold reuse
  * integer-safe buffers), and the estimates are single truncated
  * divisions on the integer grid — bit-reproducible in DuckDB.
  *
  * Estimator (all-integer): with k-th smallest distinct 50-bit hash
  * `h_k`, distinct-count E = ((k-1) · 2^50) div h_k (the classic
  * unbiased KMV estimator on the unit interval, scaled to the hash
  * space); groups with fewer than k distinct hashes report their EXACT
  * count (the sketch saw every value). Union/Jaccard: the k smallest of
  * a union are contained in the union of the two sketches
  * (S_k(A ∪ B) = S_k(S(A) ∪ S(B))), so set estimates need only the two
  * k-row summaries — |A ∪ B| from the union sketch's h_k, Jaccard from
  * the fraction of the union sketch present in both sides, and
  * |A ∩ B| = jaccard · |A ∪ B| (Beyer et al. §4).
  *
  * Scale shape: [[sketch]] is ONE partial-aggregated shuffle — the
  * bounded [[KmvAgg]] buffer dedups on insert, so every map task reduces
  * its slice of a group to ≤ k longs BEFORE the exchange (no
  * corpus-wide `distinct` pre-pass), partials merge exactly (sorted-run
  * merge, cut at k), and the whole summary is |groups| · k longs.
  * In streaming the sorted buffer IS the state: bounded, mergeable,
  * update-mode friendly (q_kmv_distinct_live).
  */
object KMinValues {

  /** Default sketch size: σ ≈ 1/sqrt(k−2) ≈ 6.3% at k = 256; the
    * summary is 2 KB per group. */
  val K = 256

  /** 2^50 — the hash-space size after the 60-bit md5 value drops its
    * low 10 bits; all hashes are < 2^53 (double-exact) and
    * (k−1) · 2^50 stays far inside Long for any practical k. */
  val HashSpace: Long = 1L << 50

  /** Bounded distinct-bottom-k fold: buffer = ascending sorted Vector of
    * at most k DISTINCT hash values. Insert dedups (the KMV "distinct"
    * is free — equal hashes collapse in the buffer, no upstream
    * `dropDuplicates` shuffle), merge is a dedup-merge of two sorted
    * runs cut at k — associative, commutative, partitioning-independent
    * (KMinValuesSpec pins mergeability). */
  private[graft] final class KmvAgg(k: Int)
      extends Aggregator[(String, Long), Seq[Long], Seq[Long]] {
    require(k > 0, s"KMV needs k > 0, got $k")

    def zero: Seq[Long] = Vector.empty

    def reduce(buf: Seq[Long], r: (String, Long)): Seq[Long] = {
      val h = r._2
      if (buf.size >= k && h >= buf.last) buf // loses to the worst kept
      else {
        val at = buf.indexWhere(_ >= h)
        if (at >= 0 && buf(at) == h) buf // already present (distinct semantics)
        else {
          val p = if (at < 0) buf.size else at
          ((buf.take(p) :+ h) ++ buf.drop(p)).take(k)
        }
      }
    }

    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val out = Vector.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      var last = Long.MinValue
      while (n < k && (i < a.size || j < b.size)) {
        val v =
          if (j >= b.size || (i < a.size && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (v != last || n == 0) { out += v; last = v; n += 1 }
      }
      out.result()
    }

    def finish(buf: Seq[Long]): Seq[Long] = buf

    def bufferEncoder: Encoder[Seq[Long]] = Rec.seqEnc(Encoders.scalaLong)
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Spark-side 50-bit md5 hash of a string column — kept as ONE SQL
    * expression so codegen fuses hash + truncate; DuckDB mirror:
    * `CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) // 1024`. */
  def hash50(c: String): org.apache.spark.sql.Column =
    // digest-direct kernel (r15), bit-identical; the value is
    // non-negative (60-bit) so `div 1024` == shiftright 10 exactly
    shiftright(graft.plans.NativeHash.md5Long60(expr(c).cast("string")), 10)

  /** Per-group KMV state: (groupCol, kmv array<bigint>) — ONE
    * partial-agg'd typed aggregation to a ≤ k-long ascending array per
    * group. This un-exploded form is the STREAMING surface too: a
    * `groupByKey.agg` whose state is the bounded buffer, sinkable in
    * complete mode with nothing after the aggregation
    * (q_kmv_distinct_live). `itemCol` must be a string column (hashing
    * goes through md5 of its exact bytes). */
  def sketchState(items: DataFrame, itemCol: String, groupCol: String,
      k: Int = K): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val agg = new KmvAgg(k).toColumn.name("kmv")
    items
      .select(col(groupCol).cast("string"), hash50(itemCol))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg)
      .toDF(groupCol, "kmv")
  }

  /** Explode a [[sketchState]] table to (groupCol, h, rank) rows, rank
    * 1-based ascending (the buffer is sorted by construction). */
  def fromState(state: DataFrame, groupCol: String): DataFrame =
    state
      .select(col(groupCol), posexplode(col("kmv")).as(Seq("__i", "h")))
      .select(col(groupCol), col("h"), (col("__i") + 1L).as("rank"))

  /** Per-group KMV summary: (groupCol, h, rank) — the ≤ k smallest
    * distinct 50-bit hashes of `itemCol`, rank 1-based ascending. */
  def sketch(items: DataFrame, itemCol: String, groupCol: String,
      k: Int = K): DataFrame =
    fromState(sketchState(items, itemCol, groupCol, k), groupCol)

  /** Distinct-count estimate per group from a [[sketch]] table:
    * E = ((k−1) · 2^50) div h_k when the sketch is full, else the exact
    * buffer size. Emits (groupCol, n_sketch, kmv_estimate). */
  def estimate(sk: DataFrame, groupCol: String, k: Int = K): DataFrame =
    sk.groupBy(groupCol)
      .agg(count(lit(1)).as("n_sketch"), max(when(col("rank") === k, col("h"))).as("__hk"))
      .select(col(groupCol), col("n_sketch"),
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(s"${(k - 1).toLong * HashSpace} div __hk"))
          .as("kmv_estimate"))
}
