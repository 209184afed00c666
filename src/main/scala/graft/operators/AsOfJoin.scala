package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of (point-in-time) join: every left row picks up the most
  * recent right row with `right.ts <= left.ts` for its key — the batch
  * twin of the live stream⋈table enrichment join
  * (`kstream/internals/KStreamKTableJoinProcessor.java:55-76` semantics
  * replayed over history).
  *
  * Spark has no native ASOF join, and the range-join formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + max) explodes to O(|L|·|R|)
  * pairs per key before pruning. This implementation UNIONS the two
  * sides and fills the right payload with `last(_, ignoreNulls)` over a
  * (ts, side)-ordered window — ONE shuffle on the key, linear work, no
  * pair fan-out, which is what survives at 100 TB. Right rows at equal
  * ts apply before left rows (inclusive as-of; the same tie rule as the
  * streaming join).
  *
  * Recorded bound (SCALE.md "As-of join"): one KEY's full history lands
  * in one task — inherent to as-of ordering, same bound as the
  * reference's single-thread scan; the frame is running (linear) and
  * spillable. Escape hatch for ≫10⁸-row keys: (key, ts-range) bucketing
  * with a boundary-row carry-over between buckets.
  */
object AsOfJoin {

  /** Backward as-of join. `payload` names the right-side columns to carry
    * over (they must not collide with left column names); left rows with
    * no prior right row get nulls — filter them for inner semantics. */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    join(left, right, key, leftTs, rightTs, payload, forwardDir = false)

  /** Forward as-of join: every left row picks up the EARLIEST right row
    * with `right.ts >= left.ts` — "next event after" semantics
    * (conversion after impression, repair after failure). Same
    * single-shuffle shape, mirrored window direction. */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    join(left, right, key, leftTs, rightTs, payload, forwardDir = true)

  private def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      forwardDir: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val lCols = left.columns.toSeq
    // the payload travels as ONE struct so the as-of pick is atomic per
    // right row — independent per-column last() would compose a row out
    // of different right rows whenever a payload value is null
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left.select(
      col(key).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        (lCols.map(col) :+ lit(null).cast(pType).as("__p")): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        (lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("__p")): _*)
    // BOTH directions run an unbounded-PRECEDING running frame (Spark
    // accumulates it in O(n) per partition; an unbounded-FOLLOWING frame
    // would recompute per row = O(n^2) on hot keys). Forward direction =
    // the same accumulation walked in descending event time. Right rows
    // order before left rows on ts ties (side 0 < 1), keeping the join
    // inclusive in both directions.
    val ordered = Window.partitionBy("__k")
      .orderBy(if (forwardDir) col("__t").desc else col("__t").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col("__side") +: (lCols.map(col) :+
        last(col("__p"), ignoreNulls = true).over(ordered).as("__p")): _*)
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
