package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocking for time-series similarity search over per-user hour-of-day
  * activity vectors. The candidate key is COMPOSED: (peak hour, 2nd-peak
  * hour) — a single peak hour yields only ~24 buckets (n/24 users each,
  * pair generation quadratic again at extreme user counts); the composed
  * key yields up to 24×24 = 576 buckets with the same equi-join shape.
  * Tighter blocking is the standard recall trade: a pair whose 2nd/3rd
  * busiest hours are a one-count near-tie can land in different buckets
  * and never be compared, even though single-peak blocking would have
  * caught it — acceptable for "find similar users", and the knob
  * composes (drop back to the single-peak key, or add a norm band, per
  * corpus). Users active in a single distinct hour get peak2 = -1, so
  * they remain comparable among themselves. Rescoring after blocking is
  * exact integer distance — blocking only bounds who gets compared, not
  * how. */
object TimeSeriesBlocking {

  /** (user_id, peak_h, peak2_h) from hourly counts (user_id, h, n).
    * Ties break on the later hour, matching the oracle's
    * row_number() ORDER BY n DESC, h DESC. */
  def peaks(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("h").desc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("user_id")
      .agg(max(when(col("rn") === 1, col("h"))).as("peak_h"),
        coalesce(max(when(col("rn") === 2, col("h"))), lit(-1)).as("peak2_h"))
  }

  /** Ordered candidate pairs (ua < ub) within a composed-key bucket. */
  def candidates(peaks: DataFrame): DataFrame =
    peaks.select(col("user_id").as("ua"), col("peak_h"), col("peak2_h"))
      .join(peaks.select(col("user_id").as("ub"), col("peak_h"), col("peak2_h")),
        Seq("peak_h", "peak2_h"))
      .filter(col("ua") < col("ub"))
      .select(col("ua"), col("ub"), col("peak_h"))
}
