package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a key column —
  * the bounded-memory heavy-hitter / frequency summary a corpus intake
  * keeps when the exact (key, count) table would itself be a dataset
  * (trillions of distinct n-grams at 100 TB).
  *
  * The reference engine has no sketches (its aggregations materialize
  * per-key state); this is part of the Spark-native analytic layer.
  *
  * Scale shape:
  *   - `build` is ONE hash agg over (row, bucket) — depth·width cells
  *     regardless of corpus size or key cardinality, so the result
  *     broadcasts anywhere. Cell counts are BIGINT sums: mergeable,
  *     order-independent, bit-identical under any partitioning, and a
  *     union corpus's sketch is the cell-wise SUM of the parts'
  *     (CountMinSketchSpec pins all three).
  *   - `estimate` joins the query batch against the broadcast cell
  *     table: min over depth rows, never touching the corpus again.
  *   - Hashes route through md5 (TextFunctions.md5Long), so DuckDB
  *     reproduces the sketch — and therefore the estimates — exactly
  *     (q_heavy_hitters_cms), unlike seeded murmur families.
  *
  * Classic guarantee: estimate >= true count always (only over-counts
  * from collisions); overestimate <= 2·N/width with prob 1 - 2^-depth.
  */
object CountMinSketch {

  /** One bucket key per (depth row, item): md5(r:item) mod width —
    * md5Long is a 60-bit non-negative value, so `%` is a true mod. */
  private def bucket(r: org.apache.spark.sql.Column,
      item: org.apache.spark.sql.Column, width: Int) =
    T.md5Long(concat(r.cast("string"), lit(":"), item)) % width

  /** The d×w cell table: (r, bucket, cnt), one row per NON-EMPTY cell
    * (missing cell = 0). One explode(depth) + hash agg. */
  def build(items: DataFrame, itemCol: String, width: Int, depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1)
    items
      .select(col(itemCol).as("__item"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .groupBy(col("r"), bucket(col("r"), col("__item"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a query batch: min over the depth cells each
    * item hashes to (absent cell = 0). The sketch is depth·width rows by
    * contract and broadcasts. */
  def estimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      width: Int, depth: Int): DataFrame = {
    val probes = queries
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", bucket(col("r"), col(itemCol), width))
    probes
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(probes.columns.filterNot(Set("r", "bucket")).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
