package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, cluster size, and re-runs — useless for reproducible
  * corpus construction at 100 TB. These helpers decide keep/drop from a
  * salted hash of a stable row id instead: the same row gets the same
  * decision everywhere, re-runs are identical, engines agree (md5-based,
  * so a SQL oracle can mirror the exact sample), and changing the salt
  * draws a fresh independent sample.
  */
object Sampling {
  private val Scale = 1000000L

  /** Keep-decision at `fraction` (a [0,1] literal or per-row column —
    * pass a column for stratified rates, e.g. by language). */
  def keep(id: Column, salt: String, fraction: Column): Column =
    TextFunctions.md5Long(concat(id.cast("string"), lit(salt))) % Scale <
      (fraction * Scale).cast("long")

  /** Deterministic bernoulli sample of a DataFrame. */
  def sample(df: org.apache.spark.sql.DataFrame, idCol: String, salt: String,
      fraction: Double): org.apache.spark.sql.DataFrame =
    df.filter(keep(col(idCol), salt, lit(fraction)))

  /** Salted-hash bucket in [0, 100) — the basis for N-way splits. */
  def bucket100(id: Column, salt: String): Column =
    TextFunctions.md5Long(concat(id.cast("string"), lit(salt))) % 100

  /** Deterministic N-way split assignment: `cuts` are (name, percent)
    * with percents summing to 100; the bucket maps through cumulative
    * cuts, so enlarging one split keeps every other row's assignment
    * stable (the holdout never leaks into train on a re-cut). */
  def splitAssign(id: Column, salt: String, cuts: Seq[(String, Int)]): Column = {
    require(cuts.map(_._2).sum == 100, "split percents must sum to 100")
    val b = bucket100(id, salt)
    val (_, assigned) = cuts.foldLeft((0, lit(null).cast("string"))) {
      case ((acc, e), (name, pct)) =>
        (acc + pct, when(e.isNull && b < acc + pct, name).otherwise(e))
    }
    assigned
  }
}
