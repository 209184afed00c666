package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the salting patterns that keep a 100 TB
  * shuffle from collapsing onto one reducer. AQE's skew-join handles
  * moderate skew at runtime; salting is the explicit tool for known-hot
  * keys (null keys, power-law entities, stopword shingles). */
object SkewOps {

  /** Two-phase (salted) aggregation: spread each key over `saltFactor`
    * partial groups, aggregate, then combine partials. Use for algebraic
    * aggregates whose partial results merge (sum/count/min/max arrays...).
    *
    * partialExprs aggregate raw rows per (key, salt); mergeExprs combine
    * the partials per key — e.g. partial `sum(x) as s` then merge
    * `sum(s) as s`. */
  def saltedAggregate(df: DataFrame, keyCol: String, saltFactor: Int,
      partialExprs: Seq[Column], mergeExprs: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltFactor)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(partialExprs.head, partialExprs.tail: _*)
      .groupBy(col(keyCol))
      .agg(mergeExprs.head, mergeExprs.tail: _*)

  /** Skew-safe broadcast-replicated join: replicate the (small) right side
    * `saltFactor` times and salt the big side's key so one hot key spreads
    * over `saltFactor` reducers. Only needed when the right side is too
    * big to broadcast outright but small enough to replicate; for
    * broadcastable dims use broadcast() directly. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val rep = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(rep,
        saltedBig(bigKey) === rep(smallKey) && saltedBig("__salt") === rep("__salt"))
      .drop("__salt")
  }
}
