package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression over an embedding column — the linear
  * probe behind embedding-gated document curation (the FineWeb-Edu shape,
  * arXiv:2406.17557 §3.2: score documents with a small classifier over
  * frozen embeddings, keep the top band).
  *
  * Built for determinism at cluster scale: each full-batch gradient-descent
  * iteration quantizes the per-row gradient contribution to fixed-point
  * longs (`round(g * scale)`) and sums LONGS, not doubles — integer
  * addition is associative and commutative, so the learned weights are
  * bit-identical for any partition count, task order, or executor fleet
  * (the same trick as DSIR's BIGINT-exact keep bit). The driver holds only
  * `dim + 1` longs per iteration; everything per-row stays codegen'd
  * column expressions plus one partial-aggregated shuffle of `dim + 1`
  * keys per iteration. At 100 TB each iteration is one linear scan.
  *
  * The reference engine has no model-training operator — record-level
  * computation is user lambdas (`streams/.../kstream/ValueMapper.java`);
  * this is a Spark-native analytics addition on top of parity.
  */
object LinearModel {

  /** Learned weights. `w.length` = embedding dim; prediction is
    * `sigmoid(bias + w·x)`. */
  final case class LrModel(w: Array[Double], bias: Double)

  /** `bias + w·x` as a column expression (broadcast-free: the weights are
    * literals riding the plan, so scoring is a map-only codegen'd pass). */
  private def marginCol(embCol: Column, w: Array[Double], bias: Double): Column =
    aggregate(
      zip_with(embCol.cast("array<double>"), typedLit(w.toSeq),
        (x, wi) => x * wi),
      lit(bias), (a, x) => a + x)

  /** Train by `iters` full-batch GD steps at learning rate `lr`.
    *
    * Gradient of the log-loss for row (x, y): `(sigmoid(margin) - y) * x`
    * (and `sigmoid(margin) - y` for the bias). Each component is quantized
    * per row to `round(g * scale)` longs; the shuffled sum of longs makes
    * the update order-independent, so training is deterministic across
    * partitionings. Labels must be 0.0/1.0 doubles.
    */
  def trainLogistic(df: DataFrame, embCol: String, labelCol: String,
      iters: Int = 5, lr: Double = 0.5, scale: Double = 1e6): LrModel = {
    val first = df.select(size(col(embCol))).head().getInt(0)
    val n = df.count()
    require(n > 0, "trainLogistic: empty input")
    val w = Array.fill(first)(0.0)
    var bias = 0.0
    for (_ <- 0 until iters) {
      val err = lit(1.0) /
        (lit(1.0) + exp(-marginCol(col(embCol), w, bias))) - col(labelCol)
      // slot 0 = bias gradient, slot j+1 = weight j; ONE partial-agg'd
      // shuffle of dim+1 keys per iteration, driver receives dim+1 longs
      val qgrad = concat(
        array(round(err * scale).cast("long")),
        transform(col(embCol).cast("array<double>"),
          x => round(err * x * scale).cast("long")))
      val sums = df.select(posexplode(qgrad).as(Seq("pos", "g")))
        .groupBy("pos").agg(sum("g").as("gs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val denom = n * scale
      bias -= lr * sums(0) / denom
      var j = 0
      while (j < first) { w(j) -= lr * sums(j + 1) / denom; j += 1 }
    }
    LrModel(w, bias)
  }

  /** Score every row map-side: `score` = sigmoid(bias + w·x), `pred` =
    * score >= 0.5. Zero shuffle. */
  def score(df: DataFrame, embCol: String, model: LrModel): DataFrame = {
    val m = marginCol(col(embCol), model.w, model.bias)
    df.withColumn("score", lit(1.0) / (lit(1.0) + exp(-m)))
      .withColumn("pred", col("score") >= 0.5)
  }
}
