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

  // ------------------- integer-grid variant (oracle-exact training) ----

  /** Micro-grid logistic model: weights and bias in 1e-6 units. */
  final case class LrModelMicro(wMicro: Array[Long], biasMicro: Long)

  /** Sigmoid lookup table: σ over [−8.192, 8.192) in 4096 cells of width
    * 0.004, midpoint-sampled, in micro units. Precomputed ONCE here and
    * interpolated as integer literals into both the Spark expression and
    * the DuckDB oracle (the HyperLogLog.LcTable discipline), so neither
    * engine evaluates exp() at query time and the whole training loop is
    * bit-identical cross-engine. Piecewise-constant σ costs ≤ 1e-3
    * absolute — irrelevant to a linear probe, decisive for determinism. */
  val SigTable: IndexedSeq[Long] = (0 until 4096).map(i =>
    math.round(1e6 / (1.0 + math.exp(8.192 - (i + 0.5) * 0.004))))

  /** Embedding quantized ONCE to the 1e-6 grid (the PowerIteration
    * recipe): float→double is exact, round is ties-away-from-zero in
    * both engines. */
  private def quantCol(embCol: Column): Column =
    transform(embCol.cast("array<double>"), x => round(x * 1e6).cast("long"))

  /** Per-row micro margin + table sigmoid columns (shared by train and
    * score): mm = bias + (Σ wᵈ·xqᵈ) div 1e6, idx = clipped cell, all
    * BIGINT with truncated division — DuckDB `//` and Scala `/` agree on
    * negatives. Expects an `xq` column. */
  private def withMarginMicro(df: DataFrame, w: Array[Long],
      bias: Long): DataFrame =
    df.withColumn("dot",
        // codegen'd integer dot kernel (r15) — bit-identical to the
        // interpreted zip_with+aggregate fold it replaces
        graft.plans.NativeVector.dotI64(col("xq"), typedLit(w.toSeq)))
      .withColumn("mm", lit(bias) + expr("dot div 1000000"))
      .withColumn("idx", expr(
        "cast((least(greatest(mm, -8192000), 8191999) + 8192000) div 4000 as int)"))

  /** [[trainLogistic]] re-founded on the 1e-6 integer grid end to end:
    * quantized inputs, BIGINT weights, table sigmoid, truncated-division
    * updates (lr = 1/2 is the division). Same one-scan-per-iteration
    * shape (dim+1 partial-agg'd longs cross the wire); beyond
    * partition-independence, training is now BIT-IDENTICAL in DuckDB, so
    * the classifier carries a full hash oracle (q_quality_classifier).
    * Label column must hold 0/1 longs. */
  def trainLogisticMicro(df: DataFrame, embCol: String, labelCol: String,
      iters: Int = 3): LrModelMicro = {
    val dim = df.select(size(col(embCol))).head().getInt(0)
    val n = df.count()
    require(n > 0, "trainLogisticMicro: empty input")
    val sig = typedLit(SigTable)
    val w = Array.fill(dim)(0L)
    var bias = 0L
    for (_ <- 0 until iters) {
      val base = withMarginMicro(
        df.select(col(labelCol).as("y"), quantCol(col(embCol)).as("xq")),
        w, bias)
        .withColumn("err", element_at(sig, col("idx") + 1) - col("y") * 1000000L)
      val sums = base
        .select(posexplode(concat(array(col("err")),
          expr("transform(xq, x -> (err * x) div 1000000)"))).as(Seq("pos", "g")))
        .groupBy("pos").agg(sum("g").as("gs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val den = 2L * n // lr = 1/2 folded into the truncated division
      bias -= sums(0) / den
      var j = 0
      while (j < dim) { w(j) -= sums(j + 1) / den; j += 1 }
    }
    LrModelMicro(w, bias)
  }

  /** Map-only scoring on the micro grid: `score_micro` = table sigmoid of
    * the margin, `pred` = score_micro >= 500000. Zero shuffle. */
  def scoreMicro(df: DataFrame, embCol: String, m: LrModelMicro): DataFrame =
    withMarginMicro(df.withColumn("xq", quantCol(col(embCol))),
      m.wMicro, m.biasMicro)
      .withColumn("score_micro", element_at(typedLit(SigTable), col("idx") + 1))
      .withColumn("pred", col("score_micro") >= 500000L)
      .drop("xq", "dot", "mm", "idx")
}
