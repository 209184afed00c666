package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column by distributed power
  * iteration — the whitening/drift diagnostic an embedding pipeline runs
  * before indexing (a dominant component concentrating most variance
  * usually means un-centered vectors or a collapsed encoder).
  *
  * The reference engine has no vector analytics (all record-level
  * computation is user lambdas); this extends the Spark-native embedding
  * toolset (VectorIndex / ProductQuantizer / SemDedup).
  *
  * Shape per iteration (classic power method on the Gram matrix C = XᵀX
  * without materializing C):
  *   1. map: d = x·v per row (codegen'd `aggregate`/`zip_with`, no UDF),
  *   2. contribution x_i·d per position, QUANTIZED to 1e-6 units and
  *      summed as BIGINT — sums are order-independent, so the result is
  *      bit-identical under any partitioning (the LinearModel/UnigramLm
  *      discipline; a double sum would drift with the merge order),
  *   3. the dim-sized micro-count vector collects to the driver (bounded
  *      by contract: dim doubles, never corpus-sized), renormalizes, and
  *      ships back in the next iteration's closure.
  *
  * Deterministic throughout: init = uniform unit vector, sign fixed so
  * the largest-|loading| position is positive.
  */
object PowerIteration {

  /** @return (unit component of length dim, explained-variance ratio in
    *         micro units: 1e6 · vᵀCv / trace(C), both from quantized
    *         integer sums). */
  def topComponent(df: DataFrame, embCol: String, iters: Int): (Array[Double], Long) = {
    require(iters >= 1)
    val dim = df.select(size(col(embCol))).head().getInt(0)
    var v: Array[Double] = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambdaMicro = 0L
    for (_ <- 1 to iters) {
      val dCol = aggregate(
        zip_with(col(embCol), lit(v), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, y) => acc + y)
      val contrib = df.select(col(embCol), dCol.as("__d"))
        .select(posexplode(col(embCol)).as(Seq("pos", "x")), col("__d"))
        .select(col("pos"),
          round(col("x").cast("double") * col("__d") * lit(1e6))
            .cast("long").as("cm"))
        .groupBy("pos").agg(sum("cm").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val raw = Array.tabulate(dim)(i => contrib.getOrElse(i, 0L).toDouble / 1e6)
      // Rayleigh numerator vᵀCv = v · (Cv) in the quantized algebra
      lambdaMicro = math.round(
        raw.indices.map(i => raw(i) * v(i)).sum * 1e6)
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      require(nrm > 0.0, "power iteration collapsed: zero Gram product")
      v = raw.map(_ / nrm)
    }
    // deterministic sign: largest-|loading| position points positive
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0.0) v = v.map(-_)
    val trace = traceMicro(df, embCol)
    val ratioMicro = if (trace == 0L) 0L else lambdaMicro * 1000000L / trace
    (v, ratioMicro)
  }

  /** trace(C) = Σ‖x‖² in 1e-6 units (BIGINT, order-independent). */
  private def traceMicro(df: DataFrame, embCol: String): Long =
    df.select(
      round(aggregate(col(embCol), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")) * lit(1e6))
        .cast("long").as("n2"))
      .agg(sum("n2")).head().getLong(0)
}
