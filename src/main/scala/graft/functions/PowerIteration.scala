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
  * ALL-INTEGER variant of the classic power method on the Gram matrix
  * C = XᵀX (never materialized). Every quantity lives in 1e-6 micro
  * units as BIGINT, including the between-iteration renormalization
  * (integer sqrt + truncated division), so the whole loop is bit-exact
  * under any partitioning AND arithmetically mirrorable by another SQL
  * engine (the q_pagerank_dupgraph recipe). Per iteration:
  *   1. map: dm = (Σⱼ xmⱼ·vmⱼ) div 1e6 per row — codegen'd
  *      `aggregate`/`zip_with` over the once-quantized xm array, no UDF,
  *   2. contribution cm = (xmᵢ·dm) div 1e6 per position, summed as
  *      BIGINT — order-independent, so bit-identical under any merge
  *      order (the LinearModel/UnigramLm discipline),
  *   3. the dim-sized micro vector collects to the driver (bounded by
  *      contract: dim longs, never corpus-sized), renormalizes on the
  *      exact integer grid (BigInt isqrt of Σ raw², then truncated
  *      division — both operations any engine reproduces exactly), and
  *      ships back in the next iteration's closure.
  *
  * Deterministic throughout: init = uniform micro vector
  * 1e12 div isqrt(dim·1e12); sign fixed so the largest-|loading|
  * position is positive (ties → smallest position).
  */
object PowerIteration {

  /** Integer sqrt: greatest n with n² ≤ s (exact, Newton on BigInt). */
  def isqrt(s: BigInt): BigInt = {
    require(s >= 0)
    if (s < 2) s
    else {
      var x = BigInt(math.sqrt(s.doubleValue).toLong + 2)
      var prev = BigInt(-1)
      while (x != prev) { prev = x; x = (x + s / x) >> 1 }
      while (x * x > s) x -= 1
      while ((x + 1) * (x + 1) <= s) x += 1
      x
    }
  }

  /** Core loop on the micro grid.
    * @return (component in 1e-6 units, length dim; explained-variance
    *         ratio in 1e-6 units: 1e6·vᵀCv / trace(C)). */
  def topComponentMicro(df: DataFrame, embCol: String, iters: Int): (Array[Long], Long) = {
    require(iters >= 1)
    val M = 1000000L
    val dim = df.select(size(col(embCol))).head().getInt(0)
    // quantize the corpus ONCE: xm = round(x · 1e6) per position
    val xm = df.select(
      transform(col(embCol), x => round(x.cast("double") * lit(1e6)).cast("long"))
        .as("xm"))
    // v0 = uniform 1/√dim on the micro grid
    var vm: Array[Long] =
      Array.fill(dim)((BigInt(M) * M / isqrt(BigInt(dim) * M * M)).toLong)
    var lambdaMicro = 0L
    for (_ <- 1 to iters) {
      val withV = xm.withColumn("vm", lit(vm))
      val contrib = withV
        .select(col("xm"),
          // codegen'd integer dot kernel (r15) — bit-identical fold
          (graft.plans.NativeVector.dotI64(col("xm"), col("vm")))
            .as("__d"))
        .select(col("xm"), expr("__d div 1000000").as("dm"))
        .select(posexplode(col("xm")).as(Seq("pos", "x")), col("dm"))
        .select(col("pos"), expr("(x * dm) div 1000000").as("cm"))
        .groupBy("pos").agg(sum("cm").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val raw = Array.tabulate(dim)(i => contrib.getOrElse(i, 0L))
      // Rayleigh numerator vᵀCv = v · (Cv), truncated back to micro units.
      // BigInt throughout: Scala BigInt `/` truncates toward zero, the
      // same semantics as SQL integral division.
      lambdaMicro =
        (raw.indices.map(i => BigInt(raw(i)) * vm(i)).sum / M).toLong
      val nrm = isqrt(raw.map(x => BigInt(x) * x).sum)
      require(nrm > 0, "power iteration collapsed: zero Gram product")
      vm = raw.map(x => (BigInt(x) * M / nrm).toLong)
    }
    // deterministic sign: largest-|loading| position points positive
    val pivot = vm.indices.maxBy(i => (math.abs(vm(i)), -i))
    if (vm(pivot) < 0L) vm = vm.map(x => -x)
    val trace = traceMicro(xm)
    val ratioMicro =
      if (trace == 0L) 0L else (BigInt(lambdaMicro) * M / trace).toLong
    (vm, ratioMicro)
  }

  /** Double-facing wrapper (loadings = micro/1e6 — exact IEEE division
    * of exact integers, so still deterministic). */
  def topComponent(df: DataFrame, embCol: String, iters: Int): (Array[Double], Long) = {
    val (vm, ratioMicro) = topComponentMicro(df, embCol, iters)
    (vm.map(_.toDouble / 1e6), ratioMicro)
  }

  /** trace(C) = Σ rows (Σⱼ xmⱼ²) div 1e6 — micro units, BIGINT,
    * order-independent (per-row truncation before the corpus sum, so
    * another engine reproduces it row by row). */
  private def traceMicro(xm: DataFrame): Long =
    xm.select(graft.plans.NativeVector.dotI64(col("xm"), col("xm")).as("__n2"))
      .select(expr("__n2 div 1000000").as("n2"))
      .agg(sum("n2")).head().getLong(0)
}
