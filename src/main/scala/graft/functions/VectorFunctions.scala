package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.NativeVector

/** Embedding/vector column functions (`Array[Float]` columns).
  *
  * The arithmetic kernels (dot/cosine/sqdist) are codegen'd Catalyst
  * Expressions (`graft.plans.VectorKernels`) — one tight loop per row over
  * the unsafe array data. The equivalent higher-order-function column
  * formulations are kept as `*Hof` for the bit-exactness spec: both
  * accumulate in double precision in strict left-to-right element order,
  * so results are bitwise identical (and deterministic across engines and
  * cluster sizes, which the oracle checks rely on).
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column = NativeVector.dotF32(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = NativeVector.cosineF32(a, b)

  /** Cosine from a fresh dot product and PRE-COMPUTED norms
    * (`na = sqrt(dot(a,a))`, once per vector instead of once per pair) —
    * bit-identical to [[cosine]]: the same `dot / (sqrt(da) * sqrt(db))`
    * IEEE sequence with the same zero-denominator rule, but the two norm
    * folds leave the per-pair hot path (r15, guide §1.2: the pair stages
    * evaluate this over ~nProbe·N/k candidate rows). */
  def cosineFromNorms(dot: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(0.0)).otherwise(dot / denom)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column = NativeVector.sqDistF32(a, b)

  /** HOF reference formulation of [[dotProduct]] (spec-only). */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** HOF reference formulation of [[cosine]] (spec-only). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = sqrt(dotProductHof(a, a)) * sqrt(dotProductHof(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dotProductHof(a, b) / denom)
  }

  /** HOF reference formulation of [[sqDist]] (spec-only). */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Coarse LSH bucket for cosine similarity: the sign pattern of the
    * vector's components at the given indices, packed into a long. Vectors
    * in the same bucket are near-duplicate candidates; used to prune the
    * O(n^2) pair space before exact scoring (the scale path for ANN). */
  def signBucket(a: Column, indices: Seq[Int]): Column =
    indices.zipWithIndex.map { case (idx, bit) =>
      when(element_at(a, idx + 1) >= 0.0f, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
}
