package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding/vector column functions (`Array[Float]` columns).
  *
  * Pure column expressions over `zip_with`/`aggregate` — codegen-friendly,
  * no UDFs, distribute trivially. Accumulation is an in-order left fold in
  * double precision, which keeps results deterministic and reproducible
  * across engines (needed for oracle checks) and across cluster sizes.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
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
