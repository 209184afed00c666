package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** SemDeDup — semantic deduplication by embedding (Abbas et al. 2023,
  * arXiv:2303.09540): k-means the embeddings, compare pairs ONLY within a
  * cluster by exact cosine, close the near-duplicate pair graph into
  * groups, keep one representative per group. The published recipe for
  * web-scale curation — catches paraphrases that exact n-gram methods
  * (MinHash/SimHash) miss.
  *
  * Scale shape follows the dedup rules in SCALE.md: candidates come from
  * an equi-join on the cell id (cluster sizes ≈ N/k; k is the knob — the
  * paper uses 50k cells for 5B embeddings), rescoring is the codegen'd
  * cosine kernel over floats riding the bucket rows, and grouping is the
  * one-shuffle-per-round min-label propagation. No all-pairs stage
  * anywhere. Known method property (documented in the paper): true
  * duplicates split across cell boundaries are missed — raise k-means
  * iterations or probe neighbor cells to trade cost for recall.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs: (cell, id_a, id_b, cos). */
  def pairs(df: DataFrame, idCol: String, embCol: String,
      cb: VectorIndex.Codebook, tau: Double): DataFrame = {
    // norms once per vector, not twice per candidate pair (r15; cos stays
    // bit-identical via cosineFromNorms); cells localCheckpoints so the
    // assignment UDF also runs once instead of once per join side
    val cells = VectorIndex.assignCells(df, embCol, cb)
      .withColumnRenamed("__cell", "cell")
      .withColumn("nrm",
        sqrt(VectorFunctions.dotProduct(col(embCol), col(embCol))))
      .localCheckpoint(false)
    val a = cells.select(col("cell"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"), col("nrm").as("nrm_a"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosineFromNorms(
        VectorFunctions.dotProduct(col("emb_a"), col("emb_b")),
        col("nrm_a"), col("nrm_b")))
      .filter(col("cos") >= tau)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
  }

  /** The corpus with every non-representative semantic duplicate removed
    * (representative = min id per duplicate group). */
  def keep(df: DataFrame, idCol: String, embCol: String,
      cb: VectorIndex.Codebook, tau: Double): DataFrame = {
    val comps = ConnectedComponents.run(pairs(df, idCol, embCol, cb, tau), "id_a", "id_b")
    val drops = comps.filter(col("n") =!= col("label"))
      .select(col("n").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }
}
