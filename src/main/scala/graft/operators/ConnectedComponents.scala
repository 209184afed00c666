package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list, by
  * iterated minimum-label propagation.
  *
  * This is the closure step of a corpus dedup pipeline: the LSH / Jaccard /
  * SimHash stages produce near-duplicate PAIRS, but corpus construction
  * needs GROUPS with one canonical representative (transitive closure —
  * A~B and B~C must collapse to one kept doc even if A and C were never
  * paired directly). The reference's streams dedup topologies stop at
  * per-record dedup; this operator is what a training-data pipeline runs
  * on the pair output.
  *
  * Algorithm: every node starts labeled with its own id; each round a node
  * adopts the minimum label among itself and its direct neighbors. After k
  * rounds a node's label is the minimum id within graph distance k, so the
  * rounds needed equal the eccentricity of each component's minimum node
  * (≤ diameter). Near-dup clusters are dense quasi-cliques (members share
  * LSH buckets), so diameters are small (2–4) and the loop exits early via
  * the convergence check; `maxIter` bounds adversarial chains.
  *
  * Scale shape: each round is one shuffle keyed on node id (a groupBy-min
  * plus a left join — both partial-aggregated map-side), matching the
  * alternating-star CC formulations used at web scale. `localCheckpoint`
  * truncates lineage so the plan does not grow with iterations, and the
  * driver holds only the changed-row count, never node data.
  */
object ConnectedComponents {

  /** Returns one row per node appearing in `edges`: (node, component)
    * where component is the minimum node id reachable from it. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("n"), col(dstCol).cast("long").as("peer"))
      .union(edges.select(col(dstCol).cast("long").as("n"), col(srcCol).cast("long").as("peer")))
      .localCheckpoint()

    var labels = sym.select(col("n")).distinct().withColumn("label", col("n"))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("n").as("peer"), col("label").as("plabel")), "peer")
        .groupBy("n")
        .agg(min("plabel").as("nbr_min"))
      val next = labels
        .join(neighborMin, Seq("n"), "left")
        .select(
          col("n"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select("n", "label")
      it += 1
    }
    labels
  }
}
