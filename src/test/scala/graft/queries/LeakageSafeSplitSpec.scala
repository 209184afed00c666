package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The invariant q_split_leakage_safe exists for: NO near-duplicate pair
  * crosses the split boundary (the per-doc hash split, q_train_val_split,
  * gives no such guarantee — a val paraphrase of a train doc silently
  * inflates evals). */
class LeakageSafeSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no MinHash near-dup pair crosses the split; buckets follow the " +
      "cluster label; every doc is assigned") {
    import org.apache.spark.sql.functions._
    val split = SparkEntry.queries("q_split_leakage_safe")(spark, dir)
      .localCheckpoint()
    val docs = graft.Tables.load(spark, dir, "documents").count()
    assert(split.count() === docs, "one assignment per document")
    assert(split.filter(col("split").isNull).count() === 0)
    // cluster members share one split by construction: split is a pure
    // function of cluster, so distinct (cluster, split) pairs = clusters
    val byCluster = split.select("cluster", "split").distinct().count()
    val clusters = split.select("cluster").distinct().count()
    assert(byCluster === clusters, "a cluster straddles the split")
    // and the near-dup PAIRS (the ground truth the clusters came from)
    // never cross: join each pair's two sides to their assignments
    val pairs = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val a = split.select(col("doc_id").as("doc_a"), col("split").as("sa"))
    val b = split.select(col("doc_id").as("doc_b"), col("split").as("sb"))
    val crossing = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing === 0L, s"$crossing near-dup pairs leak across the split")
  }
}
