package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** IVF index quality: deterministic training shape and recall against the
  * brute-force top-k (the baseline the index approximates). */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("codebook trains k cells of full dimension; assignment is total") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(cb.centroids.length === 8)
    assert(cb.centroids.forall(_.length === 64))
    val cells = VectorIndex.assignCells(emb, "embedding", cb)
      .groupBy("__cell").count().collect()
    assert(cells.map(_.getLong(1)).sum === emb.count()) // every vector in a cell
    assert(cells.length > 1) // clustering actually splits the corpus
  }

  test("codebook round-trips through parquet (train once, reuse)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 8, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("ivf-cb").toString + "/codebook"
    VectorIndex.saveCodebook(spark, cb, path)
    val loaded = VectorIndex.loadCodebook(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq === cb.centroids.map(_.toSeq).toSeq)
    // identical assignments from the reloaded index
    val a = VectorIndex.assignCells(emb, "embedding", cb)
      .select("vec_id", "__cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = VectorIndex.assignCells(emb, "embedding", loaded)
      .select("vec_id", "__cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("IVF recall@10 beats the probed-fraction baseline by a wide margin") {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 16, iters = 2)
    val ivf = VectorIndex.search(emb, queries, "vec_id", "embedding", cb,
        nProbe = 4, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // brute-force ground truth via the oracle-checked query shape
    val brute = graft.SparkEntry.queries("q_ann_cosine_topk")(spark, dir)
      .filter(col("query_id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = brute.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty) & brute(q)
      hit.size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    // probing 4/16 cells scans ~25% of the corpus; near-neighbors
    // concentrate in the query's cells so recall must far exceed that
    assert(mean > 0.5, s"mean recall $mean")
  }

  test("searchSelf(nProbe = k) equals the exact brute-force per-query top-k") {
    val emb = Tables.load(spark, dir, "embeddings")
    val k = 8
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = k, iters = 2)
    val self = VectorIndex.searchSelf(emb, "vec_id", "embedding", cb,
        nProbe = k, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    // ground truth: the oracle-checked broadcast search over the same
    // corpus with queries = corpus (small sf makes this affordable)
    val brute = VectorIndex.search(emb, emb, "vec_id", "embedding", cb,
        nProbe = k, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    assert(self.toSeq === brute.toSeq)
  }

  test("searchSelf with nProbe < k keeps recall against its exact twin") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 16, iters = 2)
    def sets(nProbe: Int) =
      VectorIndex.searchSelf(emb, "vec_id", "embedding", cb, nProbe, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(16)
    val approx = sets(4)
    val recalls = exact.keys.toSeq.map { q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.5, s"mean self-search recall $mean")
  }

  test("multi-assignment mining: every single-assignment pair survives, " +
      "recall vs exact never drops, and assignR = 1 is unchanged") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 16, iters = 2)
    def mined(np: Int, r: Int) =
      VectorIndex.minePairs(emb, "vec_id", "embedding", "label", cb,
          nProbe = np, assignR = r)
        .collect().map(x => ((x.getLong(0), x.getString(1)), x.getDouble(3))).toMap
    val exact = mined(16, 1) // nProbe = k meets every pair
    val single = mined(4, 1)
    val multi = mined(4, 2)
    // schema/shape invariant: one row per (query, pair_type) either way
    assert(multi.keySet.size === multi.size)
    // r=2 strictly widens coverage: each mined sim can only improve
    single.foreach { case (key, s1) =>
      assert(multi.contains(key), s"r=2 lost pair $key")
      assert(multi(key) >= s1, s"r=2 worsened $key: ${multi(key)} < $s1")
    }
    def recall(m: Map[(Long, String), Double]) =
      exact.count { case (k2, es) => m.get(k2).exists(_ >= es) }.toDouble / exact.size
    assert(recall(multi) >= recall(single),
      s"multi-assign recall ${recall(multi)} < single ${recall(single)}")
  }
}
