package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** PQ codebook shape, deterministic round-trip, and ADC recall against
  * exact L2 top-k (the metric ADC approximates). */
class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("codes are m symbols in [0, ksub); encoding is deterministic") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = ProductQuantizer.train(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    assert(cb.m === 8 && cb.subDim === 8 && cb.ksub === 16)
    val codes = ProductQuantizer.encode(emb, "embedding", cb)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val again = ProductQuantizer.encode(emb, "embedding", cb)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === again)
  }

  test("ADC recall@10 far exceeds the random baseline") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cb = ProductQuantizer.train(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 10)
    val pq = ProductQuantizer.search(emb, queries, "vec_id", "embedding", cb, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact L2 ground truth, computed driver-side (500 x 64 floats)
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def sq(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i).toDouble - b(i).toDouble) * (a(i).toDouble - b(i).toDouble)).sum
    val truth = all.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (sq(qv, nv), nid) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap

    val recalls = truth.keys.toSeq.map { q =>
      (pq.getOrElse(q, Set.empty) & truth(q)).size.toDouble / truth(q).size
    }
    val mean = recalls.sum / recalls.size
    // random top-10 of 499 would hit 2%; ADC at m=8/ksub=16 on 64 dims
    // must far exceed that even on near-random synthetic embeddings
    assert(mean > 0.2, s"mean ADC recall@10 $mean")
  }

  test("IVF+PQ composition prunes candidates and still finds neighbors") {
    val emb = Tables.load(spark, dir, "embeddings")
    val ivf = VectorIndex.train(emb, "vec_id", "embedding", k = 16, iters = 2)
    val pq = ProductQuantizer.train(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    val queries = emb.filter(col("vec_id") < 10)
    val res = ProductQuantizer.searchWithCells(
      emb, queries, "vec_id", "embedding", ivf, pq, nProbe = 4, topK = 10)
    val byQ = res.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query finds a full top-k within its probed cells
    assert(byQ.size === 10 && byQ.values.forall(_.size == 10))
    // agreement with full-scan ADC well above the probed-fraction floor:
    // probing 4/16 cells scans ~25% of the corpus
    val full = ProductQuantizer.search(emb, queries, "vec_id", "embedding", pq, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val agree = byQ.keys.toSeq.map(q => (byQ(q) & full(q)).size.toDouble / 10)
    assert(agree.sum / agree.size > 0.5, s"IVF+PQ agreement ${agree.sum / agree.size}")
  }

  test("codebook save/load round-trips exactly (the persisted serving path)") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val pq = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("pqcb").toString + "/cb"
    ProductQuantizer.saveCodebook(spark, pq, path)
    val loaded = ProductQuantizer.loadCodebook(spark, path)
    assert(loaded.m === pq.m && loaded.subDim === pq.subDim)
    assert(loaded.centroids.flatten.flatten.toSeq === pq.centroids.flatten.flatten.toSeq)
    // served codes from the loaded book are identical
    val v = emb.select("embedding").head().getSeq[Float](0)
    assert(loaded.encodeOne(v).toSeq === pq.encodeOne(v).toSeq)
  }
}
