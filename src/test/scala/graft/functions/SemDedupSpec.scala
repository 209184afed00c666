package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables.load

/** SemDeDup pinned against brute-force cosine pairs: every reported pair
  * must be a true near-duplicate (precision 1 — pairs are exact-cosine
  * rescored), and within-cell candidate generation must recover a
  * meaningful fraction of the brute-force pair set. The synthetic
  * embeddings are random, so tau-pairs are only weakly similar and
  * scatter across cells — real corpora's near-identical duplicates
  * co-locate far more reliably (the paper's operating point); the bound
  * here is the structural floor, not the method's field recall. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.35

  private lazy val emb = load(spark, dir, "embeddings")

  private lazy val brute: Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val cb = VectorIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3)

  test("every SemDedup pair is a true >= tau cosine pair (exact rescoring)") {
    val got = SemDedup.pairs(emb, "vec_id", "embedding", cb, tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute), s"false positives: ${got diff brute}")
    assert(got.nonEmpty)
  }

  test("within-cell candidates recover a meaningful pair fraction (random-vector floor)") {
    val got = SemDedup.pairs(emb, "vec_id", "embedding", cb, tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.size.toDouble / brute.size
    info(f"recall $recall%.2f over ${brute.size} true pairs")
    assert(recall >= 0.15, f"recall $recall%.2f over ${brute.size} true pairs")
  }

  test("keep() drops exactly the non-representatives of each dup group") {
    val kept = SemDedup.keep(emb, "vec_id", "embedding", cb, tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pairSet = SemDedup.pairs(emb, "vec_id", "embedding", cb, tau)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // union-find over the found pairs: representative = min id
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairSet.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val expectedDrops = pairSet.flatMap(p => Seq(p._1, p._2)).toSet.filter(x => find(x) != x)
    assert(kept === (allIds diff expectedDrops))
  }
}
