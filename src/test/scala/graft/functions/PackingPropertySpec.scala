package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property layer for [[Packing.packNextFit]] (VERDICT r14 #6): the
  * distributed sharded fold must equal a NAIVE single-threaded next-fit
  * replay over random (capacity, shardSize, lengths) — the repo's seeded
  * property idiom for everything else in `functions/`, closing the
  * example-based-only gap PackingSpec left. */
class PackingPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference model: per shard (id div shardSize), pack ids ascending
    * with the next-fit rule (open a new bin when the running total would
    * exceed capacity and the bin is non-empty). */
  private def model(rows: Seq[(Long, Long)], capacity: Long,
      shardSize: Long): Map[Long, Long] =
    rows.groupBy(_._1 / shardSize).flatMap { case (_, docs) =>
      var bin = 0L
      var run = 0L
      docs.sortBy(_._1).map { case (id, tok) =>
        if (run > 0 && run + tok > capacity) { bin += 1; run = tok }
        else run += tok
        id -> bin
      }
    }

  test("packNextFit equals the naive in-memory next-fit fold (25 seeded draws)") {
    import spark.implicits._
    val rnd = new Random(20260818L)
    for (trial <- 1 to 25) {
      val capacity = 1L + rnd.nextInt(300)
      val shardSize = 1L + rnd.nextInt(40)
      val n = rnd.nextInt(121)
      // sparse, shuffled, duplicate-free ids; lengths may exceed capacity
      val ids = rnd.shuffle((0L until 4L * math.max(n, 1)).toVector).take(n)
      val rows = ids.map(id => (id, 1L + rnd.nextInt(400).toLong))
      val expect = model(rows, capacity, shardSize)
      val got = Packing.packNextFit(rows.toDF("doc_id", "n_tok"),
          "doc_id", "n_tok", capacity, shardSize)
        .select("doc_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect,
        s"trial=$trial capacity=$capacity shardSize=$shardSize rows=$rows")
    }
  }
}
