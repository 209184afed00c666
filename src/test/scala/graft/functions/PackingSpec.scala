package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sharded next-fit sequence packing (graft.functions.Packing) pinned
  * against a hand-run of the greedy fold and its structural invariants:
  * in-shard id order, capacity respected for every multi-doc bin,
  * oversized docs isolated, bins contiguous from 0 per shard. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pack(rows: Seq[(Long, Long)], capacity: Long, shardSize: Long) = {
    import spark.implicits._
    Packing.packNextFit(rows.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", capacity, shardSize)
      .select("shard", "doc_id", "n_tok", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("next-fit fills until overflow, then opens a new bin") {
    // capacity 10, one shard: 4+5 fit bin 0; 3 overflows -> bin 1; 7
    // tops bin 1 off at exactly 10; 2 overflows -> bin 2; 9 -> bin 3
    val got = pack(Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 7L), (4L, 2L),
      (5L, 9L)), capacity = 10L, shardSize = 100L)
    assert(got.map(t => (t._2, t._4)).toSeq === Seq(
      (0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 3L)))
  }

  test("a document longer than capacity gets a bin of its own") {
    val got = pack(Seq((0L, 3L), (1L, 25L), (2L, 4L)),
      capacity = 10L, shardSize = 100L)
    // 3 -> bin 0; 25 overflows -> bin 1 alone (run stays 25, so the next
    // doc overflows again); 4 -> bin 2
    assert(got.map(t => (t._2, t._4)).toSeq ===
      Seq((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("shards pack independently and bins restart per shard") {
    val got = pack(Seq((0L, 6L), (1L, 6L), (2L, 6L), (3L, 6L)),
      capacity = 10L, shardSize = 2L)
    assert(got === Seq(
      (0L, 0L, 6L, 0L), (0L, 1L, 6L, 1L),
      (1L, 2L, 6L, 0L), (1L, 3L, 6L, 1L)))
  }

  test("invariants hold on a generated corpus") {
    import spark.implicits._
    // deterministic pseudo-random lengths, multiple shards
    val rows = (0L until 500L).map(i => (i, 1L + (i * 2654435761L % 97L)))
    val got = pack(rows, capacity = 256L, shardSize = 64L)
    assert(got.length === 500)
    val byBin = got.groupBy(t => (t._1, t._4))
    byBin.foreach { case ((shard, bin), docs) =>
      val total = docs.map(_._3).sum
      // capacity respected unless the bin holds a single oversized doc
      assert(total <= 256L || docs.length == 1,
        s"bin ($shard,$bin) holds $total tokens across ${docs.length} docs")
    }
    got.groupBy(_._1).foreach { case (shard, docs) =>
      val bins = docs.sortBy(_._2).map(_._4)
      // bins are non-decreasing in id order and contiguous from 0
      assert(bins.head === 0L)
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(b == a || b == a + 1, s"shard $shard bins skip: $a -> $b")
      case _ => ()
      }
    }
  }
}
