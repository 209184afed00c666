package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Randomized model-equivalence pin for the r11 sorted-buffer rewrite of
  * [[StatefulOps.intervalJoinEager]]: the operator's output over random
  * multi-batch replays must equal a naive reference fold (linear-scan
  * buffers — the pre-r11 implementation's semantics) record for record,
  * including eviction and the (full-ts, left-before-right) tie-break. */
class EagerJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val beforeMs = 700L
  private val afterMs = 300L
  private val graceMs = 100L

  /** The naive reference: unsorted buffers + full predicate scans,
    * folding each batch in (ms, sub-ms, left-first) order — exactly the
    * operator's contract, minus every data-structure optimization. */
  private def model(batches: Seq[Seq[(String, Boolean, Long, Long)]],
      outer: Boolean): Seq[(String, String)] = {
    // per-key: (lbuf, rbuf, streamTime); entries are (tsMs, value)
    val lbuf = collection.mutable.Map.empty[String, Vector[(Long, Long)]]
      .withDefaultValue(Vector.empty)
    val rbuf = collection.mutable.Map.empty[String, Vector[(Long, Long)]]
      .withDefaultValue(Vector.empty)
    val st = collection.mutable.Map.empty[String, Long].withDefaultValue(Long.MinValue)
    val out = Seq.newBuilder[(String, String)]
    for (batch <- batches) {
      // (tsMs, sub-ms=0 here, left-first) — test timestamps are whole ms
      for ((k, isLeft, t, v) <- batch.sortBy(r => (r._3, if (r._2) 0 else 1))) {
        if (t > st(k)) st(k) = t
        if (isLeft) {
          val ms = rbuf(k).filter(e =>
            e._1 >= math.max(0L, t - beforeMs) && e._1 <= t + afterMs)
          if (ms.isEmpty) out += ((k, s"l$v|-"))
          else ms.sortBy(e => e._1).foreach(e => out += ((k, s"l$v|r${e._2}")))
          lbuf(k) = lbuf(k) :+ ((t, v))
        } else {
          val ms = lbuf(k).filter(e =>
            e._1 >= math.max(0L, t - afterMs) && e._1 <= t + beforeMs)
          if (ms.isEmpty) { if (outer) out += ((k, s"-|r$v")) }
          else ms.sortBy(e => e._1).foreach(e => out += ((k, s"l${e._2}|r$v")))
          rbuf(k) = rbuf(k) :+ ((t, v))
        }
        val floor = st(k) - (beforeMs + afterMs + graceMs)
        lbuf(k) = lbuf(k).filter(_._1 >= floor)
        rbuf(k) = rbuf(k).filter(_._1 >= floor)
      }
    }
    out.result()
  }

  test("random multi-batch replays match the naive reference fold " +
      "(multiset), inner and outer") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(7, 23, 41); outer <- Seq(false, true)) {
      val rng = new scala.util.Random(seed)
      var id = 0L
      // each batch is SINGLE-SIDED: the query runs continuously, so a
      // trigger can fire between a left add and a right add — two adds
      // per "batch" would split into engine-chosen micro-batches the
      // model cannot mirror (observed: lefts processed first, an
      // eviction ran between, 11 rows diverged). One side per batch
      // makes the batch structure deterministic; cross-SIDE interaction
      // still happens through state across batches, and the same-batch
      // cross-side tie-break is pinned by the golden-trace specs.
      val batches: Seq[Seq[(String, Boolean, Long, Long)]] =
        (1 to 8).map { b =>
          val isLeft = rng.nextBoolean()
          (1 to 20).map { _ =>
            id += 1
            val key = s"K${rng.nextInt(3)}"
            // timestamps drift forward batch-to-batch with overlap, so
            // eviction and cross-batch buffers both engage
            val t = (b - 1) * 450L + rng.nextInt(1500).toLong
            (key, isLeft, t, id)
          }
        }
      val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val b = GraftStreams(spark)
      val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
      val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")
      val joined = StatefulOps.intervalJoinEager(l, r,
        beforeMs, afterMs, graceMs, outer) { (lv, rv) =>
        s"${lv.getOrElse("-")}|${rv.getOrElse("-")}"
      }
      val name = s"eagerprop${seed}_$outer"
      val q = joined.toDF("k", "v").writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append).start()
      try {
        for (batch <- batches) {
          val ls = batch.filter(_._2).map(e => (e._1, s"l${e._4}", ts(e._3)))
          val rs = batch.filterNot(_._2).map(e => (e._1, s"r${e._4}", ts(e._3)))
          if (ls.nonEmpty) lMem.addData(ls)
          if (rs.nonEmpty) rMem.addData(rs)
          q.processAllAvailable()
        }
        val got = spark.table(name).collect()
          .map(row => (row.getString(0), row.getString(1))).toSeq
        val want = model(batches, outer)
        assert(got.sorted === want.sorted,
          s"seed=$seed outer=$outer: got ${got.size}, want ${want.size}\n" +
            s"extra=${(got.groupBy(identity).view.mapValues(_.size).toMap.toSet --
              want.groupBy(identity).view.mapValues(_.size).toMap.toSet).take(5)}")
      } finally q.stop()
    }
  }
}
