package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Bottom-k (min-wise) reservoir over a stream (the
  * q_inspection_sample_live core): per key, keep the k entries with the
  * smallest hash — deterministic and ORDER-INDEPENDENT, so the final
  * state equals the batch draw no matter how records split into batches
  * or arrive shuffled. */
class BottomKReservoirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (id, hv) records for one key piped in `batches`; returns the final
    * reservoir (hv-ordered ids) reconciled by n_seen. */
  private def run(batches: Seq[Seq[(Long, Long)]]): Seq[Long] = {
    val name = s"bkr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, (Long, Long), java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[String, (Long, Long)](
      mem.toDF(), $"_1", $"_2", $"_3")
    val updates = StatefulOps
      .flatTransformWithState[String, (Long, Long), (Long, Seq[(Long, Long)]),
        (String, Long, Long, Long)](ks) { (key, rows, state) =>
        var (nSeen, buf) = state.getOption.getOrElse((0L, Seq.empty[(Long, Long)]))
        rows.foreach { case ((id, hv), _) =>
          nSeen += 1L
          buf = ((buf :+ ((hv, id))).sortBy(e => (e._1, e._2))).take(2)
        }
        state.update((nSeen, buf))
        buf.iterator.map { case (hv, id) => (key, nSeen, id, hv) }
      }
    val q = updates.toDF("key", "n_seen", "id", "hv")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      var t = 0L
      for (b <- batches) {
        mem.addData(b.map { case (id, hv) => { t += 1; ("k", (id, hv), ts(t)) } }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val mx = rows.map(_._1).max
    rows.filter(_._1 == mx).sortBy(r => (r._3, r._2)).map(_._2).toSeq
  }

  test("final reservoir is batch-split and arrival-order independent") {
    val recs = Seq(5L -> 50L, 1L -> 10L, 9L -> 90L, 3L -> 30L, 7L -> 70L, 2L -> 20L)
    val oneBatch = run(Seq(recs))
    val split = run(Seq(recs.take(2), recs.slice(2, 4), recs.drop(4)))
    val shuffled = run(Seq(recs.reverse.take(3), recs.reverse.drop(3)))
    // batch ground truth: bottom-2 by hv
    assert(oneBatch === Seq(1L, 2L))
    assert(split === oneBatch)
    assert(shuffled === oneBatch)
  }

  test("hash ties break by id, and k bounds state even under floods") {
    val flood = (1L to 100L).map(id => id -> 7L) // all same hash
    assert(run(Seq(flood)) === Seq(1L, 2L))
  }
}
