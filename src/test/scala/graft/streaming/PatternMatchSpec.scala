package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Streaming CEP: the DFA state carries across micro-batches, so a
  * pattern whose symbols arrive in different batches still matches. */
class PatternMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // view -> clicks* -> purchase, leftmost non-overlapping
  private val step: (Int, String) => (Int, Boolean) = {
    case (_, "v") => (1, false)
    case (s, "c") => (s, false)
    case (1, "p") => (0, true)
    case (_, _) => (0, false)
  }

  test("a pattern spanning three micro-batches counts once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    val q = PatternMatch.countStream(ks, init = 0)(step)
      .toDF("k", "n", "ts", "seq").writeStream.format("memory")
      .queryName("cepspan").outputMode(OutputMode.Update).start()
    def latest(): Long = spark.table("cepspan").collect()
      .maxBy(_.getLong(3)).getLong(1)
    try {
      mem.addData(("u", "v", ts(1000L)))
      q.processAllAvailable()
      assert(latest() === 0L)
      mem.addData(("u", "c", ts(2000L)))
      q.processAllAvailable()
      assert(latest() === 0L) // still armed, not accepted
      mem.addData(("u", "p", ts(3000L)))
      q.processAllAvailable()
      assert(latest() === 1L) // v(batch1) c(batch2) p(batch3) = one match

      // a second v resets the candidate; e breaks it; no double count
      mem.addData(("u", "v", ts(4000L)), ("u", "e", ts(5000L)), ("u", "p", ts(6000L)))
      q.processAllAvailable()
      assert(latest() === 1L)
    } finally q.stop()
  }

  test("DFA count equals the vc*p regex on random symbol strings (oracle equivalence)") {
    val rnd = new scala.util.Random(31)
    val symbols = "vcpe"
    for (_ <- 1 to 2000) {
      val s = Seq.fill(rnd.nextInt(20))(symbols(rnd.nextInt(4))).mkString
      val regexCount = "vc*p".r.findAllIn(s).size
      var (st, n) = (0, 0)
      s.foreach { ch =>
        val (next, acc) = step(st, ch.toString)
        st = next; if (acc) n += 1
      }
      assert(n === regexCount, s"input '$s'")
    }
  }

  test("within a batch the DFA replays in event-time order, not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val ks = GraftStreams(spark).stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    val q = PatternMatch.countStream(ks, init = 0)(step)
      .toDF("k", "n", "ts", "seq").writeStream.format("memory")
      .queryName("ceporder").outputMode(OutputMode.Update).start()
    try {
      // arrival order p,v — event-time order v,p: must NOT count (p precedes nothing armed)...
      // event-time v(1s) p(2s) => one match despite reversed arrival order
      mem.addData(("u", "p", ts(2000L)), ("u", "v", ts(1000L)))
      q.processAllAvailable()
      val n = spark.table("ceporder").collect().maxBy(_.getLong(3)).getLong(1)
      assert(n === 1L)
    } finally q.stop()
  }
}
