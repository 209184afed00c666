package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** Streaming symmetric table-table join: updates on either side re-emit
  * the joined value; tombstones retract
  * (`TableTableJoinIntegrationTest.java` update sequences). */
class StreamingTableJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("updates on either side re-emit; tombstone retracts (inner)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")

    val joined = StreamingTableJoin.innerJoin(l, r)(_ + "+" + _)
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttjoin")
      .outputMode(OutputMode.Update).start()

    def emitted(): Seq[(String, Option[String])] =
      spark.table("ttjoin").collect().map(row =>
        (row.getString(0), Option(row.getString(1)))).toSeq

    try {
      lMem.addData(("k1", "L1", ts(1000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", None)) // right side missing: no join row

      rMem.addData(("k1", "R1", ts(2000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", Some("L1+R1"))) // right update joins

      lMem.addData(("k1", "L2", ts(3000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", Some("L2+R1"))) // left update re-emits

      lMem.addData(("k1", null.asInstanceOf[String], ts(4000L)))
      q.processAllAvailable()
      assert(emitted().last === ("k1", None)) // tombstone retracts the key
    } finally q.stop()
  }

  test("random multi-batch replays converge to the batch view (property)") {
    implicit val sqlCtx = spark.sqlContext
    val b = GraftStreams(spark)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val leftOps = (1 to 25).map { i =>
        (s"k${rnd.nextInt(8)}",
          if (rnd.nextInt(7) == 0) null.asInstanceOf[String] else s"L${seed}_$i",
          ts(1000L * i))
      }
      val rightOps = (1 to 25).map { i =>
        (s"k${rnd.nextInt(8)}",
          if (rnd.nextInt(7) == 0) null.asInstanceOf[String] else s"R${seed}_$i",
          ts(1000L * i + 500L))
      }
      val lView = leftOps.groupBy(_._1).view
        .mapValues(_.maxBy(_._3.getTime)._2).filter(_._2 != null).toMap
      val rView = rightOps.groupBy(_._1).view
        .mapValues(_.maxBy(_._3.getTime)._2).filter(_._2 != null).toMap
      val expected = lView.flatMap { case (k, lv) =>
        rView.get(k).map(rv => k -> (lv + "+" + rv))
      }

      val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val joined = StreamingTableJoin.innerJoin(
        b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3"),
        b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3"))(_ + "+" + _)
      val name = s"ttprop$seed"
      val q = joined.toDF("k", "v").writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      try {
        val merged = (leftOps.map(scala.util.Left(_)) ++ rightOps.map(scala.util.Right(_)))
          .sortBy {
            case scala.util.Left(op) => op._3.getTime
            case scala.util.Right(op) => op._3.getTime
          }
        merged.grouped(math.max(1, merged.size / (1 + rnd.nextInt(5)))).foreach { chunk =>
          val ls = chunk.collect { case scala.util.Left(op) => op }
          val rs = chunk.collect { case scala.util.Right(op) => op }
          if (ls.nonEmpty) lMem.addData(ls)
          if (rs.nonEmpty) rMem.addData(rs)
          q.processAllAvailable()
        }
        // update-mode emissions: the LAST row per key is the final view
        val live = spark.table(name).collect()
          .foldLeft(Map.empty[String, Option[String]]) { (m, r) =>
            m + (r.getString(0) -> Option(r.getString(1)))
          }
          .collect { case (k, Some(v)) => k -> v }
        assert(live === expected, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("left join emits as soon as left exists, tracks right arrival") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")

    val joined = StreamingTableJoin.leftJoin(l, r)((lv, rv) => lv + "+" + rv.getOrElse("null"))
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttleft")
      .outputMode(OutputMode.Update).start()
    try {
      lMem.addData(("a", "L1", ts(1000L)))
      q.processAllAvailable()
      rMem.addData(("a", "R1", ts(2000L)))
      q.processAllAvailable()
      val vals = spark.table("ttleft").collect().map(r0 => Option(r0.getString(1))).toSeq
      assert(vals === Seq(Some("L1+null"), Some("L1+R1")))
    } finally q.stop()
  }

  test("within-batch updates apply in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, String](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")
    val joined = StreamingTableJoin.innerJoin(l, r)(_ + "+" + _)
    val q = joined.toDF("k", "v").writeStream.format("memory").queryName("ttorder")
      .outputMode(OutputMode.Update).start()
    try {
      rMem.addData(("x", "R", ts(500L)))
      // both L-updates in ONE batch, out of insertion order
      lMem.addData(("x", "L-new", ts(3000L)), ("x", "L-old", ts(1000L)))
      q.processAllAvailable()
      val last = spark.table("ttorder").collect().map(r0 => Option(r0.getString(1))).last
      assert(last === Some("L-new+R")) // latest-ts update wins, not last-seen
    } finally q.stop()
  }
}
