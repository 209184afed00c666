package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** LIVE foreign-key table-table join (KIP-213 semantics, the
  * subscription/response/resolution pipeline of Kafka 2.4's
  * `KTable.join(other, foreignKeyExtractor, joiner)` — one Kafka
  * release past the reference's 2.2 line).
  *
  * Left rows are (key, (fk, payload)); the result is keyed by the LEFT
  * key and a right-side update must fan out to every subscriber.
  */
class StreamingFkJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def harness(inner: Boolean, name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, (String, String), java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val l = b.stream[String, (String, String)](lMem.toDF(), $"_1", $"_2", $"_3")
    val r = b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3")
    val joined = StreamingTableJoin.fkJoin(l, r, inner)(_._1)(
      (v, rv) => v._2 + "+" + rv.getOrElse("null"))
    val q = joined.toDF("k", "v", "ts").writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append).start()
    (lMem, rMem, q)
  }

  private def emitted(name: String): Seq[(String, Option[String])] =
    spark.table(name).collect()
      .map(row => (row.getString(0), Option(row.getString(1)))).toSeq

  test("right update fans out to every subscriber; inner miss retracts") {
    val (lMem, rMem, q) = harness(inner = true, "fkfan")
    try {
      lMem.addData(("o1", ("cA", "p1"), ts(1000L)), ("o2", ("cA", "p2"), ts(1500L)))
      q.processAllAvailable()
      // inner join, right side missing: both keys have no row yet
      assert(emitted("fkfan").toSet === Set("o1" -> None, "o2" -> None))

      rMem.addData(("cA", "gold", ts(2000L)))
      q.processAllAvailable()
      // ONE right update re-joined BOTH subscribers
      assert(emitted("fkfan").toSet ===
        Set("o1" -> None, "o2" -> None,
          "o1" -> Some("p1+gold"), "o2" -> Some("p2+gold")))

      rMem.addData(("cA", null.asInstanceOf[String], ts(3000L)))
      q.processAllAvailable()
      // right tombstone: both keys leave the inner view
      val last = spark.table("fkfan").collect()
        .filter(_.getTimestamp(2).getTime == 3000L)
        .map(r0 => (r0.getString(0), Option(r0.getString(1)))).toSet
      assert(last === Set("o1" -> None, "o2" -> None))
    } finally q.stop()
  }

  test("fk re-point unsubscribes the old group and joins the new one") {
    val (lMem, rMem, q) = harness(inner = true, "fkmove")
    try {
      rMem.addData(("cA", "gold", ts(500L)), ("cB", "silver", ts(600L)))
      q.processAllAvailable()
      lMem.addData(("o1", ("cA", "p1"), ts(1000L)))
      q.processAllAvailable()
      assert(emitted("fkmove").last === ("o1" -> Some("p1+gold")))

      // re-point o1 from cA to cB: the stale unsubscribe response from cA
      // must NOT clobber the new join result
      lMem.addData(("o1", ("cB", "p1"), ts(2000L)))
      q.processAllAvailable()
      val atMove = spark.table("fkmove").collect()
        .filter(_.getTimestamp(2).getTime == 2000L)
        .map(r0 => (r0.getString(0), Option(r0.getString(1)))).toSeq
      assert(atMove === Seq("o1" -> Some("p1+silver")))

      // a later update to the OLD group no longer reaches o1
      rMem.addData(("cA", "bronze", ts(3000L)))
      q.processAllAvailable()
      assert(spark.table("fkmove").collect()
        .count(_.getTimestamp(2).getTime == 3000L) === 0)
    } finally q.stop()
  }

  test("left tombstone retracts the key") {
    val (lMem, rMem, q) = harness(inner = true, "fkdel")
    try {
      rMem.addData(("cA", "gold", ts(500L)))
      q.processAllAvailable()
      lMem.addData(("o1", ("cA", "p1"), ts(1000L)))
      q.processAllAvailable()
      lMem.addData(("o1", null.asInstanceOf[(String, String)], ts(2000L)))
      q.processAllAvailable()
      assert(emitted("fkdel").last === ("o1" -> None))
    } finally q.stop()
  }

  test("all three stages' state survives stop + restart from checkpoint") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, split, timestamp_millis}
    val inDir = Files.createTempDirectory("graft-fkrec-in").toFile
    val ckpt = Files.createTempDirectory("graft-fkrec-ckpt").toFile.getAbsolutePath
    val b = GraftStreams(spark)

    // lines: side,key,a,b,tsMs — L carries (fk=a, payload=b), R carries value=a
    def parsed() = spark.readStream.text(inDir.getAbsolutePath)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).as("side"), col("p").getItem(1).as("k"),
        col("p").getItem(2).as("a"), col("p").getItem(3).as("b"),
        timestamp_millis(col("p").getItem(4).cast("long")).as("t"))
    def topology() = {
      val l = b.stream[String, (String, String)](parsed().filter(col("side") === "L"),
        col("k"), org.apache.spark.sql.functions.struct(col("a").as("_1"), col("b").as("_2")),
        col("t"))
      val r = b.stream[String, String](parsed().filter(col("side") === "R"),
        col("k"), col("a"), col("t"))
      StreamingTableJoin.fkJoin(l, r, inner = true)(_._1)(
        (v, rv) => v._2 + "+" + rv.getOrElse("null"))
    }
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[String])]()
    def start() = topology().toDF("k", "v", "ts").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r => emitted.add((r.getString(0), Option(r.getString(1)))))
      }
      .start()

    Files.writeString(new java.io.File(inDir, "a.txt").toPath,
      "R,cA,gold,-,500\nL,o1,cA,p1,1000\n")
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(emitted.toArray.toSet === Set("o1" -> Some("p1+gold")))
    } finally q1.stop()

    // restart: a right update must still fan out to the o1 subscription
    // (stage-2 member set) and pass the resolver (stage-3 fk) — both
    // restored from checkpoint; a new left row joins the updated value
    emitted.clear()
    Files.writeString(new java.io.File(inDir, "b.txt").toPath,
      "R,cA,plat,-,2000\nL,o2,cA,p2,2500\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(emitted.toArray.toSet ===
        Set("o1" -> Some("p1+plat"), "o2" -> Some("p2+plat")))
    } finally q2.stop()
  }

  test("hot fk: stage-2 state is one entry PER SUBSCRIBER, not a per-fk blob") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-fkhot-ckpt").toFile.getAbsolutePath
    val lMem = MemoryStream[(String, (String, String), java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val b = GraftStreams(spark)
    val joined = StreamingTableJoin.fkJoin(
      b.stream[String, (String, String)](lMem.toDF(), $"_1", $"_2", $"_3"),
      b.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3"),
      inner = true)(_._1)((v, rv) => v._2 + "+" + rv.getOrElse("null"))
    val q = joined.toDF("k", "v", "ts").writeStream.format("memory")
      .queryName("fkhot").option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      // 100 subscribers, ALL pointing at the one hot fk
      lMem.addData((1 to 100).map(i => (f"o$i%03d", ("hot", s"p$i"), ts(1000L + i))))
      q.processAllAvailable()
      rMem.addData(("hot", "gold", ts(5000L)))
      q.processAllAvailable()
      // the right update fanned out to every subscriber
      val joinedRows = spark.table("fkhot").collect()
        .filter(r0 => Option(r0.getString(1)).exists(_.endsWith("+gold")))
      assert(joinedRows.length === 100)
    } finally q.stop()

    // state-store layout audit: the subscription store ("subs" MapState)
    // must hold 100 individual (fk, leftKey) entries — the KIP-213
    // prefix-scan shape — never a single Seq value per fk
    val meta = spark.read.format("state-metadata").load(ckpt)
    val twsOp = meta.filter(col("operatorName").contains("transformWithState"))
      .select("operatorId").head.getLong(0)
    val subsRows = spark.read.format("statestore")
      .option("path", ckpt).option("operatorId", twsOp)
      .option("stateVarName", "subs").load()
    assert(subsRows.count() === 100L)
    // and each entry is keyed by (grouping key, user map key) — per subscriber
    val userKeys = subsRows.select("user_map_key.*").distinct().count()
    assert(userKeys === 100L)
  }

  test("random multi-batch replays converge to the batch view (property)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // random changelogs: left keys o0..o9 re-point across fks c0..c3 and
      // tombstone; right keys update and tombstone. All ts distinct.
      val leftOps = (1 to 30).map { i =>
        val v = if (rnd.nextInt(8) == 0) null.asInstanceOf[(String, String)]
                else (s"c${rnd.nextInt(4)}", s"p${seed}_$i")
        (s"o${rnd.nextInt(10)}", v, ts(1000L * i))
      }
      val rightOps = (1 to 15).map { i =>
        val v = if (rnd.nextInt(8) == 0) null.asInstanceOf[String] else s"v${seed}_$i"
        (s"c${rnd.nextInt(4)}", v, ts(1000L * i + 500L))
      }
      // batch expectation: latest-per-key views, inner-joined on the fk
      val lView = leftOps.groupBy(_._1).view
        .mapValues(_.maxBy(_._3.getTime)._2).filter(_._2 != null).toMap
      val rView = rightOps.groupBy(_._1).view
        .mapValues(_.maxBy(_._3.getTime)._2).filter(_._2 != null).toMap
      val expected = lView.flatMap { case (k, (fk, p)) =>
        rView.get(fk).map(v => k -> (p + "+" + v))
      }

      val (lMem, rMem, q) = harness(inner = true, s"fkprop$seed")
      try {
        // replay in ts order, split into random contiguous batches
        val merged = (leftOps.map(scala.util.Left(_)) ++ rightOps.map(scala.util.Right(_)))
          .sortBy {
            case scala.util.Left(op) => op._3.getTime
            case scala.util.Right(op) => op._3.getTime
          }
        val nBatches = 1 + rnd.nextInt(5)
        merged.grouped(math.max(1, merged.size / nBatches)).foreach { chunk =>
          val ls = chunk.collect { case scala.util.Left(op) => op }
          val rs = chunk.collect { case scala.util.Right(op) => op }
          if (ls.nonEmpty) lMem.addData(ls)
          if (rs.nonEmpty) rMem.addData(rs)
          q.processAllAvailable()
        }
        // final view per key = the LAST emission in EMISSION order (memory
        // sink rows are appended batch by batch; a key's per-batch rows
        // come from one task in process() order). This is the update-
        // stream contract — consumers apply updates as they arrive — and
        // it keeps the property honest under ANY micro-batch split: the
        // two addData calls race the always-on trigger, so one chunk's
        // left and right rows can land in DIFFERENT micro-batches (the
        // engine then legitimately processes subscriptions before rights
        // regardless of event ts, and re-emits on the later right batch).
        // Reconstructing by max event-ts instead makes the test fail
        // whenever that split happens — it did, JVM-timing-dependently.
        val finalByKey = spark.table(s"fkprop$seed").collect()
          .map(r => (r.getString(0), Option(r.getString(1))))
          .zipWithIndex
          .groupBy(_._1._1).view.mapValues(es => es.maxBy(_._2)._1._2).toMap
        val live = finalByKey.collect { case (k, Some(v)) => k -> v }
        assert(live === expected, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("left variant joins None on right miss") {
    val (lMem, rMem, q) = harness(inner = false, "fkleft")
    try {
      lMem.addData(("o1", ("cA", "p1"), ts(1000L)))
      q.processAllAvailable()
      assert(emitted("fkleft").last === ("o1" -> Some("p1+null")))
      rMem.addData(("cA", "gold", ts(2000L)))
      q.processAllAvailable()
      assert(emitted("fkleft").last === ("o1" -> Some("p1+gold")))
    } finally q.stop()
  }
}
