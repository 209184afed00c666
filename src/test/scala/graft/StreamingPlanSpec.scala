package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.ts
import graft.api._

/** Streaming physical-plan audits: the stateful operators that make the
  * topologies incremental must actually appear — a silent fallback to a
  * stateless plan would "work" on small tests while recomputing the world
  * at scale. */
class StreamingPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builder = GraftStreams(spark)

  private def lastPlan(queryName: String): String = {
    val q = spark.streams.active.find(_.name == queryName).get
    val baos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(baos)) { q.explain(extended = true) }
    baos.toString
  }

  test("windowed count plans StateStoreSave with watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val counts = builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")
      .groupByKey
      .windowedBy(TimeWindows.of(java.time.Duration.ofSeconds(10))
        .grace(java.time.Duration.ofSeconds(5)))
      .count()
    val q = counts.df.writeStream.format("memory").queryName("plan_wc")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("A", 1, ts(1000L)))
      q.processAllAvailable()
      val plan = lastPlan("plan_wc")
      assert(plan.contains("StateStoreSave"), plan.take(800))
      assert(plan.contains("EventTimeWatermark"), plan.take(800))
    } finally q.stop()
  }

  test("stateful transform plans FlatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, java.sql.Timestamp)]
    val out = graft.streaming.StatefulOps.flatTransformWithState[String, Int, Int, (String, Int)](
      builder.stream[String, Int](mem.toDF(), $"_1", $"_2", $"_3")) { (k, rows, st) =>
      val acc = st.getOption.getOrElse(0) + rows.map(_._1).sum
      st.update(acc)
      Iterator.single((k, acc))
    }
    val q = out.toDF("k", "v").writeStream.format("memory").queryName("plan_fm")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("A", 1, ts(1000L)))
      q.processAllAvailable()
      assert(lastPlan("plan_fm").contains("FlatMapGroupsWithState"))
    } finally q.stop()
  }

  test("live stream-table join plans ONE stateful op over a single shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val sMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val tMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = builder.stream[String, String](sMem.toDF(), $"_1", $"_2", $"_3")
      .joinTable(builder.table[String, String](tMem.toDF(), $"_1", $"_2", $"_3"))(_ + "+" + _)
    val q = joined.toDF.writeStream.format("memory").queryName("plan_stj")
      .outputMode(OutputMode.Append).start()
    try {
      tMem.addData(("k", "T", ts(500L)))
      sMem.addData(("k", "S", ts(1000L)))
      q.processAllAvailable()
      val plan = lastPlan("plan_stj")
      assert(plan.contains("FlatMapGroupsWithState"), plan.take(800))
      // both sides co-group through one exchange of the union — no join
      // node, no second stateful operator, no extra shuffle stage
      val physical = plan.substring(plan.indexOf("== Physical Plan =="))
      assert(physical.split("Exchange hashpartitioning").length - 1 === 1, physical.take(1200))
      assert(!physical.contains("SortMergeJoin") && !physical.contains("StateStoreSave"),
        physical.take(1200))
    } finally q.stop()
  }

  test("live fk join plans its three stateful stages, each over one shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(String, (String, String), java.sql.Timestamp)]
    val rMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = graft.streaming.StreamingTableJoin.fkJoin(
      builder.stream[String, (String, String)](lMem.toDF(), $"_1", $"_2", $"_3"),
      builder.stream[String, String](rMem.toDF(), $"_1", $"_2", $"_3"),
      inner = true)(_._1)((v, rv) => v._2 + rv.getOrElse(""))
    val q = joined.toDF("k", "v", "ts").writeStream.format("memory")
      .queryName("plan_fk").outputMode(OutputMode.Append).start()
    try {
      lMem.addData(("o", ("c", "p"), ts(1000L)))
      q.processAllAvailable()
      val physical = lastPlan("plan_fk")
        .substring(lastPlan("plan_fk").indexOf("== Physical Plan =="))
      // subscription deltas + fk-group join + resolver = exactly three
      // stateful stages (the reference topology's three topic hops), no
      // join node anywhere; stage 2 is the TransformWithState subscription
      // store (MapState — one entry per subscriber)
      assert("FlatMapGroupsWithState".r.findAllIn(physical).size === 2, physical.take(1500))
      assert("TransformWithState".r.findAllIn(physical).nonEmpty, physical.take(1500))
      assert(physical.split("Exchange hashpartitioning").length - 1 === 3, physical.take(1500))
      assert(!physical.contains("SortMergeJoin") && !physical.contains("BroadcastHashJoin"),
        physical.take(1500))
    } finally q.stop()
  }

  test("live cogroup plans ONE stateful op over one shuffle of the union") {
    implicit val sqlCtx = spark.sqlContext
    val aMem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val bMem = MemoryStream[(String, String, java.sql.Timestamp)]
    val updates = builder.stream[String, Long](aMem.toDF(), $"_1", $"_2", $"_3").groupByKey
      .cogroup[Long]((_, n, acc) => acc + n)
      .cogroup(builder.stream[String, String](bMem.toDF(), $"_1", $"_2", $"_3").groupByKey)(
        (_, _, acc) => acc)
      .aggregateUpdates(0L)
    val q = updates.toDF("k", "v", "ts", "seq").writeStream.format("memory")
      .queryName("plan_cg").outputMode(OutputMode.Update).start()
    try {
      aMem.addData(("k", 1L, ts(1000L)))
      bMem.addData(("k", "x", ts(2000L)))
      q.processAllAvailable()
      val physical = lastPlan("plan_cg")
        .substring(lastPlan("plan_cg").indexOf("== Physical Plan =="))
      // ONE stateful fold; each side's rows cross the network exactly once
      // (the micro-batch planner shuffles each union branch straight into
      // the stateful operator's partitioning — no extra stage, no join)
      assert("FlatMapGroupsWithState".r.findAllIn(physical).size === 1, physical.take(1200))
      val exchanges = physical.split("Exchange hashpartitioning").length - 1
      assert(exchanges <= 2, physical.take(1200))
      assert(!physical.contains("SortMergeJoin") && !physical.contains("StateStoreSave"),
        physical.take(1200))
    } finally q.stop()
  }

  test("stream-static decontamination plans a broadcast join with ZERO streaming state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.broadcast
    val mem = MemoryStream[(Long, String)]
    val evalFps = Seq("bad1", "bad2").toDF("f")
    val cleaned = mem.toDF().toDF("doc_id", "f")
      .join(broadcast(evalFps), Seq("f"), "left_anti")
    val q = cleaned.writeStream.format("memory").queryName("plan_dc")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, "ok"), (2L, "bad1"))
      q.processAllAvailable()
      val physical = lastPlan("plan_dc")
        .substring(lastPlan("plan_dc").indexOf("== Physical Plan =="))
      assert(physical.contains("BroadcastHashJoin"), physical.take(1200))
      // the train side streams through unbuffered — no state store at all
      assert(!physical.contains("StateStore") &&
        !physical.contains("FlatMapGroupsWithState"), physical.take(1200))
      assert(spark.table("plan_dc").collect().map(_.getLong(1)).toSeq === Seq(1L))
    } finally q.stop()
  }

  test("streaming changelog aggregation chains stateful operators in one query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val counts = graft.streaming.StreamingChangelog.groupByCount(
      builder.stream[String, String](mem.toDF(), $"_1", $"_2", $"_3"))((_, r) => r)
    val q = counts.writeStream.format("memory").queryName("plan_cl")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(("u1", "eu", ts(1000L)))
      q.processAllAvailable()
      val plan = lastPlan("plan_cl")
      assert(plan.contains("FlatMapGroupsWithState"), plan.take(800))
      assert(plan.contains("StateStoreSave"), plan.take(800))
    } finally q.stop()
  }
}
