package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorHandle, TimeMode, TimerValues, TTLConfig}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.api.GraftStreams

/** VersionedKeyValueStore (KIP-889) semantics on the Processor API:
  * timestamped puts (in and out of order), as-of reads across
  * micro-batches, and history retention with the horizon-straddling
  * version kept readable. */
class VersionedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of reads see the version valid at the requested time; retention trims") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, String, java.sql.Timestamp)]
      val stream = GraftStreams(spark).stream[String, String](mem.toDF(), $"_1", $"_2", $"_3")
      val out = ProcessorApi.process[String, String, (String, String)](
        stream, new VersionedLookup, TimeMode.None(), OutputMode.Append)
      val q = out.toDF("k", "res").writeStream.format("memory").queryName("vstore")
        .outputMode(OutputMode.Append).start()
      def results() = spark.table("vstore").collect().map(_.getString(1)).toSeq
      try {
        // batch 1: two puts (valid from their record times)
        mem.addData(("k", "P:v1", ts(1000L)), ("k", "P:v2", ts(5000L)))
        q.processAllAvailable()
        // batch 2: as-of reads resolve against state from batch 1
        mem.addData(("k", "G:500", ts(6000L)), ("k", "G:1000", ts(6001L)),
          ("k", "G:3000", ts(6002L)), ("k", "G:7000", ts(6003L)))
        q.processAllAvailable()
        assert(results() === Seq("none", "v1@1000", "v1@1000", "v2@5000"))

        // batch 3: retention (10s) drops v1 when 20s arrives, but v2 —
        // straddling the horizon — stays readable at the horizon
        mem.addData(("k", "P:v3", ts(20000L)))
        q.processAllAvailable()
        mem.addData(("k", "G:9000", ts(21000L)), ("k", "G:25000", ts(21001L)),
          ("k", "SIZE", ts(21002L)))
        q.processAllAvailable()
        assert(results().drop(4) === Seq("v2@5000", "v3@20000", "n=2"))

        // batch 4: out-of-order put lands in timestamp position
        mem.addData(("k", "P:v2b", ts(15000L)))
        q.processAllAvailable()
        mem.addData(("k", "G:18000", ts(22000L)))
        q.processAllAvailable()
        assert(results().last === "v2b@15000")

        // batch 5: a put at an EXISTING timestamp replaces that version
        // (KIP-889 single-writer-per-instant) — no duplicate accumulates
        mem.addData(("k", "P:v2c", ts(15000L)))
        q.processAllAvailable()
        mem.addData(("k", "G:18000", ts(23000L)), ("k", "SIZE", ts(23001L)))
        q.processAllAvailable()
        assert(results().takeRight(2) === Seq("v2c@15000", "n=3"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** Pure-store properties over random out-of-order puts: the binary-insert
  * fast path must behave exactly like the sort-per-put it replaced, and a
  * Long.MaxValue retention must mean "unbounded" (no horizon underflow
  * silently dropping versions). */
class VersionedStorePropertySpec extends AnyFunSuite {

  /** In-memory ListState — the store's only state dependency. */
  private final class FakeListState[S] extends org.apache.spark.sql.streaming.ListState[S] {
    private var data: Vector[S] = Vector.empty
    override def exists(): Boolean = data.nonEmpty
    override def get(): Iterator[S] = data.iterator
    override def put(values: Array[S]): Unit = data = values.toVector
    override def appendValue(v: S): Unit = data :+= v
    override def appendList(values: Array[S]): Unit = data ++= values
    override def clear(): Unit = data = Vector.empty
  }

  /** Reference model: keep every (ts, v) in a sorted map, apply the same
    * retention rule (drop strictly-older-than-horizon except the last
    * straddler) after each put. */
  private def modelPut(m: Vector[(Long, String)], ts: Long, v: String,
      retention: Long): Vector[(Long, String)] = {
    val all = (m.filterNot(_._1 == ts) :+ ((ts, v))).sortBy(_._1)
    val horizon =
      try math.subtractExact(all.last._1, retention)
      catch { case _: ArithmeticException => Long.MinValue }
    val (older, recent) = all.partition(_._1 < horizon)
    older.lastOption.toVector ++ recent
  }

  test("random out-of-order puts match the sort-per-put model") {
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(seed)
      val retention = Seq(10L, 100L, 1000L, Long.MaxValue)(seed % 4)
      val store = new VersionedStore[String](new FakeListState, retention)
      var model = Vector.empty[(Long, String)]
      for (i <- 1 to 200) {
        val t = rnd.nextLong(500) // dense → collisions exercise replace
        val v = s"v$i"
        store.put(t, v)
        model = modelPut(model, t, v, retention)
        if (i % 50 == 0) {
          assert(store.size === model.size, s"seed=$seed i=$i")
          assert(store.getLatest === model.lastOption, s"seed=$seed i=$i")
          val asOf = rnd.nextLong(600)
          assert(store.get(asOf) === model.filter(_._1 <= asOf).lastOption,
            s"seed=$seed i=$i asOf=$asOf")
        }
      }
    }
  }

  test("Long.MaxValue retention keeps every version (no horizon underflow)") {
    val store = new VersionedStore[String](new FakeListState, Long.MaxValue)
    store.put(-1000L, "a")
    store.put(Long.MaxValue - 1, "z")
    store.put(0L, "m")
    assert(store.size === 3)
    assert(store.get(-1001L) === None)
    assert(store.get(-1000L) === Some((-1000L, "a")))
    assert(store.get(5L) === Some((0L, "m")))
    assert(store.getLatest === Some((Long.MaxValue - 1, "z")))
  }
}

/** KIP-914 temporal join: a LATE stream record (arriving batches after a
  * newer table version) must join the table version valid at ITS event
  * time — the exact case the non-versioned join gets wrong. */
class VersionedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("late stream record joins the historical table version, not the current one") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val tMem = MemoryStream[(String, String, java.sql.Timestamp)]
      val b = GraftStreams(spark)
      val joined = StreamingTableJoin.streamTableJoinVersioned(
        b.stream[String, String](sMem.toDF(), $"_1", $"_2", $"_3"),
        b.table[String, String](tMem.toDF(), $"_1", $"_2", $"_3"),
        historyRetentionMs = 60000L, inner = true)((v, tv) => v + "+" + tv.getOrElse("none"))
      val q = joined.toDF("k", "v", "ts").writeStream.format("memory")
        .queryName("vjoin").outputMode(OutputMode.Append).start()
      def rows() = spark.table("vjoin").collect().map(_.getString(1)).toSeq
      try {
        tMem.addData(("k", "old", ts(1000L)), ("k", "new", ts(10000L)))
        q.processAllAvailable()
        // late stream record at t=5000 arrives AFTER the t=10000 version:
        // versioned join resolves to "old" (valid at 5000)
        sMem.addData(("k", "s1", ts(5000L)))
        q.processAllAvailable()
        assert(rows() === Seq("s1+old"))
        // an on-time record at t=20000 joins the current version
        sMem.addData(("k", "s2", ts(20000L)))
        q.processAllAvailable()
        assert(rows() === Seq("s1+old", "s2+new"))
        // a tombstone version at t=30000: later stream records drop (inner)
        tMem.addData(("k", null.asInstanceOf[String], ts(30000L)))
        q.processAllAvailable()
        sMem.addData(("k", "s3", ts(35000L)), ("k", "s4", ts(25000L)))
        q.processAllAvailable()
        // s4 (as-of 25000) still sees "new"; s3 (as-of 35000) sees the delete
        assert(rows() === Seq("s1+old", "s2+new", "s4+new"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

/** P:<v> = put at record time; G:<ms> = as-of read; SIZE = version count. */
private[streaming] class VersionedLookup
    extends ProcessorApi.Processor[String, String, (String, String)] {
  @transient private var store: VersionedStore[String] = _

  override def init(handle: StatefulProcessorHandle): Unit =
    store = new VersionedStore[String](
      handle.getListState[(Long, String)]("versions",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE),
      historyRetention = 10000L)

  override def process(key: String, rows: Iterator[(String, Timestamp)],
      handle: StatefulProcessorHandle,
      timers: TimerValues): Iterator[(String, String)] =
    rows.toSeq.sortBy(_._2.getTime).iterator.flatMap { case (cmd, t) =>
      if (cmd.startsWith("P:")) { store.put(t.getTime, cmd.drop(2)); None }
      else if (cmd == "SIZE") Some((key, s"n=${store.size}"))
      else Some((key, store.get(cmd.drop(2).toLong)
        .map(v => s"${v._2}@${v._1}").getOrElse("none")))
    }
}
