package graft.api

import java.io.File
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{lit, max_by, struct}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.TestSpark.ts
import graft.sources.UpsertView

/** Keyed parquet upsert sink: the queryable materialized-table view
  * (IQ over files — `QueryableStateIntegrationTest` via storage), stored
  * hash-bucketed with per-bucket crash-safe swaps. */
class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 4

  private def bucketOf(key: String): Int =
    spark.range(1).select(UpsertView.bucketOf(lit(key), N)).head().getInt(0)

  /** (path, bytes) of every data file under the bucket dir. */
  private def bucketFiles(path: String, b: Int): Map[String, Seq[Byte]] = {
    val dir = new File(path, s"bucket=$b")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      f.getName -> Files.readAllBytes(f.toPath).toSeq
    }.toMap
  }

  test("streaming table upserts and deletes materialize; untouched buckets keep identical files") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-upsert").toString + "/view"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val table = GraftStreams(spark)
      .table[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    // latest-per-key over the raw changelog keeps tombstones visible as
    // null values for the sink's delete handling
    val view = new KTable[String, String](
      table.df.groupBy($"key")
        .agg(max_by(struct($"value", $"ts"), $"ts").as("m"))
        .select($"key", $"m.value".as("value"), $"m.ts".as("ts")),
      deduped = true)

    // two keys guaranteed to land in different buckets
    val keys = (1 to 32).map(i => s"k$i")
    val kA = keys.head
    val kB = keys.find(k => bucketOf(k) != bucketOf(kA)).get

    val q = GraftSinks.upsertParquet(view, path, ckpt, numBuckets = N)
    try {
      mem.addData((kA, "v1", ts(1000L)), (kB, "w1", ts(1000L)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(after1 === Map(kA -> "v1", kB -> "w1"))
      val bFilesBefore = bucketFiles(path, bucketOf(kB))

      mem.addData((kA, "v2", ts(2000L))) // touches only kA's bucket
      q.processAllAvailable()
      val after2 = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(after2 === Map(kA -> "v2", kB -> "w1"))
      // kB's bucket was not rewritten: same file names, same bytes
      assert(bucketFiles(path, bucketOf(kB)) === bFilesBefore)

      mem.addData((kB, null.asInstanceOf[String], ts(3000L))) // delete
      q.processAllAvailable()
      val after3 = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(after3 === Map(kA -> "v2"))
    } finally q.stop()
  }

  test("several updates to one key in a batch keep only the latest") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft-upsert2").toString + "/view"
    val ckpt = Files.createTempDirectory("graft-upsert2-ckpt").toString
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    // RAW changelog straight into the sink (no pre-aggregation): the
    // sink's own latest-per-key reduce must deduplicate the batch
    val table = GraftStreams(spark)
      .table[String, String](mem.toDF(), $"_1", $"_2", $"_3")
    val q = GraftSinks.upsertParquet(table, path, ckpt, numBuckets = N)
    try {
      mem.addData(("k", "old", ts(1000L)), ("k", "new", ts(2000L)))
      q.processAllAvailable()
      val rows = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(rows.toSeq === Seq(("k", "new"))) // one row, latest value
    } finally q.stop()
  }

  test("random update/delete batches converge to the brute-force map view") {
    val path = Files.createTempDirectory("graft-upsert-prop").toString + "/view"
    val rnd = new scala.util.Random(11)
    val expected = scala.collection.mutable.Map.empty[String, String]
    var t = 0L
    for (_ <- 1 to 6) {
      val batch = (1 to 1 + rnd.nextInt(20)).map { _ =>
        t += 1000
        val k = s"k${rnd.nextInt(12)}"
        val v = if (rnd.nextInt(5) == 0) null else s"v$t" // ~20% deletes
        (k, v, ts(t))
      }
      // brute-force semantics: last write per key wins, null deletes
      batch.foreach { case (k, v, _) =>
        if (v == null) expected.remove(k) else expected.update(k, v)
      }
      UpsertView.merge(batch.toDF("key", "value", "ts"), path, N, "key", "value", "ts")
      val view = spark.read.parquet(path).collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(view === expected.toMap)
    }
  }

  test("merge refuses a bucket count different from the view's layout") {
    val path = Files.createTempDirectory("graft-upsert-nb").toString + "/view"
    UpsertView.merge(Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    val e = intercept[IllegalArgumentException] {
      UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
        path, N + 1, "key", "value", "ts")
    }
    assert(e.getMessage.contains("built with"))
    // the original layout still merges fine
    UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    assert(spark.read.parquet(path).count() === 2)
  }

  test("layout marker is committed before any bucket data (crash window)") {
    import org.apache.spark.sql.functions.udf
    val path = Files.createTempDirectory("graft-upsert-mk").toString + "/view"
    // first merge DIES mid-job (executor failure) — after the layout
    // check but before any bucket commits
    val boom = udf((s: String) => {
      if (s != null) throw new RuntimeException("injected crash"); s
    })
    intercept[Exception] {
      UpsertView.merge(
        Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts")
          .withColumn("value", boom($"value")),
        path, N, "key", "value", "ts")
    }
    // the marker survived the crash, so the view is NOT the refused
    // "pre-marker layout" case — the retry with the same count succeeds
    assert(Files.exists(java.nio.file.Paths.get(path, ".nbuckets")))
    UpsertView.merge(Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    assert(spark.read.parquet(path).count() === 1)
    // and a retry with a DIFFERENT count is still refused
    val e = intercept[IllegalArgumentException] {
      UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
        path, N + 1, "key", "value", "ts")
    }
    assert(e.getMessage.contains("built with"))
  }

  test("a failed FIRST merge does not pin a wrong bucket count on an empty view") {
    import org.apache.spark.sql.functions.udf
    val path = Files.createTempDirectory("graft-upsert-mk0").toString + "/view"
    val boom = udf((s: String) => {
      if (s != null) throw new RuntimeException("injected crash"); s
    })
    // first merge with the WRONG count dies before writing any data —
    // only the early marker lands
    intercept[Exception] {
      UpsertView.merge(
        Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts")
          .withColumn("value", boom($"value")),
        path, N + 7, "key", "value", "ts")
    }
    // no rows ever committed => no layout yet: the intended count merges
    // fine and re-pins the marker
    UpsertView.merge(Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    assert(spark.read.parquet(path).count() === 1)
    // NOW the layout is real data — a different count is refused again
    val e = intercept[IllegalArgumentException] {
      UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
        path, N + 7, "key", "value", "ts")
    }
    assert(e.getMessage.contains("built with"))
  }

  test("a mid-swap backup still refuses a different bucket count") {
    val path = Files.createTempDirectory("graft-upsert-bak").toString + "/view"
    UpsertView.merge(Seq(("k1", "v1", ts(1000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    // simulate a crash mid-swap: cur renamed to .bak, tmp rename not yet
    // done — the view now shows ZERO live bucket= dirs, but the backup
    // holds committed rows recoverable under the ORIGINAL count
    val root = java.nio.file.Paths.get(path)
    val live = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("bucket=")).toList
    assert(live.nonEmpty)
    live.foreach { d =>
      Files.move(d, d.resolveSibling("." + d.getFileName.toString.replace(
        "bucket=", "bak_bucket=")))
    }
    // a retry with a DIFFERENT count must still refuse (re-pinning would
    // restore the backup hashed under the old count)
    val e = intercept[IllegalArgumentException] {
      UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
        path, N + 3, "key", "value", "ts")
    }
    assert(e.getMessage.contains("built with"))
    // recovery + the original count still works and keeps the old row
    UpsertView.recoverAll(path)
    UpsertView.merge(Seq(("k2", "v2", ts(2000L))).toDF("key", "value", "ts"),
      path, N, "key", "value", "ts")
    assert(spark.read.parquet(path).count() === 2)
  }

  test("upsert view resumes from checkpoint after a restart (no reprocessing)") {
    import org.apache.spark.sql.functions.{col, current_timestamp}
    val inDir = Files.createTempDirectory("graft-upres-in").toFile
    val ckpt = Files.createTempDirectory("graft-upres-ckpt").toString
    val path = Files.createTempDirectory("graft-upres-view").toString + "/view"

    // file source (checkpoint-recoverable); key = line, value = line
    def start() = {
      val table = GraftStreams(spark).table[String, String](
        spark.readStream.text(inDir.getAbsolutePath),
        col("value"), col("value"), current_timestamp())
      GraftSinks.upsertParquet(table, path, ckpt, numBuckets = N)
    }

    Files.writeString(new File(inDir, "a.txt").toPath, "k1\nk2\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(path).collect().map(_.getString(0)).sorted.toSeq ===
      Seq("k1", "k2"))

    // restart over the same checkpoint; only the NEW file merges in
    Files.writeString(new File(inDir, "b.txt").toPath, "k3\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(path).collect().map(_.getString(0)).sorted.toSeq ===
      Seq("k1", "k2", "k3"))
  }

  test("interrupted swaps recover from every crash window") {
    val path = Files.createTempDirectory("graft-upsert3").toString + "/view"
    val b = 0
    val cur = new File(path, s"bucket=$b")
    val bak = new File(path, s".bak_bucket=$b")

    // window between the two renames: bucket dir gone, backup present
    Seq(("k1", "v1")).toDF("key", "value").write.parquet(bak.toString)
    UpsertView.recoverAll(path)
    assert(cur.exists() && !bak.exists())
    assert(spark.read.parquet(cur.toString).count() === 1)

    // window after the new dir landed but before backup delete: stale
    // backup must be dropped, live dir untouched
    Seq(("k1", "v2")).toDF("key", "value").write.mode("overwrite").parquet(bak.toString)
    UpsertView.recoverBucket(path, b)
    assert(cur.exists() && !bak.exists())
    assert(spark.read.parquet(cur.toString).head().getString(1) === "v1")
  }
}
