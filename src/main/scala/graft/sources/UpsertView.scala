package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed keyed-upsert materialized view over plain parquet — the
  * storage engine behind `GraftSinks.upsertParquet` (the reference's
  * queryable-state materialization, RocksDB store + changelog compaction
  * collapsed to files).
  *
  * Layout: `path/bucket=<i>/part-*.parquet`, `i = pmod(hash(key), n)`.
  * A micro-batch rewrites ONLY the buckets containing its keys — O(batch ×
  * table/n) per trigger instead of O(table) — so a continuously-updating
  * large view stays cheap; size `n` so one bucket ≈ a comfortable rewrite
  * unit. Readers use `spark.read.parquet(path)`: partition discovery
  * exposes the `bucket` column, and a point lookup that filters
  * `bucket = bucketOf(key, n)` prunes to one directory.
  *
  * All filesystem work goes through the Hadoop FileSystem API, so the
  * view lives wherever the cluster writes (HDFS, local, object stores —
  * note S3 renames are copies; front it with a consistent store or HDFS
  * for high-frequency triggers).
  *
  * Crash safety (per bucket, all dirs Spark-hidden via leading dot):
  * write merged data to a hidden tmp root, rename current →
  * `.bak_bucket=i`, rename tmp into place, delete the backup. Every
  * window recovers: before the first rename a rerun simply rewrites the
  * tmp; between the renames the bucket is restored from `.bak` (checked
  * at sink start and before every merge); after them the stale `.bak` is
  * deleted. Batch replays after recovery are idempotent — the merge reads
  * the current bucket content, which may already include this batch.
  */
object UpsertView {

  /** Bucket id of a key — Spark's Murmur3 `hash`, stable across runs. */
  def bucketOf(key: Column, numBuckets: Int): Column = pmod(hash(key), lit(numBuckets))

  private def fileSystem(path: String): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    new Path(path).getFileSystem(conf)
  }

  private def bucketDir(path: String, b: Int) = new Path(path, s"bucket=$b")
  private def bakDir(path: String, b: Int) = new Path(path, s".bak_bucket=$b")

  /** Roll an interrupted swap forward/back so `bucket=<b>` is live. */
  def recoverBucket(path: String, b: Int): Unit =
    recoverBucket(fileSystem(path), path, b)

  private def recoverBucket(fs: FileSystem, path: String, b: Int): Unit = {
    val cur = bucketDir(path, b)
    val bak = bakDir(path, b)
    if (!fs.exists(cur) && fs.exists(bak)) fs.rename(bak, cur) // died between renames
    else if (fs.exists(cur) && fs.exists(bak)) fs.delete(bak, true) // died pre-delete
  }

  /** The view's bucket count is part of its on-disk layout: merging with
    * a different count would rehash existing rows into buckets outside
    * the touched set and silently drop them. A `.nbuckets` marker pins
    * the layout at first write and every merge validates against it. */
  private def checkBucketCount(fs: FileSystem, path: String, n: Int): Unit = {
    val marker = new Path(path, ".nbuckets")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val existing = try scala.io.Source.fromInputStream(in).mkString.trim.toInt
        finally in.close()
      if (existing != n) {
        // the marker commits BEFORE data, so a failed/aborted first merge
        // can leave a marker on a still-EMPTY view — no rows means no
        // layout yet, and the retry's count may replace it freely. A
        // `.bak_bucket=` entry counts as data: a crash mid-swap renames
        // cur -> .bak before the tmp rename, so a view whose only live
        // bucket is mid-swap shows zero `bucket=` dirs yet its rows are
        // recoverable — re-pinning a different count here would let
        // recoverAll restore them hashed under the OLD count.
        require(!hasBucketData(fs, path),
          s"upsert view at $path was built with $existing buckets; merge called with $n")
        fs.delete(marker, false)
      }
    } else {
      // a marker-less view with data has an UNKNOWN layout (pre-marker
      // build) — refuse rather than guess and silently drop rehashed rows
      require(!hasBucketData(fs, path),
        s"upsert view at $path predates the .nbuckets marker; write the " +
          "original bucket count to that file before merging")
    }
  }

  /** Committed OR recoverable bucket data: live `bucket=` dirs plus
    * `.bak_bucket=` backups from an interrupted swap. */
  private def hasBucketData(fs: FileSystem, path: String): Boolean = {
    val root = new Path(path)
    fs.exists(root) && fs.listStatus(root).exists { st =>
      val n = st.getPath.getName
      n.startsWith("bucket=") || n.startsWith(".bak_bucket=")
    }
  }

  /** Record the layout BEFORE any bucket commits: the count is decided
    * once checkBucketCount passes, so an early marker is always
    * consistent — while a late one leaves a crash window (buckets
    * committed, marker missing) that checkBucketCount would then
    * permanently refuse as an unknown pre-marker layout. */
  private def writeBucketCount(fs: FileSystem, path: String, n: Int): Unit = {
    val marker = new Path(path, ".nbuckets")
    if (!fs.exists(marker)) {
      val out = fs.create(marker, true)
      try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Recover every bucket with a leftover backup (sink startup). */
  def recoverAll(path: String): Unit = {
    val fs = fileSystem(path)
    val root = new Path(path)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(".bak_bucket="))
      .map(_.stripPrefix(".bak_bucket=").toInt)
      .foreach(recoverBucket(fs, path, _))
  }

  /** Merge one micro-batch of (key, value, ts) updates into the view:
    * reduce to latest-per-key, read ONLY the touched buckets, anti-join +
    * union + drop tombstones in a single partitioned write job, then
    * crash-safely swap each touched bucket directory (filesystem renames
    * only — no per-bucket Spark jobs). */
  def merge(updates0: DataFrame, path: String, numBuckets: Int,
      keyCol: String, valueCol: String, tsCol: String): Unit = {
    val spark = updates0.sparkSession
    val fs = fileSystem(path)
    checkBucketCount(fs, path, numBuckets)
    writeBucketCount(fs, path, numBuckets)
    // a non-deduped changelog can carry several updates per key per
    // trigger; only the latest survives in the view (ties on ts broken by
    // value for determinism — ts-only for unorderable value types, the
    // same guard as KTable.latestDF)
    val tieOrder = {
      import org.apache.spark.sql.catalyst.expressions.RowOrdering
      if (RowOrdering.isOrderable(updates0.schema(valueCol).dataType))
        struct(col(tsCol), col(valueCol))
      else struct(col(tsCol))
    }
    val latest = updates0
      .groupBy(col(keyCol))
      .agg(max_by(struct(col(tsCol), col(valueCol)), tieOrder).as("m"))
      .select(col(keyCol), col(s"m.$valueCol").as(valueCol), col(s"m.$tsCol").as(tsCol))
      .withColumn("__bucket", bucketOf(col(keyCol), numBuckets))
      .persist()
    try {
      val touched = latest.select("__bucket").distinct()
        .collect().map(_.getInt(0)).sorted // <= numBuckets ints
      touched.foreach(recoverBucket(fs, path, _))
      val existingDirs = touched.map(bucketDir(path, _))
        .filter(d => fs.exists(d) &&
          fs.listStatus(d).exists(_.getPath.getName.endsWith(".parquet")))
        .map(_.toString)
      val existing =
        if (existingDirs.isEmpty) None
        else Some(spark.read.parquet(existingDirs.toIndexedSeq: _*)
          .select(col(keyCol), col(valueCol), col(tsCol))
          .withColumn("__bucket", bucketOf(col(keyCol), numBuckets)))
      val merged = existing match {
        case Some(curDf) =>
          curDf.join(latest.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
            .unionByName(latest)
        case None => latest
      }
      val live = merged.filter(col(valueCol).isNotNull)
      val tmpRoot = new Path(path, ".tmp_merge")
      if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
      // one job writes every touched bucket; one file per bucket keeps
      // the view's file count = numBuckets
      live.repartition(col("__bucket"))
        .write.partitionBy("__bucket").mode("overwrite").parquet(tmpRoot.toString)
      touched.foreach { b =>
        val cur = bucketDir(path, b)
        val tmp = new Path(tmpRoot, s"__bucket=$b")
        if (fs.exists(cur)) fs.rename(cur, bakDir(path, b))
        if (fs.exists(tmp)) fs.rename(tmp, cur) // absent => bucket fully deleted
        if (fs.exists(bakDir(path, b))) fs.delete(bakDir(path, b), true)
      }
      fs.delete(tmpRoot, true)
    } finally latest.unpersist()
  }
}
