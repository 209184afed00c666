package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole test JVM (guide: one SparkSession per suite). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState topologies (ProcessorApi, live fk join) need
      // RocksDB; it serves every other stateful op too (the reference's
      // store engine)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: per-batch deltas instead of full RocksDB
      // snapshot uploads (the production setting; cuts commit latency)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def ts(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
}
