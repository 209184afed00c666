package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Reads go straight through `spark.read.parquet` so Catalyst keeps full
  * pushdown: filters and column pruning land in the parquet scan
  * (`PushedFilters` / `ReadSchema` in `.explain`), which is what makes the
  * same plans viable at 100 TB — only the referenced columns and row
  * groups are read.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; read it as long nanos and truncate to a microsecond
    // timestamp (lossless for this data — the generator emits µs values).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }
}
