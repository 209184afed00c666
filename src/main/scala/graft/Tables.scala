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

  /** The generator has emitted events.ts in two encodings across rounds:
    * parquet TIMESTAMP(NANOS) (readable only as long nanos under the
    * nanosAsLong legacy flag) and plain µs timestamps (which Spark 4
    * infers as TIMESTAMP_NTZ). Normalize either to the session
    * TimestampType — identical µs instants under the UTC session TZ — so
    * every downstream window/watermark/unix_micros path sees one type. */
  def eventTs(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts DIV 1000)")
      case org.apache.spark.sql.types.TimestampNTZType => col("ts").cast("timestamp")
      case _ => col("ts")
    }
  }

  /** `df.transform(Tables.tsNormalized)` — [[eventTs]] applied in place. */
  val tsNormalized: DataFrame => DataFrame = df => df.withColumn("ts", eventTs(df))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // legacy flag is a no-op for the µs encoding, required for the nanos one
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") tsNormalized(df) else df
  }
}
