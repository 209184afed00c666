package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables once at write time so
  * repeated co-keyed joins/aggregations read both sides already
  * co-partitioned — at 100 TB this converts every recurring fact⋈fact join
  * from two full shuffles into zero (the batch analogue of the reference's
  * co-partitioned topics requirement,
  * `processor/internals/StreamsPartitionAssignor.java:1063`). */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
