package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global running sum — the building block behind token-budget
  * sequence packing (and any "position in a global order" computation):
  * an UNPARTITIONED `sum() OVER (ORDER BY ...)` window moves the whole
  * corpus through ONE task, so instead:
  *
  *   1. range-partition on the order key and sort within partitions
  *      (the global order is the partition order — RangePartitioner
  *      assigns ascending key ranges to ascending partition ids);
  *   2. one cheap pass collects the per-partition value totals
  *      (numPartitions longs on the driver — bounded by cluster size,
  *      never data size);
  *   3. a map pass adds each partition's starting offset to its local
  *      running sum.
  *
  * Two scans instead of one, fully parallel, deterministic under any
  * partition count. Mirrors the reference's per-partition log-order
  * accumulation (a Kafka Streams task only ever sums its own partition;
  * the cross-partition offset is the new part a global corpus order
  * needs).
  */
object PrefixSum {

  /** Append `outCol` = EXCLUSIVE running sum of `valueCol` (a long) over
    * the global `orderCols` order: each row gets the sum of all STRICTLY
    * PRIOR rows' values. */
  def exclusive(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .cache() // both passes read the same partitioning
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    // pass 1: per-partition totals (numPartitions rows)
    val partSums = sorted
      .select(spark_partition_id().as("pid"), col(valueCol))
      .groupBy("pid").agg(sum(valueCol).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until sorted.rdd.getNumPartitions).scanLeft(0L) {
      case (acc, pid) => acc + partSums.getOrElse(pid, 0L)
    }.toArray
    // pass 2: local running sum + partition offset
    val out = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var running = offsets(pid)
      it.map { row =>
        val prefix = running
        running += row.getLong(valueIdx)
        Row.fromSeq(row.toSeq :+ prefix)
      }
    }
    spark.createDataFrame(out,
      StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false)))
  }
}
