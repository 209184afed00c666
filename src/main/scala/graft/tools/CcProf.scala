package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 measurement scratch tool (guide §1): isolate the
  * ConnectedComponents closure cost from pair generation by running it
  * over a pre-materialized edge list (the persisted aHash signature
  * corpus the image-dedup-serve bench entry uses). Not part of any
  * contract. */
object CcProf {
  def main(args: Array[String]): Unit = {
    val sig = if (args.nonEmpty) args(0) else "target/bench/ahash-sig-10x-sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("CCPROF_AQE", "true"))
      // r16 A/B knob: the CC loop's (Long, Long) message shuffles ride
      // spark.serializer (RDD path — SQL exchanges are unaffected)
      .config("spark.serializer", sys.env.getOrElse("CCPROF_SERIALIZER",
        "org.apache.spark.serializer.JavaSerializer"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.queries.LlmPipeline.ahashPairsFrom(spark.read.parquet(sig))
      .localCheckpoint()
    println(s"[ccprof] edges = ${pairs.count()}")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.operators.ConnectedComponents.run(pairs, "doc_a", "doc_b").count()
      println(f"[ccprof] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n nodes)")
    }
    spark.stop()
  }
}
