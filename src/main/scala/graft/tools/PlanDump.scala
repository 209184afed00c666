package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-15 measurement tool (guide §1): dump `.explain("formatted")` for
  * declared queries to files (the judge-checkable plan evidence under
  * plans/r15/) and optionally time each query with the bench's timed
  * action (`df.count()`) after one untimed warmup.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.PlanDump <outDir> <q1,q2,...|all> [reps]"
  *
  * Not part of the bench contract — a developer tool; never caches
  * anything across runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r15"
    val qarg = if (args.length > 1) args(1) else "all"
    val reps = if (args.length > 2) args(2).toInt else 0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("PLANDUMP_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names: Seq[String] =
      if (qarg == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else qarg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { q =>
      graft.SparkEntry.queries.get(q) match {
        case None => System.err.println(s"[plandump] unknown query: $q")
        case Some(fn) =>
          try {
            spark.sparkContext.setJobDescription(s"plandump:$q")
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"$q$suffix.txt"),
              plan.getBytes("UTF-8"))
            if (reps > 0) {
              val warm = { val t0 = System.nanoTime(); fn(spark, sfDir).count()
                (System.nanoTime() - t0) / 1e9 }
              val times = (1 to reps).map { _ =>
                val t0 = System.nanoTime()
                fn(spark, sfDir).count()
                (System.nanoTime() - t0) / 1e9
              }
              println(f"[plandump] $q%-36s warm=$warm%7.3f " +
                times.map(t => f"$t%7.3f").mkString(" "))
            } else println(s"[plandump] $q plan written")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $q FAILED: $e")
          }
      }
    }
    spark.stop()
  }
}
