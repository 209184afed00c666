package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataEng, LlmPipeline, Relational, StreamsParity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-area registries under
  * `graft.queries`; every entry has a Spark implementation and (where
  * SQL-expressible) a DuckDB oracle with identical column names and
  * engine-exact numerics (decimal-routed float aggregates, md5-derived
  * hashes).
  */
object SparkEntry {
  private val catalogs = Seq(Relational, StreamsParity, LlmPipeline, DataEng)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Yahoo benchmark pipeline through the typed DSL — source, filter,
    * broadcast global-table join, re-key, tumbling windowed count. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_yahoo_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.map(_.oracles).reduce(_ ++ _)
}
