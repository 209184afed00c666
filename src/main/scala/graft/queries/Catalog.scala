package graft.queries

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Registration DSL for the driver-checked query catalog.
  *
  * Each entry pairs a Spark implementation with (optionally) an ANSI-SQL
  * oracle the driver runs in DuckDB over the same parquet tables; the two
  * results are hash-compared column-sorted (see builder contract). Entries
  * without an oracle get the weaker rows-only check.
  */
trait Catalog {
  private val qs = mutable.LinkedHashMap.empty[String, (SparkSession, String) => DataFrame]
  private val os = mutable.LinkedHashMap.empty[String, String]

  /** Register a query with a DuckDB oracle. */
  protected def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Unit = {
    qs(name) = fn
    if (oracle != null) os(name) = oracle.stripMargin.trim
  }

  /** Register a query with no SQL-expressible oracle (rows-only check). */
  protected def qNoOracle(name: String)(fn: (SparkSession, String) => DataFrame): Unit =
    q(name, null)(fn)

  def queries: Map[String, (SparkSession, String) => DataFrame] = qs.toMap
  def oracles: Map[String, String] = os.toMap
}

object Catalog {
  /** Exact-decimal view of a 2-decimal-valued double column.
    *
    * All monetary doubles in the testdata are exactly `round(x, 2)`, so the
    * cast recovers the exact decimal in both Spark and DuckDB; sums and
    * products stay exact and the final cast back to double is bit-identical
    * across engines — this is what makes float aggregates hash-comparable.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
