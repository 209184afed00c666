package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
  * 2007) over a key column — the bounded-memory cardinality summary a
  * corpus intake keeps when the exact distinct-key set is itself a
  * dataset (distinct n-grams / URLs / doc fingerprints at 100 TB).
  * Spark's built-in `approx_count_distinct` is the same sketch but its
  * internal hash/register layout is engine-private; this one routes the
  * hash through md5 and keeps every step on an integer grid, so another
  * SQL engine reproduces the REGISTERS — and therefore the estimate —
  * bit-for-bit (the CountMinSketch discipline applied to cardinality).
  *
  * The reference engine has no sketches (its aggregations materialize
  * per-key state); this is part of the Spark-native analytic layer.
  *
  * Layout: m = 64 registers (p = 6). The 60-bit md5 hash splits into
  * register index j = h mod 64 and a 54-bit remainder w; the register
  * stores max over items of rho(w) = 55 - bitlength(w) (rho = 55 when
  * w = 0) — the "position of the first 1 bit", computed as
  * `length(bin(w))` so both engines share the exact arithmetic.
  *
  * Estimate (all-integer): the harmonic-mean denominator
  * S = Σ_j 2^(30 - M_j) uses 2^-30 units (registers past 30 contribute
  * 0 — identical truncation on both engines; with 60-bit hashes a
  * register needs ~2^36 distinct keys to exceed 30, far past this
  * sketch's regime), and
  * E = alpha_64 · m² / ΣR = (709 · 4096 · 2^30) div (S · 1000)
  * with alpha_64 = 0.709 (the standard constant for m = 64).
  *
  * Scale shape:
  *   - `registers` is ONE hash agg to at most m rows per group — mergeable
  *     (max is idempotent/commutative), bit-identical under any
  *     partitioning, and a union corpus's registers are the element-wise
  *     MAX of the parts' (HyperLogLogSpec pins all three).
  *   - in streaming, the register table IS the state: at most
  *     |groups| · m rows forever, in update mode (q_hll_distinct_live).
  */
object HyperLogLog {

  val M = 64 // registers (p = 6)

  /** rho of the 54-bit remainder: 55 - bitlength(w), 55 when w = 0.
    * `bin(w)` has no leading zeros in either engine, so bitlength is
    * its string length. */
  private def rho(w: Column): Column =
    when(w === 0L, lit(55)).otherwise(lit(55) - length(bin(w)))

  /** Per-group register table: (groupCols..., j, m_j) — one row per
    * NON-EMPTY register (absent register = 0). */
  def registers(items: DataFrame, itemCol: String, groupCols: Seq[String]): DataFrame = {
    // ONE md5Long evaluation feeds both the register index and rho
    // (r15: j and the remainder previously built two structurally
    // different md5 trees, defeating codegen subexpression elimination);
    // h is non-negative (60-bit), so `div 64` == shiftright 6 exactly
    val h = T.md5Long(col(itemCol))
    items
      .select((groupCols.map(col) :+ (h % M).as("j") :+
        rho(shiftright(h, 6)).as("__rho")): _*)
      .groupBy((groupCols.map(col) :+ col("j")): _*)
      .agg(max("__rho").as("m_j"))
  }

  /** alpha_64 · m² in 2^-30 units · 1000: 709 · 4096 · 2^30 (exact).
    * PUBLIC and interpolated into both oracle SQL strings (the LcTable /
    * LcThreshold discipline) — r9 ADVICE caught a hand-written oracle
    * literal that diverged from this value (3118146387509248 vs the true
    * 3118214976372736), so floor(A / (s·1000)) flipped once estimates
    * reached ~10^4. One definition, two engines. */
  val AlphaNum: Long = 709L * 4096L * (1L << 30)

  /** Linear-counting lookup: LcTable(V-1) = round(m · ln(m/V)) for
    * V = 1..m empty registers. Precomputed ONCE here and interpolated as
    * integer literals into both the Spark expression and the DuckDB
    * oracle, so neither engine evaluates a transcendental at query time
    * (the exact-isqrt discipline applied to ln). */
  val LcTable: IndexedSeq[Long] =
    (1 to M).map(v => math.round(M * math.log(M.toDouble / v)))

  /** Small-range threshold 2.5·m (Flajolet et al. §4): below this the
    * raw harmonic estimate is biased and linear counting takes over. */
  val LcThreshold: Long = 5L * M / 2

  /** Integer HLL estimate per group from a register table:
    * S = Σ 2^(30 - m_j) over present registers + 2^30 per absent one;
    * raw E = (709 · 4096 · 2^30) div (S · 1000); when empty registers
    * exist and E ≤ 2.5·m, the linear-counting correction
    * round(m · ln(m/V)) (precomputed [[LcTable]]) replaces it. Emits
    * (groupCols..., hll_estimate, n_zero_registers). */
  def estimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val term = when(col("m_j") <= 30L,
      expr("shiftleft(cast(1 as bigint), cast(30 - m_j as int))")).otherwise(lit(0L))
    val lc = element_at(array(LcTable.map(lit): _*),
      col("n_zero_registers").cast("int"))
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(term).as("__s_present"), count(lit(1)).as("__n_present"))
      .select((groupCols.map(col) :+
        ((lit(M.toLong) - col("__n_present")) * (1L << 30) + col("__s_present"))
          .as("__s") :+
        (lit(M.toLong) - col("__n_present")).as("n_zero_registers")): _*)
      .select((groupCols.map(col) :+
        expr(s"$AlphaNum div (__s * 1000)").as("__raw") :+
        col("n_zero_registers")): _*)
      .select((groupCols.map(col) :+
        when(col("n_zero_registers") > 0L && col("__raw") <= LcThreshold, lc)
          .otherwise(col("__raw")).as("hll_estimate") :+
        col("n_zero_registers")): _*)
  }
}
