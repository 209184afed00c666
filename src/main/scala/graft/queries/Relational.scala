package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.load
import Catalog.dec2

/** Relational/analytic query surface (scan, filter+project with pushdown,
  * hash aggregation, broadcast and shuffle joins, semi/anti joins, top-k,
  * ranking windows, set ops).
  *
  * The reference's DSL has none of these as built-ins (SURVEY.md §2.6) —
  * they are the Spark-native analytic layer. Plans are declared via the
  * DataFrame API so Catalyst does pushdown/pruning/join-strategy; small
  * dims are broadcast explicitly so no large-side shuffle survives at
  * scale.
  */
object Relational extends Catalog {

  // -- q1-style pricing summary: map-side partial agg, exact decimal sums.
  q("q_agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
    load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  // -- filter + projection: both must reach the parquet scan (pushdown).
  q("q_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05""") { (s, dir) =>
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
  }

  // -- top-k with total order (tie-break on key): TakeOrderedAndProject,
  //    no global sort at scale.
  q("q_orderby_limit_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, dir) =>
    load(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  // -- fact ⋈ small dim: broadcast hash join (no shuffle of the big side).
  q("q_join_broadcast_dim",
    """SELECT p_brand,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""") { (s, dir) =>
    load(s, dir, "lineitem")
      .join(broadcast(load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
  }

  // -- multiway star join: orders ⋈ customer ⋈ nation ⋈ region, dims all
  //    broadcast; only `orders` streams.
  q("q_join_multiway",
    """SELECT r_name, n_name,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""") { (s, dir) =>
    load(s, dir, "orders")
      .join(broadcast(load(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_value"))
  }

  // -- semi join (EXISTS): customers that placed at least one order.
  q("q_join_semi",
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""") { (s, dir) =>
    load(s, dir, "customer")
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }

  // -- anti join (NOT EXISTS): customers with no high-value orders.
  q("q_join_anti",
    """SELECT c_nationkey, count(*) AS n_customers FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY c_nationkey""") { (s, dir) =>
    load(s, dir, "customer")
      .join(
        load(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
  }

  // -- ranking window function: top order per customer by price.
  q("q_window_rank_per_key",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  // -- distinct (the only set-op beyond union the analytic layer adds).
  q("q_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, dir) =>
    load(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
  }

  // -- pivot: event counts per user spread into per-type columns.
  q("q_pivot",
    """SELECT user_id,
      |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
      |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase
      |FROM events WHERE user_id < 30 GROUP BY user_id""") { (s, dir) =>
    graft.Tables.load(s, dir, "events").filter(col("user_id") < 30)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  // -- intersect / except: the set ops the reference's merge (UNION ALL)
  //    never had.
  q("q_intersect",
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""") { (s, dir) =>
    val c = load(s, dir, "customer")
    c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
      .intersect(c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey"))
  }

  q("q_except",
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 0""") { (s, dir) =>
    load(s, dir, "orders").select("o_custkey")
      .except(load(s, dir, "customer").filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("o_custkey")))
  }

  // -- grouping sets: ROLLUP over (returnflag, linestatus) — subtotals +
  //    grand total in one pass (no reference analogue; Spark-native add).
  q("q_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""") { (s, dir) =>
    load(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("total"))
  }

  // -- CUBE over (orderstatus, orderpriority).
  q("q_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""") { (s, dir) =>
    load(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
  }

  // -- running window frame: cumulative revenue per supplier by ship date
  //    (rowsBetween unboundedPreceding..current).
  q("q_window_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM lineitem WHERE l_suppkey <= 2""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir, "lineitem").filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec2(col("l_extendedprice"))).over(w).cast("double").as("running"))
  }

  // -- lag/lead analytics: per-customer order-value delta.
  q("q_window_lag_delta",
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
      |    lag(CAST(o_totalprice AS DECIMAL(18,2)))
      |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta
      |FROM orders WHERE o_custkey < 50""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    load(s, dir, "orders").filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        (dec2(col("o_totalprice")) - lag(dec2(col("o_totalprice")), 1).over(w))
          .cast("double").as("delta"))
  }

  // -- exact distinct count (oracle) — the HLL sketch variant is
  //    q_approx_distinct (full oracle via operators.HyperLogLog).
  q("q_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    load(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
  }

  // -- exact interpolated quantiles (Spark percentile ≡ DuckDB
  //    quantile_cont, bit-identical interpolation — verified).
  q("q_percentile",
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS median_v,
      |  quantile_cont(value, 0.95) AS p95_v
      |FROM events GROUP BY event_type""") { (s, dir) =>
    load(s, dir, "events").groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("median_v"),
        expr("percentile(value, 0.95)").as("p95_v"))
  }

  // -- batch sessionization: gap-based session ids via the lag + running
  //    sum idiom (new session when > 30 min since the user's previous
  //    event), then per-session stats — the batch complement of the
  //    streaming session windows (q_window_session_*), and the form
  //    backfill jobs use over historical logs. Both window passes share
  //    ONE user_id shuffle (same partitioning/ordering ⇒ Catalyst plans
  //    a single Exchange + Sort), per-user work is linear in events, and
  //    the session agg partial-combines — the shape holds at any scale
  //    unless one user owns a partition-sized history (the same skew
  //    bound the reference's per-key session stores carry). Event-id
  //    tie-break makes equal-timestamp orders total, so session ids are
  //    deterministic in both engines.
  q("q_sessionize",
    """WITH o AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |m AS (SELECT *,
      |  CASE WHEN prev_ts IS NULL
      |         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
      |       ELSE 0 END AS new_s
      |  FROM o),
      |s AS (SELECT *, sum(new_s) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS session_id
      |      FROM m)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
      |  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
      |FROM s GROUP BY user_id, session_id""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
  }

  // -- robust outlier detection: per-event-type median + MAD (median
  //    absolute deviation), flag |value − median| > 3·MAD — the
  //    Hampel-style rule metric pipelines run before alerting, built on
  //    the bit-identical percentile ≡ quantile_cont interpolation
  //    q_percentile already certifies. Two passes by definition (MAD
  //    needs the median first); both aggregate into |event_type| rows
  //    (tiny), so the per-type stats ride broadcast joins back onto the
  //    stream and the comparison runs on UNROUNDED doubles in both
  //    engines — identical arithmetic, exact hash parity. 100 TB note:
  //    exact percentile merges per-partition buffers map-side but holds
  //    a group's values; at extreme cardinality the documented scale
  //    path is approx_percentile(…, accuracy) with the same two-pass
  //    shape — the swap is one function name per pass.
  q("q_outlier_mad",
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT d.event_id, d.event_type, d.value,
      |  round(d.med, 6) AS med, round(m.mad, 6) AS mad
      |FROM dev d JOIN mad m USING (event_type)
      |WHERE d.adev > 3 * m.mad""") { (s, dir) =>
    val ev = load(s, dir, "events")
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(3) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
  }

  // -- HLL-sketch distinct: the "novel sketch" class — partial sketches
  //    merge map-side, constant (m = 64 registers) state per group.
  //    Built on operators.HyperLogLog (NOT approx_count_distinct, whose
  //    register layout is engine-private and therefore unverifiable):
  //    md5-derived registers + all-integer harmonic estimate reproduce
  //    bit-for-bit in DuckDB, so the former rows-only check is now a
  //    full rows+schema+hash oracle. Read out against the exact
  //    distinct count, the q_hll_distinct pattern on a fact table.
  q("q_approx_distinct", {
    import graft.operators.HyperLogLog.{LcTable, LcThreshold}
    s"""WITH t AS (SELECT l_returnflag, CAST(l_partkey AS VARCHAR) AS w
       |           FROM lineitem),
       |h AS (SELECT l_returnflag, w,
       |        CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM t),
       |r AS (SELECT l_returnflag, h % 64 AS j,
       |        max(CASE WHEN h // 64 = 0 THEN 55
       |            ELSE 55 - length(bin(h // 64)) END) AS mj
       |      FROM h GROUP BY l_returnflag, h % 64),
       |s AS (SELECT l_returnflag,
       |        CAST(sum(CASE WHEN mj <= 30 THEN CAST(1 AS BIGINT) << (30 - mj)
       |                 ELSE 0 END) AS BIGINT) AS sp,
       |        count(*) AS np
       |      FROM r GROUP BY l_returnflag),
       |e AS (SELECT l_returnflag, (64 - np) * 1073741824 + sp AS s2,
       |        CAST(64 - np AS BIGINT) AS nz FROM s),
       |raw AS (SELECT l_returnflag, nz,
       |        CAST(${graft.operators.HyperLogLog.AlphaNum} // (s2 * 1000) AS BIGINT) AS re FROM e),
       |x AS (SELECT l_returnflag, CAST(count(DISTINCT w) AS BIGINT) AS n_exact
       |      FROM t GROUP BY l_returnflag)
       |SELECT x.l_returnflag, x.n_exact,
       |  CAST(CASE WHEN nz > 0 AND re <= $LcThreshold
       |       THEN list_extract([${LcTable.mkString(", ")}], CAST(nz AS INT))
       |       ELSE re END AS BIGINT) AS hll_estimate,
       |  nz AS n_zero_registers
       |FROM x JOIN raw USING (l_returnflag)""".stripMargin
  }) { (s, dir) =>
    import graft.operators.HyperLogLog
    val items = load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey").cast("string").as("w"))
    val regs = HyperLogLog.registers(items, "w", Seq("l_returnflag"))
    val exact = items.groupBy("l_returnflag")
      .agg(countDistinct(col("w")).as("n_exact"))
    exact
      .join(HyperLogLog.estimate(regs, Seq("l_returnflag")), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_exact"), col("hll_estimate"),
        col("n_zero_registers"))
  }

  // -- Q3-style shipping priority: selective dim filter broadcast into
  //    orders, then ONE fact-fact shuffle join on the order key, partial
  //    agg, TakeOrderedAndProject top-k. The canonical "two big tables,
  //    one small filter" shape — at scale only lineitem⋈orders shuffles,
  //    and only rows surviving both date filters reach it (pushdown).
  q("q_join_shipping_priority",
    """SELECT o_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""") { (s, dir) =>
    val cutoff = lit("1998-06-01").cast("timestamp")
    val building = load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = load(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      .join(broadcast(building), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    load(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_orderdate", "revenue")
  }

  // -- explicit GROUPING SETS: the general form rollup/cube specialize
  //    ((flag,status), (flag), ()) in ONE pass — Spark expands to a single
  //    Expand + hash agg, so the fact table streams once at any scale.
  q("q_grouping_sets",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""") { (s, dir) =>
    load(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
  }

  // -- distribution window functions: ntile buckets + percent_rank +
  //    cume_dist per customer. The ratios are single IEEE divisions of
  //    exact integers, so they hash bit-identically across engines.
  q("q_window_ntile",
    """SELECT o_custkey, o_orderkey,
      |  ntile(4)       OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist()    OVER w AS cume
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
    load(s, dir, "orders").filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  // -- skew-salted two-phase aggregation through the correctness gate:
  //    the salted partial/merge decomposition must be value-identical to
  //    the plain GROUP BY the oracle runs. event_type has only a handful
  //    of hot keys — exactly the shape whose single-phase shuffle
  //    collapses onto few reducers at 100 TB.
  q("q_skew_salted_agg",
    """SELECT event_type, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type""") { (s, dir) =>
    import graft.functions.SkewOps
    SkewOps.saltedAggregate(load(s, dir, "events"), "event_type", saltFactor = 16,
      partialExprs = Seq(count(lit(1)).as("pc"), sum(dec2(col("value"))).as("ps")),
      mergeExprs = Seq(sum(col("pc")).as("cnt"),
        sum(col("ps")).cast("double").as("total")))
  }

  // -- ordered funnel: view -> click-after-view -> purchase-after-click
  //    per user, folded to stage counts. Each stage is a per-user min over
  //    a key-equi join (shuffle on user_id, AQE-sized) — no window over
  //    the whole event stream and no cross join at any scale.
  q("q_funnel_stages",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click_after_view,
      |       (SELECT count(*) FROM p) AS n_purchase_after_funnel""") { (s, dir) =>
    val ev = load(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min(col("ts")).as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("tc"))
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_funnel")))
  }

  // -- cohort retention: users bucketed by first-seen day, activity
  //    counted per day offset. Two hash aggregations + one key join —
  //    the standard retention matrix at any scale.
  q("q_retention_cohort",
    """WITH f AS (
      |  SELECT user_id, date_trunc('day', min(ts)) AS cohort
      |  FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
      |SELECT cohort, CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
      |  count(*) AS active_users
      |FROM a JOIN f USING (user_id) GROUP BY cohort, day_offset""") { (s, dir) =>
    val ev = load(s, dir, "events")
    val first = ev.groupBy("user_id")
      .agg(date_trunc("day", min(col("ts"))).as("cohort"))
    val active = ev.select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    active.join(first, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  // -- value-picking window functions: first/last/nth over explicit
  //    frames (running vs full partition). Picks are exact value moves —
  //    no float arithmetic — and the (shipdate, orderkey, linenumber)
  //    order is a total order, so results are deterministic.
  q("q_window_firstlast",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  first_value(l_extendedprice) OVER w  AS first_price,
      |  last_value(l_extendedprice)  OVER w2 AS last_price,
      |  nth_value(l_extendedprice, 2) OVER w2 AS second_price
      |FROM lineitem WHERE l_suppkey <= 5
      |WINDOW
      |  w  AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |         ROWS UNBOUNDED PRECEDING),
      |  w2 AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRun = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFull = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    load(s, dir, "lineitem").filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        first(col("l_extendedprice")).over(wRun).as("first_price"),
        last(col("l_extendedprice")).over(wFull).as("last_price"),
        nth_value(col("l_extendedprice"), 2).over(wFull).as("second_price"))
  }

  // -- correlated scalar subquery through the SQL entry path: Catalyst's
  //    RewriteCorrelatedScalarSubquery decorrelates it into an aggregate +
  //    join, so the plan is a shuffle agg + equi-join (no per-row re-scan
  //    at any scale). Each customer's orders at that customer's max value.
  q("q_subquery_correlated",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
      |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)""") { (s, dir) =>
    load(s, dir, "orders").createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM graft_orders_sq o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM graft_orders_sq o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  // -- band (theta) join: facts classified into value ranges via a
  //    BETWEEN join against a tiny band dimension — the OLAP banding
  //    pattern. The non-equi condition forces a nested-loop join, which
  //    is exactly right WHEN the band side broadcasts (5 rows replicated
  //    everywhere, fact side never shuffles); integer cent bounds keep
  //    the oracle exact.
  q("q_band_join",
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('micro', 0, 5000000), ('small', 5000000, 10000000),
      |  ('mid', 10000000, 20000000), ('large', 20000000, 30000000),
      |  ('jumbo', 30000000, 4611686018427387904))
      |SELECT band, count(*) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |JOIN bands ON cents >= lo AND cents < hi
      |GROUP BY band""") { (s, dir) =>
    import s.implicits._
    val bands = Seq(
      ("micro", 0L, 5000000L), ("small", 5000000L, 10000000L),
      ("mid", 10000000L, 20000000L), ("large", 20000000L, 30000000L),
      ("jumbo", 30000000L, Long.MaxValue / 2 + 1)).toDF("band", "lo", "hi")
    load(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(broadcast(bands), col("cents") >= col("lo") && col("cents") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
  }

  // -- CEP-style sequence-pattern matching (Flink-CEP / MATCH_RECOGNIZE
  //    territory — absent from the reference AND from Spark SQL): encode
  //    each user's event history as an ordered type-string, match the
  //    conversion pattern view→clicks*→purchase with a regex, count
  //    occurrences. Shape: one groupBy to build the per-user string
  //    (sort inside the aggregated struct array, no window), then a pure
  //    codegen'd projection; per-user history length bounds the string.
  q("q_pattern_match",
    """SELECT user_id, seq_len, n_conversions FROM (
      |  SELECT user_id, len(s) AS seq_len,
      |    len(regexp_extract_all(s, 'vc*p')) AS n_conversions
      |  FROM (
      |    SELECT user_id,
      |      string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
      |                   WHEN 'purchase' THEN 'p' ELSE 'e' END, ''
      |                 ORDER BY ts, event_id) AS s
      |    FROM events GROUP BY user_id))
      |WHERE n_conversions > 0""") { (s, dir) =>
    val typed = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("e").as("t"))
    typed
      .groupBy("user_id")
      .agg(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(ts, event_id, t))), x -> x.t)"))
        .as("s"))
      .select(col("user_id"), length(col("s")).as("seq_len"),
        size(expr("regexp_extract_all(s, 'vc*p', 0)")).as("n_conversions"))
      .filter(col("n_conversions") > 0)
  }

  // -- per-user event sequences for sequence-model training: each user's
  //    LAST 20 events in time order, rendered as an event-type string.
  //    Scale shape: the last-N cut is TopK.perGroupWithPayload (bounded
  //    buffer, event_type rides the buffer — SCALE rule #3) so a
  //    mega-user never materializes their full history in one task; the
  //    final per-user assembly folds <= 20 rows. Event times are unique
  //    per user (TESTDATA), so the order is total.
  q("q_user_sequences",
    """WITH e AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
      |  FROM events)
      |SELECT user_id, count(*) AS seq_len,
      |  string_agg(event_type, ' ' ORDER BY ts) AS seq
      |FROM e WHERE rn <= 20 GROUP BY user_id""") { (s, dir) =>
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"), col("event_type"))
    val last20 = graft.operators.TopK.perGroupWithPayload(
      ev, "user_id", "event_id", "tsu", "event_type", k = 20, ascending = false)
    // rank 1 = newest; sequence renders oldest-first
    last20.groupBy("user_id")
      .agg(count(lit(1)).as("seq_len"),
        array_join(
          reverse(transform(
            array_sort(collect_list(struct(col("rank"), col("event_type")))),
            x => x.getField("event_type"))),
          " ").as("seq"))
  }

  // -- LIVE per-user sequences — the incremental twin of
  //    q_user_sequences over real file-stream replay: per user, state is
  //    a BOUNDED buffer of the latest 20 (ts, event_type) (the window
  //    store retention analogue — state never grows with history), and
  //    each batch emits the refreshed sequence. Emissions reconcile by
  //    n_seen (events absorbed — strictly monotone per user), so the
  //    final view equals the batch query regardless of batch splits or
  //    arrival order.
  q("q_user_sequences_live",
    """WITH e AS (
      |  SELECT user_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
      |  FROM events)
      |SELECT user_id, count(*) AS seq_len,
      |  string_agg(event_type, ' ' ORDER BY ts) AS seq
      |FROM e WHERE rn <= 20 GROUP BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(raw.schema).parquet(s"$dir/events.parq*")
      .transform(graft.Tables.tsNormalized)
    val stream = GraftStreams(s)
      .stream[Long, String](ev, col("user_id"), col("event_type"), col("ts"))
    val updates = graft.streaming.StatefulOps
      .flatTransformWithState[Long, String, (Long, Seq[(Long, String)]),
        (Long, Long, Long, String)](stream) { (user, rows, state) =>
        var (nSeen, buf) = state.getOption.getOrElse((0L, Seq.empty[(Long, String)]))
        rows.foreach { case (et, t) =>
          val tu = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L // micros
          nSeen += 1L
          buf = ((buf :+ ((tu, et))).sortBy(_._1)).takeRight(20)
        }
        state.update((nSeen, buf))
        Iterator.single((user, nSeen, buf.size.toLong, buf.map(_._2).mkString(" ")))
      }
    val name = s"usl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    updates.toDF("user_id", "n_seen", "seq_len", "seq")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name).groupBy("user_id")
      .agg(max_by(struct(col("seq_len"), col("seq")), col("n_seen")).as("m"))
      .select(col("user_id"), col("m.seq_len").as("seq_len"), col("m.seq").as("seq"))
  }

  // -- time-series similarity search: each user's activity is a 24-dim
  //    hour-of-day count vector; candidates block on the COMPOSED
  //    (peak hour, 2nd-peak hour) key (functions.TimeSeriesBlocking —
  //    users whose two busiest hours both match get compared; single
  //    peak hour alone is only ~24 buckets, quadratic again at extreme
  //    user counts, the composed key gives up to 576 with the same
  //    equi-join shape). Rescoring is EXACT integer squared distance via
  //    the norm/inner-product identity ||a-b||² = ||a||² + ||b||² -
  //    2⟨a,b⟩ — so no densify step, the inner product joins only shared
  //    hours, and every value is a BIGINT (bit-exact oracle for free).
  //    Top-50 closest pairs, id-tie-broken; the top-k is
  //    TakeOrderedAndProject.
  q("q_timeseries_similar",
    """WITH c AS (
      |  SELECT user_id, extract(hour FROM ts) AS h, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |norms AS (SELECT user_id, sum(n * n) AS norm2 FROM c GROUP BY user_id),
      |peak AS (
      |  SELECT user_id,
      |    max(CASE WHEN rn = 1 THEN h END) AS peak_h,
      |    coalesce(max(CASE WHEN rn = 2 THEN h END), -1) AS peak2_h
      |  FROM (
      |    SELECT user_id, h, row_number() OVER (PARTITION BY user_id ORDER BY n DESC, h DESC) AS rn
      |    FROM c) WHERE rn <= 2 GROUP BY user_id),
      |cand AS (
      |  SELECT a.user_id AS ua, b.user_id AS ub, a.peak_h
      |  FROM peak a JOIN peak b ON a.peak_h = b.peak_h AND a.peak2_h = b.peak2_h
      |    AND a.user_id < b.user_id),
      |ip AS (
      |  SELECT cand.ua, cand.ub, sum(ca.n * cb.n) AS inner_p
      |  FROM cand JOIN c ca ON ca.user_id = cand.ua JOIN c cb
      |    ON cb.user_id = cand.ub AND cb.h = ca.h
      |  GROUP BY cand.ua, cand.ub)
      |SELECT cand.ua AS user_a, cand.ub AS user_b, cand.peak_h,
      |  CAST(na.norm2 + nb.norm2 - 2 * coalesce(ip.inner_p, 0) AS BIGINT) AS sqdist
      |FROM cand
      |JOIN norms na ON na.user_id = cand.ua
      |JOIN norms nb ON nb.user_id = cand.ub
      |LEFT JOIN ip ON ip.ua = cand.ua AND ip.ub = cand.ub
      |ORDER BY sqdist, user_a, user_b LIMIT 50""") { (s, dir) =>
    val c = load(s, dir, "events")
      .groupBy(col("user_id"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val norms = c.groupBy("user_id").agg(sum(col("n") * col("n")).as("norm2"))
    val cand = graft.functions.TimeSeriesBlocking.candidates(
      graft.functions.TimeSeriesBlocking.peaks(c))
    val ip = cand
      .join(c.select(col("user_id").as("ua"), col("h"), col("n").as("na")), "ua")
      .join(c.select(col("user_id").as("ub"), col("h"), col("n").as("nb")), Seq("ub", "h"))
      .groupBy("ua", "ub").agg(sum(col("na") * col("nb")).as("inner_p"))
    cand
      .join(norms.select(col("user_id").as("ua"), col("norm2").as("norm_a")), "ua")
      .join(norms.select(col("user_id").as("ub"), col("norm2").as("norm_b")), "ub")
      .join(ip, Seq("ua", "ub"), "left")
      .select(col("ua").as("user_a"), col("ub").as("user_b"), col("peak_h"),
        (col("norm_a") + col("norm_b") - lit(2L) * coalesce(col("inner_p"), lit(0L)))
          .cast("long").as("sqdist"))
      .orderBy(col("sqdist"), col("user_a"), col("user_b"))
      .limit(50)
  }

  // -- SAX symbolization (Lin et al. 2003 — Symbolic Aggregate
  //    approXimation, the time-series-mining discretizer): each user's
  //    value series in time order → 8 PAA segments → one of 4 symbols
  //    per segment against the user's OWN discrete quartiles → an 8-char
  //    SAX word (the motif/anomaly-mining key). Engine-exact variant:
  //    values quantize to integer micro-units (floor(v·10⁶)), so segment
  //    sums, quartile selection, and every comparison are BIGINT (the
  //    classic N(0,1) breakpoints need a float z-normalize — mean/std
  //    summation order would diverge across engines; per-user quartile
  //    breakpoints are the standard equi-depth alternative). Shape: ONE
  //    user-keyed agg; everything after is per-row array arithmetic
  //    (bounded by a user's own event count), zero further shuffles.
  q("q_timeseries_sax",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(floor(value * 1000000) AS BIGINT) AS mv
      |  FROM events),
      |g AS (
      |  SELECT user_id, list(mv ORDER BY us, event_id) AS vals
      |  FROM e GROUP BY user_id),
      |f AS (SELECT user_id, vals, len(vals) AS n, list_sort(vals) AS sorted
      |      FROM g WHERE len(vals) >= 8),
      |qs AS (SELECT user_id, vals, n,
      |  sorted[(n - 1) * 1 // 4 + 1] AS q1,
      |  sorted[(n - 1) * 2 // 4 + 1] AS q2,
      |  sorted[(n - 1) * 3 // 4 + 1] AS q3
      |  FROM f)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  array_to_string([
      |    CASE WHEN CAST(list_sum(vals[(s * n) // 8 + 1 : ((s + 1) * n) // 8]) AS BIGINT)
      |              <= q1 * (((s + 1) * n) // 8 - (s * n) // 8) THEN 'a'
      |         WHEN CAST(list_sum(vals[(s * n) // 8 + 1 : ((s + 1) * n) // 8]) AS BIGINT)
      |              <= q2 * (((s + 1) * n) // 8 - (s * n) // 8) THEN 'b'
      |         WHEN CAST(list_sum(vals[(s * n) // 8 + 1 : ((s + 1) * n) // 8]) AS BIGINT)
      |              <= q3 * (((s + 1) * n) // 8 - (s * n) // 8) THEN 'c'
      |         ELSE 'd' END
      |    for s in range(8)], '') AS sax
      |FROM qs""") { (s, dir) =>
    val ev = load(s, dir, "events").select(col("user_id"),
      struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
        floor(col("value") * 1000000).cast("long").as("mv")).as("r"))
    ev.groupBy("user_id").agg(array_sort(collect_list(col("r"))).as("rs"))
      .filter(size(col("rs")) >= 8)
      .withColumn("vals", transform(col("rs"), _.getField("mv")))
      .withColumn("n", size(col("vals")))
      .withColumn("sorted", array_sort(col("vals")))
      .withColumn("q1", element_at(col("sorted"), expr("CAST((n - 1) * 1 div 4 AS INT) + 1")))
      .withColumn("q2", element_at(col("sorted"), expr("CAST((n - 1) * 2 div 4 AS INT) + 1")))
      .withColumn("q3", element_at(col("sorted"), expr("CAST((n - 1) * 3 div 4 AS INT) + 1")))
      .withColumn("sax", concat_ws("",
        transform(sequence(lit(0), lit(7)), seg => {
          val lo = (seg * col("n")).divide(8).cast("int")
          val hi = ((seg + 1) * col("n")).divide(8).cast("int")
          val segLen = hi - lo
          val segSum = aggregate(
            slice(col("vals"), lo + 1, segLen), lit(0L), (a, x) => a + x)
          when(segSum <= col("q1") * segLen, "a")
            .when(segSum <= col("q2") * segLen, "b")
            .when(segSum <= col("q3") * segLen, "c")
            .otherwise("d")
        })))
      .select(col("user_id"), col("n").cast("long").as("n_events"), col("sax"))
  }

  // ----------------------------------------------- event-sequence mining

  // -- first-order Markov transition matrix over per-user event streams:
  //    counts and micro-probabilities of (prev -> next) event-type pairs —
  //    the sequence-model sanity table (and the base for synthetic-session
  //    generation). One lag window = ONE user_id shuffle (sessionize's
  //    discipline); the transition matrix is |event_types|² rows, so the
  //    total/probability join broadcasts. Probabilities are integer
  //    micro-fractions — engine-exact.
  q("q_event_transitions",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
      |      FROM o WHERE prev IS NOT NULL GROUP BY prev, next),
      |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
      |      FROM c GROUP BY prev)
      |SELECT c.prev, c.next, c.n, t.row_total,
      |  CAST(c.n * 1000000 // t.row_total AS BIGINT) AS p_micro
      |FROM c JOIN t USING (prev)""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // localCheckpoint: the transition matrix is |event_types|² rows; the
    // row-total side must fold IT, not re-run the corpus-wide Window
    // (without the cut, the plan duplicates the lag subtree — PlanSpec
    // pins exactly one Window node)
    val c = load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val t = c.groupBy("prev").agg(sum("n").as("row_total"))
    c.join(broadcast(t), "prev")
      .select(col("prev"), col("next"), col("n"), col("row_total"),
        expr("n * 1000000 div row_total").as("p_micro"))
  }

  // -- LIVE transition mining — the incremental twin over real
  //    file-stream replay: per-user state is ONE record (the latest
  //    event type), each arriving event emits its (prev -> next) pair
  //    exactly once in append mode, and the final counts must equal the
  //    batch matrix. This is the state shape a clickstream pipeline runs
  //    forever: O(users) state, no buffering, no reconciliation (each
  //    pair is emitted once, so the sink-side count is exact under any
  //    batch split). Event times are unique per user (TESTDATA), so the
  //    in-batch sort by ts is the oracle's total order.
  q("q_event_transitions_live",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
      |      FROM o WHERE prev IS NOT NULL GROUP BY prev, next),
      |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
      |      FROM c GROUP BY prev)
      |SELECT c.prev, c.next, c.n, t.row_total,
      |  CAST(c.n * 1000000 // t.row_total AS BIGINT) AS p_micro
      |FROM c JOIN t USING (prev)""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s)
      .stream[Long, String](ev, col("user_id"), col("event_type"), col("ots"))
    val pairs = graft.streaming.StatefulOps
      .flatTransformWithState[Long, String, String, (String, String)](stream) {
        (_, rows, state) =>
          var last = state.getOption.getOrElse("")
          val out = Seq.newBuilder[(String, String)]
          rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
            case (t, _) =>
              if (last.nonEmpty) out += ((last, t))
              last = t
          }
          state.update(last)
          out.result().iterator
      }
    val name = s"etl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    pairs.toDF("prev", "next").writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    // localCheckpoint cuts the memory-sink lineage: the totals side would
    // otherwise self-join the same MemoryPlan (unresolvable attributes)
    val c = s.table(name).groupBy("prev", "next").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val t = c.groupBy("prev").agg(sum("n").as("row_total"))
    c.join(broadcast(t), "prev")
      .select(col("prev"), col("next"), col("n"), col("row_total"),
        expr("n * 1000000 div row_total").as("p_micro"))
  }

  // -- stationary distribution of the event-type Markov chain: 3 rounds
  //    of v ← vP over the transition-count matrix in integer micro units
  //    (per-(prev,next) share = (v·c) DIV row_total, truncated the same
  //    way on both engines — the q_pagerank_dupgraph recipe applied to
  //    behavioral analytics): where user sessions spend their time in
  //    the long run. Scale shape: ONE corpus lag-window pass builds the
  //    |types|² matrix (localCheckpointed); each round is a join over
  //    that bounded matrix, never the corpus; the oracle unrolls the
  //    three rounds as CTEs bit-exactly.
  q("q_event_markov_stationary", {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT c.next AS state,
         |    CAST(sum((v.v * c.n) // t.row_total) AS BIGINT) AS v
         |  FROM c JOIN $prev v ON v.state = c.prev
         |  JOIN t ON t.prev = c.prev
         |  GROUP BY c.next)"""
    s"""WITH o AS (
       |  SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev
       |  FROM events),
       |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
       |      FROM o WHERE prev IS NOT NULL GROUP BY prev, next),
       |t AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
       |      FROM c GROUP BY prev),
       |st AS (SELECT DISTINCT prev AS state FROM c),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
       |v0 AS (SELECT state, CAST(1000000 // k AS BIGINT) AS v
       |       FROM st CROSS JOIN ns),
       |${step("v0", "v1")},
       |${step("v1", "v2")},
       |${step("v2", "v3")}
       |SELECT st.state AS event_type, coalesce(v3.v, 0) AS stationary_micro
       |FROM st LEFT JOIN v3 ON v3.state = st.state""".stripMargin
  }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val c = load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |types|² rows; the loop folds this, not the corpus
    val t = c.groupBy("prev").agg(sum("n").as("row_total"))
      .localCheckpoint()
    val st = c.select(col("prev").as("state")).distinct().localCheckpoint()
    val k = st.count() // |event_types| — bounded by contract
    var v = st.select(col("state"), lit(1000000L / k).as("v"))
    for (_ <- 1 to 3) {
      v = c.join(v, c("prev") === v("state"))
        .join(t, "prev")
        .select(col("next"), expr("(v * n) div row_total").as("sh"))
        .groupBy(col("next").as("state")).agg(sum("sh").as("v"))
        .localCheckpoint()
    }
    st.join(v, Seq("state"), "left")
      .select(col("state").as("event_type"),
        coalesce(col("v"), lit(0L)).as("stationary_micro"))
  }

  // -- OHLC bar aggregation: per (user, 15-minute bar) open/high/low/
  //    close/count over the event value — the time-series downsampling
  //    every metrics pipeline runs. Values quantize to 1e-6 micro units
  //    ONCE (BIGINT from then on), open/close pick the first/last row by
  //    the (ts, event_id) total order via row_number, and both direction
  //    windows plus the bar agg share ONE (user, bar) shuffle.
  q("q_ohlc_bars",
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS vm,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 900 AS win
      |  FROM events),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY user_id, win
      |          ORDER BY ts, event_id) AS rn1,
      |        row_number() OVER (PARTITION BY user_id, win
      |          ORDER BY ts DESC, event_id DESC) AS rn2
      |      FROM e)
      |SELECT user_id, win,
      |  CAST(min(CASE WHEN rn1 = 1 THEN vm END) AS BIGINT) AS open_micro,
      |  CAST(max(vm) AS BIGINT) AS high_micro,
      |  CAST(min(vm) AS BIGINT) AS low_micro,
      |  CAST(min(CASE WHEN rn2 = 1 THEN vm END) AS BIGINT) AS close_micro,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM r GROUP BY user_id, win""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(round(value * 1000000) as bigint)").as("vm"),
        expr("unix_timestamp(ts) div 900").as("win"))
    val asc = Window.partitionBy("user_id", "win").orderBy(col("ts"), col("event_id"))
    val desc = Window.partitionBy("user_id", "win")
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn1", row_number().over(asc))
      .withColumn("rn2", row_number().over(desc))
      .groupBy("user_id", "win")
      .agg(min(when(col("rn1") === 1, col("vm"))).as("open_micro"),
        max("vm").as("high_micro"), min("vm").as("low_micro"),
        min(when(col("rn2") === 1, col("vm"))).as("close_micro"),
        count(lit(1)).as("n_events"))
  }

  // -- shuffle-skew diagnostics: the log₂ histogram of per-key group
  //    sizes for a join/agg key (user_id here) plus the hot-key share —
  //    the "does this shuffle need salting / AQE skew-join" readout an
  //    operator of this engine consults before picking a plan shape.
  //    Bucket = bitlength(group size) via length(bin(n)) — integer on
  //    both engines; at any corpus size this is two hash aggs and a
  //    broadcast 1-row totals cross join (the group-size table never
  //    sorts globally).
  q("q_skew_report",
    """WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS sz
      |           FROM events GROUP BY user_id),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |        CAST(sum(sz) AS BIGINT) AS n_rows,
      |        CAST(max(sz) AS BIGINT) AS max_sz FROM g),
      |h AS (SELECT CAST(length(bin(sz)) AS BIGINT) AS bucket,
      |        CAST(count(*) AS BIGINT) AS n_groups_in_bucket,
      |        CAST(sum(sz) AS BIGINT) AS rows_in_bucket
      |      FROM g GROUP BY 1)
      |SELECT h.bucket, h.n_groups_in_bucket, h.rows_in_bucket,
      |  t.n_groups, t.max_sz,
      |  CAST(t.max_sz * 1000000 // t.n_rows AS BIGINT) AS max_share_micro
      |FROM h CROSS JOIN t""") { (s, dir) =>
    val g = load(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("sz"))
      .localCheckpoint() // group-size table computed once for both sides
    val t = g.agg(count(lit(1)).as("n_groups"), sum("sz").as("n_rows"),
      max("sz").as("max_sz"))
    val h = g.groupBy(length(bin(col("sz"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_groups_in_bucket"),
        sum("sz").as("rows_in_bucket"))
    h.crossJoin(broadcast(t))
      .select(col("bucket"), col("n_groups_in_bucket"), col("rows_in_bucket"),
        col("n_groups"), col("max_sz"),
        expr("max_sz * 1000000 div n_rows").as("max_share_micro"))
  }

  // -- LIVE OHLC bars — the continuously-maintained twin: a streaming
  //    (user, bar) aggregation where open/close ride min_by/max_by over
  //    the (ts, event_id) total order (merge-safe: the argmin/argmax of
  //    a union is the argmin/argmax of the parts, so partial aggregation
  //    and cross-batch merges land exactly where the batch plan does).
  //    Complete mode keeps the full bar table — the state here IS the
  //    result (a production deployment would watermark + append closed
  //    bars; exactness against the batch oracle is the point of the
  //    twin). Final table must hash-equal q_ohlc_bars.
  q("q_ohlc_bars_live",
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS vm,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 900 AS win
      |  FROM events),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY user_id, win
      |          ORDER BY ts, event_id) AS rn1,
      |        row_number() OVER (PARTITION BY user_id, win
      |          ORDER BY ts DESC, event_id DESC) AS rn2
      |      FROM e)
      |SELECT user_id, win,
      |  CAST(min(CASE WHEN rn1 = 1 THEN vm END) AS BIGINT) AS open_micro,
      |  CAST(max(vm) AS BIGINT) AS high_micro,
      |  CAST(min(vm) AS BIGINT) AS low_micro,
      |  CAST(min(CASE WHEN rn2 = 1 THEN vm END) AS BIGINT) AS close_micro,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM r GROUP BY user_id, win""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val bars = ev
      .select(col("user_id"), col("event_id"),
        expr("cast(round(value * 1000000) as bigint)").as("vm"),
        expr("unix_timestamp(ots) div 900").as("win"), col("ots"))
      .groupBy("user_id", "win")
      .agg(min_by(col("vm"), struct(col("ots"), col("event_id"))).as("open_micro"),
        max("vm").as("high_micro"), min("vm").as("low_micro"),
        max_by(col("vm"), struct(col("ots"), col("event_id"))).as("close_micro"),
        count(lit(1)).as("n_events"))
    val name = s"ohlc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    bars.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name)
  }

  // -- conversion latency: per user, seconds from FIRST signup to the
  //    first purchase at-or-after it — the funnel-latency readout
  //    (q_event_funnel counts stages; this measures the gap). Second
  //    granularity via epoch truncation, identical to DuckDB's
  //    date_diff('second') boundary counting. Both aggregations share
  //    the user_id shuffle.
  q("q_conversion_latency",
    """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t1
      |      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t0
      |      WHERE e.event_type = 'purchase'
      |      GROUP BY e.user_id)
      |SELECT p.user_id,
      |  CAST(date_diff('second', s.t0, p.t1) AS BIGINT) AS secs_to_convert
      |FROM p JOIN s USING (user_id)""") { (s, dir) =>
    val ev = load(s, dir, "events")
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t0"))
    ev.filter(col("event_type") === "purchase")
      .join(s0, Seq("user_id"))
      .filter(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min("ts").as("t1"), min("t0").as("t0"))
      .select(col("user_id"),
        (unix_seconds(col("t1")) - unix_seconds(col("t0")))
          .as("secs_to_convert"))
  }

  // -- LIVE conversion latency — the streaming funnel timer: per-user
  //    state is (first signup micros, converted?), TWO longs forever;
  //    the first qualifying purchase emits the latency exactly once
  //    (append mode, one row per converting user, no reconciliation).
  //    Same ts-order discipline as the CEP twin.
  q("q_conversion_latency_live",
    """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t1
      |      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t0
      |      WHERE e.event_type = 'purchase'
      |      GROUP BY e.user_id)
      |SELECT p.user_id,
      |  CAST(date_diff('second', s.t0, p.t1) AS BIGINT) AS secs_to_convert
      |FROM p JOIN s USING (user_id)""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s)
      .stream[Long, String](ev, col("user_id"), col("event_type"), col("ots"))
    val conversions = graft.streaming.StatefulOps
      .flatTransformWithState[Long, String, (Long, Boolean), (Long, Long)](
        stream) { (user, rows, state) =>
        // t0 held in MICROS: the >= comparison runs at full precision
        // (the oracle's e.ts >= s.t0); only the REPORTED latency
        // truncates to seconds (date_diff's boundary counting)
        var (t0u, converted) = state.getOption.getOrElse((-1L, false))
        val out = Seq.newBuilder[(Long, Long)]
        rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
          case (t, ts) =>
            val tu = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
            if (t == "signup" && t0u < 0L) t0u = tu
            else if (t == "purchase" && t0u >= 0L && !converted && tu >= t0u) {
              out += ((user,
                Math.floorDiv(tu, 1000000L) - Math.floorDiv(t0u, 1000000L)))
              converted = true
            }
        }
        state.update((t0u, converted))
        out.result().iterator
      }
    val name = s"cvl_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    conversions.toDF("user_id", "secs_to_convert").writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name)
  }
}
