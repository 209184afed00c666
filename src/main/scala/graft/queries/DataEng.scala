package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import Catalog.dec2

/** Data-engineering operator surface: the warehouse-maintenance queries a
  * 100 TB training-data deployment runs AROUND the pipeline proper —
  * reshaping (unpivot), profiling and data-quality gates, slowly-changing
  * dimensions, CDC snapshot+changes merge, storage-layout planning
  * (Z-order clustering, small-file compaction), and behavioral rollups
  * (attribution, segments, EWMA smoothing) with live streaming twins.
  *
  * Everything is engine-exact against the DuckDB oracles: money through
  * DECIMAL(18,2) / integer cents, rates in integer micro units via `div`,
  * event values quantized once to BIGINT micros. The reference's DSL has
  * none of these as built-ins (SURVEY.md §2.6) — they are the Spark-native
  * analytic layer alongside [[Relational]].
  */
object DataEng extends Catalog {

  /** Bounded-cell contract, ENFORCED at runtime (r12 VERDICT #6): the
    * layout/histogram queries below run an UNPARTITIONED cum-count window
    * over a cell table that is grid-bounded by construction (<= 65,536 /
    * <= 4,096 rows) — safe, but a future edit to the grid constants could
    * silently single-task a corpus-sized table through that window. This
    * guard asserts the cell KEY domain row-by-row on the (bounded) cell
    * table itself: zero extra passes, and the filter node survives column
    * pruning where a projected-then-dropped assert would not. PlanSpec
    * pins the guard's presence in the executed plan. */
  private[graft] def boundedCells(cells: org.apache.spark.sql.DataFrame,
      key: String, limit: Long, who: String): org.apache.spark.sql.DataFrame =
    cells.where(assert_true(col(key) >= 0 && col(key) < limit,
      lit(s"$who: cell key '$key' escaped [0, $limit) — the bounded " +
        "unpartitioned-window contract requires a grouped re-derivation " +
        "before widening the grid")).isNull)

  // ------------------------------------------------------------ reshaping

  // -- unpivot wide metrics to long form + per-metric rollup: the
  //    wide-to-long reshape every metrics warehouse runs. stack() is a
  //    codegen'd generator — the 4x row expansion happens map-side and
  //    feeds a partial agg, so the shuffle carries |flags|x|metrics|
  //    rows, not the 4x corpus.
  q("q_unpivot_metrics",
    """WITH m AS (
      |  SELECT l_returnflag, 'l_quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem)
      |SELECT l_returnflag, metric, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(v) AS DOUBLE) AS total,
      |  CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi
      |FROM m GROUP BY l_returnflag, metric""") { (s, dir) =>
    load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("""stack(4,
          'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice,
          'l_discount', l_discount, 'l_tax', l_tax) AS (metric, raw)"""))
      .select(col("l_returnflag"), col("metric"), dec2(col("raw")).as("v"))
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n"), sum("v").cast("double").as("total"),
        min("v").cast("double").as("lo"), max("v").cast("double").as("hi"))
  }

  // ------------------------------------------------- profiling / quality

  // -- column-profiling report (the Deequ/Great-Expectations "profile"
  //    primitive): per numeric column n / nulls / distinct / min / max /
  //    sum, all in exact integer cents (testdata money is round(x,2) by
  //    contract). One stack expansion + one hash agg; count(DISTINCT) is
  //    Spark's two-phase partial-distinct agg — no global sort.
  q("q_profile_columns",
    """WITH m AS (
      |  SELECT 'l_quantity' AS column_name, CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'l_discount', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'l_tax', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem)
      |SELECT column_name, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) - count(cents) AS BIGINT) AS n_null,
      |  CAST(count(DISTINCT cents) AS BIGINT) AS n_distinct,
      |  CAST(min(cents) AS BIGINT) AS min_cents,
      |  CAST(max(cents) AS BIGINT) AS max_cents,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM m GROUP BY column_name""") { (s, dir) =>
    load(s, dir, "lineitem")
      .select(expr("""stack(4,
        'l_quantity', l_quantity, 'l_extendedprice', l_extendedprice,
        'l_discount', l_discount, 'l_tax', l_tax) AS (column_name, raw)"""))
      .select(col("column_name"),
        expr("cast(round(raw * 100) as bigint)").as("cents"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - count(col("cents"))).as("n_null"),
        countDistinct(col("cents")).as("n_distinct"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
  }

  // -- data-quality rule report: range / domain rules as conditional
  //    counts, referential integrity as left-join null counts — the gate
  //    a pipeline evaluates before promoting a batch. Each rule is one
  //    partial-agg'd pass (range rules share a scan via one agg); the RI
  //    checks join customer (broadcast dim) and orders (shuffle join on
  //    the fact key — the audit's inherent shape). Five 1-row DFs union'd.
  q("q_dq_rules",
    """SELECT 'quantity_range' AS rule, CAST(count(*) AS BIGINT) AS n_checked,
      |  CAST(count(*) FILTER (NOT (l_quantity >= 1 AND l_quantity <= 50)) AS BIGINT) AS n_failed,
      |  CAST((count(*) - count(*) FILTER (NOT (l_quantity >= 1 AND l_quantity <= 50))) * 1000000 // count(*) AS BIGINT) AS pass_micro
      |FROM lineitem
      |UNION ALL
      |SELECT 'discount_max', CAST(count(*) AS BIGINT),
      |  CAST(count(*) FILTER (l_discount > 0.08) AS BIGINT),
      |  CAST((count(*) - count(*) FILTER (l_discount > 0.08)) * 1000000 // count(*) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'price_positive', CAST(count(*) AS BIGINT),
      |  CAST(count(*) FILTER (l_extendedprice <= 0) AS BIGINT),
      |  CAST((count(*) - count(*) FILTER (l_extendedprice <= 0)) * 1000000 // count(*) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'order_has_customer', CAST(count(*) AS BIGINT),
      |  CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT),
      |  CAST((count(*) - count(*) FILTER (c_custkey IS NULL)) * 1000000 // count(*) AS BIGINT)
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |UNION ALL
      |SELECT 'lineitem_has_order', CAST(count(*) AS BIGINT),
      |  CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT),
      |  CAST((count(*) - count(*) FILTER (o_orderkey IS NULL)) * 1000000 // count(*) AS BIGINT)
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""") { (s, dir) =>
    val li = load(s, dir, "lineitem")
    def rule(df: org.apache.spark.sql.DataFrame, name: String,
        failed: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n_checked"),
          count(when(failed, 1)).as("n_failed"))
        .select(lit(name).as("rule"), col("n_checked"), col("n_failed"),
          expr("(n_checked - n_failed) * 1000000 div n_checked").as("pass_micro"))
    val r1 = rule(li, "quantity_range",
      !(col("l_quantity") >= 1 && col("l_quantity") <= 50))
    val r2 = rule(li, "discount_max", col("l_discount") > 0.08)
    val r3 = rule(li, "price_positive", col("l_extendedprice") <= 0)
    val r4 = rule(
      load(s, dir, "orders").join(broadcast(load(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"), "left"),
      "order_has_customer", col("c_custkey").isNull)
    val r5 = rule(
      li.join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"),
        "left"),
      "lineitem_has_order", col("o_orderkey").isNull)
    r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5)
  }

  // ----------------------------------------------------------- SCD / CDC

  // -- slowly-changing-dimension type-2 history: collapse each user's
  //    event-type runs into validity intervals (valid_from, valid_to,
  //    version, is_current) — the dimension-table maintenance job. Both
  //    windows and the change filter share ONE user_id shuffle; the
  //    open-interval sentinel is the 9999-12-31 epoch on both engines.
  /** Shared SCD2 oracle: event-type runs collapsed into validity
    * intervals; the open-interval sentinel is the 9999-12-31 epoch. */
  private val Scd2Oracle =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (
      |  SELECT user_id, event_type AS status,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      |  FROM o WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, status, valid_from_s,
      |  coalesce(lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY version),
      |           253402214400) AS valid_to_s,
      |  CAST(version AS BIGINT) AS version,
      |  CAST(lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS BIGINT) AS is_current
      |FROM ch""".stripMargin

  q("q_scd2_history", Scd2Oracle) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wv = Window.partitionBy("user_id").orderBy("version")
    load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("status"),
        expr("unix_timestamp(ts)").as("valid_from_s"),
        row_number().over(w).as("version"))
      .select(col("user_id"), col("status"), col("valid_from_s"),
        coalesce(lead(col("valid_from_s"), 1).over(wv),
          lit(253402214400L)).as("valid_to_s"),
        col("version").cast("long").as("version"),
        lead(col("valid_from_s"), 1).over(wv).isNull.cast("long").as("is_current"))
  }

  // -- LIVE SCD2 — dimension maintenance as a changelog: per-user state
  //    is the OPEN interval (status, valid_from, version); a status
  //    change emits the closed predecessor AND the new open row, so each
  //    version appears at most twice in the sink and min(valid_to)
  //    collapses the pair to the interval's final form (the closed row
  //    supersedes the open one; the last version stays open). That is
  //    exactly how a warehouse SCD2 merge job applies a change feed —
  //    and the final table must hash-equal the batch oracle.
  q("q_scd2_history_live", Scd2Oracle) { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sentinel = 253402214400L
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s).stream[Long, String](ev, col("user_id"),
      col("event_type"), col("ots"))
    val rows = graft.streaming.StatefulOps
      .flatTransformWithState[Long, String, (String, Long, Long),
        (Long, String, Long, Long, Long)](stream) { (user, recs, state) =>
        var (status, vf, ver) = state.getOption.getOrElse(("", 0L, 0L))
        val out = Seq.newBuilder[(Long, String, Long, Long, Long)]
        recs.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
          case (t, ts) =>
            val tsS = Math.floorDiv(
              ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L, 1000000L)
            if (status.isEmpty) {
              status = t; vf = tsS; ver = 1L
              out += ((user, status, vf, sentinel, ver)) // open v1
            } else if (t != status) {
              out += ((user, status, vf, tsS, ver)) // close predecessor
              status = t; vf = tsS; ver += 1L
              out += ((user, status, vf, sentinel, ver)) // open successor
            }
        }
        state.update((status, vf, ver))
        out.result().iterator
      }
    val name = s"scd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    rows.toDF("user_id", "status", "valid_from_s", "vt", "version")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name).groupBy("user_id", "version")
      .agg(min("status").as("status"), min("valid_from_s").as("valid_from_s"),
        min("vt").as("valid_to_s"))
      .select(col("user_id"), col("status"), col("valid_from_s"),
        col("valid_to_s"), col("version"),
        (col("valid_to_s") === sentinel).cast("long").as("is_current"))
  }

  // -- CDC apply: merge a keyed snapshot with a change stream — latest
  //    change wins, rows only in the snapshot carry forward, rows only in
  //    the changes insert; each row is tagged with its merge action. The
  //    user_id % 10 carve-outs put all three actions in play (a snapshot
  //    missing "new" users, a change feed missing "dormant" ones). Both
  //    sides reduce to one row per key BEFORE the full-outer join — the
  //    join never sees the raw corpus; max_by merges associatively
  //    (event times are unique per user, TESTDATA), so partial aggs land
  //    exactly where the oracle does.
  q("q_cdc_apply",
    """WITH pre AS (
      |  SELECT user_id,
      |    max_by(event_type, ts) AS snap_type,
      |    max_by(CAST(round(value * 1000000) AS BIGINT), ts) AS snap_value_micro
      |  FROM events WHERE ts < TIMESTAMP '2024-01-16' AND user_id % 10 <> 0
      |  GROUP BY user_id),
      |post AS (
      |  SELECT user_id,
      |    max_by(event_type, ts) AS chg_type,
      |    max_by(CAST(round(value * 1000000) AS BIGINT), ts) AS chg_value_micro,
      |    CAST(count(*) AS BIGINT) AS n_changes
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-16' AND user_id % 10 <> 1
      |  GROUP BY user_id)
      |SELECT coalesce(pre.user_id, post.user_id) AS user_id,
      |  coalesce(chg_type, snap_type) AS final_type,
      |  coalesce(chg_value_micro, snap_value_micro) AS final_value_micro,
      |  coalesce(n_changes, 0) AS n_changes,
      |  CASE WHEN pre.user_id IS NULL THEN 'insert'
      |       WHEN post.user_id IS NULL THEN 'carry'
      |       ELSE 'update' END AS action
      |FROM pre FULL JOIN post ON pre.user_id = post.user_id""") { (s, dir) =>
    val e = load(s, dir, "events").select(col("user_id"), col("ts"),
      col("event_type"), expr("cast(round(value * 1000000) as bigint)").as("vm"))
    val cutoff = lit("2024-01-16").cast("timestamp")
    val pre = e.filter(col("ts") < cutoff && col("user_id") % 10 =!= 0)
      .groupBy("user_id")
      .agg(max_by(col("event_type"), col("ts")).as("snap_type"),
        max_by(col("vm"), col("ts")).as("snap_value_micro"))
    val post = e.filter(col("ts") >= cutoff && col("user_id") % 10 =!= 1)
      .groupBy(col("user_id").as("p_user_id"))
      .agg(max_by(col("event_type"), col("ts")).as("chg_type"),
        max_by(col("vm"), col("ts")).as("chg_value_micro"),
        count(lit(1)).as("n_changes"))
    pre.join(post, col("user_id") === col("p_user_id"), "full")
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        coalesce(col("chg_type"), col("snap_type")).as("final_type"),
        coalesce(col("chg_value_micro"), col("snap_value_micro"))
          .as("final_value_micro"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"),
        when(col("user_id").isNull, "insert")
          .when(col("p_user_id").isNull, "carry")
          .otherwise("update").as("action"))
  }

  // ------------------------------------------------------ storage layout

  // -- Z-order clustering evaluation: bucket (custkey, orderdate) onto a
  //    256x256 grid, bit-interleave to the Z-value, lay rows into 64
  //    equal files under (a) Z-order and (b) linear date-major order,
  //    and score both layouts' zone maps against a 2-D range predicate —
  //    the "should this table be Z-ordered" readout a 100 TB layout job
  //    computes before rewriting. NO global-sort window: the global rank
  //    decomposes into cum-counts over the BOUNDED cell domain (<= 65536
  //    rows, broadcast) + a per-cell partitioned row_number — the same
  //    rank-via-histogram trick a distributed sort uses, expressed so the
  //    oracle can mirror it exactly.
  q("q_zorder_layout", {
    val zbits = (0 to 7).map(i =>
      s"(((bx >> $i) & 1) * 2 + ((by >> $i) & 1)) * ${1L << (2 * i)}")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT o_orderkey, o_custkey,
       |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
       |  FROM orders),
       |lim AS (SELECT max(o_custkey) + 1 AS cmax,
       |    min(day) AS dmin, max(day) - min(day) + 1 AS dspan,
       |    CAST(count(*) AS BIGINT) AS n FROM d),
       |b AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey * 256 // cmax AS BIGINT) AS bx,
       |    CAST((day - dmin) * 256 // dspan AS BIGINT) AS by,
       |    n
       |  FROM d, lim),
       |z AS (SELECT o_orderkey, bx, by, n,
       |    CAST($zbits AS BIGINT) AS zv,
       |    CAST(by * 256 + bx AS BIGINT) AS lv
       |  FROM b),
       |cz AS (SELECT zv, count(*) AS cn FROM z GROUP BY zv),
       |cumz AS (SELECT zv, sum(cn) OVER (ORDER BY zv) - cn AS bef FROM cz),
       |rz AS (SELECT z.bx, z.by,
       |    CAST((cumz.bef + row_number() OVER (PARTITION BY z.zv ORDER BY z.o_orderkey) - 1)
       |         * 64 // z.n AS BIGINT) AS fid
       |  FROM z JOIN cumz USING (zv)),
       |cl AS (SELECT lv, count(*) AS cn FROM z GROUP BY lv),
       |cuml AS (SELECT lv, sum(cn) OVER (ORDER BY lv) - cn AS bef FROM cl),
       |rl AS (SELECT z.bx, z.by,
       |    CAST((cuml.bef + row_number() OVER (PARTITION BY z.lv ORDER BY z.o_orderkey) - 1)
       |         * 64 // z.n AS BIGINT) AS fid
       |  FROM z JOIN cuml USING (lv)),
       |zm AS (SELECT 'zorder' AS layout, fid, min(bx) lo_x, max(bx) hi_x,
       |         min(by) lo_y, max(by) hi_y FROM rz GROUP BY fid
       |       UNION ALL
       |       SELECT 'linear', fid, min(bx), max(bx), min(by), max(by)
       |       FROM rl GROUP BY fid)
       |SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
       |  CAST(count(*) FILTER (hi_x >= 64 AND lo_x <= 127 AND hi_y >= 64 AND lo_y <= 127) AS BIGINT) AS files_touched,
       |  CAST((count(*) - count(*) FILTER (hi_x >= 64 AND lo_x <= 127 AND hi_y >= 64 AND lo_y <= 127)) * 1000000 // count(*) AS BIGINT) AS skip_micro
       |FROM zm GROUP BY layout"""
  }) { (s, dir) =>
    val orders = load(s, dir, "orders")
    val lim = orders.agg(
      (max("o_custkey") + 1).as("cmax"),
      min(expr("unix_timestamp(o_orderdate) div 86400")).as("dmin"),
      (max(expr("unix_timestamp(o_orderdate) div 86400"))
        - min(expr("unix_timestamp(o_orderdate) div 86400")) + 1).as("dspan"),
      count(lit(1)).as("n"))
    val zbits = (0 to 7).map(i =>
      s"((shiftright(bx, $i) & 1) * 2 + (shiftright(by, $i) & 1)) * ${1L << (2 * i)}")
      .mkString(" + ")
    val z = orders.crossJoin(broadcast(lim))
      .select(col("o_orderkey"),
        expr("o_custkey * 256 div cmax").as("bx"),
        expr("(unix_timestamp(o_orderdate) div 86400 - dmin) * 256 div dspan")
          .as("by"),
        col("n"))
      .withColumn("zv", expr(s"cast($zbits as bigint)"))
      .withColumn("lv", expr("by * 256 + bx"))
      .localCheckpoint() // grid projection computed once for both layouts
    // one layout pass: global rank = (cum count of smaller cells,
    // BOUNDED <= 65536 rows so the unpartitioned window is by-contract)
    // + per-cell partitioned row_number; fid = floor(rank * 64 / n)
    def files(key: String, label: String) = {
      val cells = boundedCells(z.groupBy(key).agg(count(lit(1)).as("cn")),
        key, 65536L, "q_zorder_layout")
      val cum = cells.withColumn("bef",
        sum("cn").over(Window.orderBy(key)) - col("cn"))
      z.join(broadcast(cum.select(col(key), col("bef"))), key)
        .withColumn("rn",
          row_number().over(Window.partitionBy(key).orderBy("o_orderkey")))
        .select(col("bx"), col("by"),
          expr("(bef + rn - 1) * 64 div n").as("fid"))
        .groupBy("fid")
        .agg(min("bx").as("lo_x"), max("bx").as("hi_x"),
          min("by").as("lo_y"), max("by").as("hi_y"))
        .select(lit(label).as("layout"), col("lo_x"), col("hi_x"),
          col("lo_y"), col("hi_y"))
    }
    val touched = col("hi_x") >= 64 && col("lo_x") <= 127 &&
      col("hi_y") >= 64 && col("lo_y") <= 127
    files("zv", "zorder").unionAll(files("lv", "linear"))
      .groupBy("layout")
      .agg(count(lit(1)).as("files_total"),
        count(when(touched, 1)).as("files_touched"))
      .select(col("layout"), col("files_total"), col("files_touched"),
        expr("(files_total - files_touched) * 1000000 div files_total")
          .as("skip_micro"))
  }

  // -- Hilbert-curve layout evaluation: the same 256x256 grid, 64-file,
  //    zone-map experiment as q_zorder_layout but with the Hilbert
  //    space-filling curve added — the locality ordering Delta/Iceberg
  //    reach for when Z-order's quadrant jumps hurt (Hilbert never
  //    teleports: adjacent curve positions are adjacent cells). The
  //    curve index is the classic bit-interleave-with-rotation transform
  //    UNROLLED into 8 integer levels (quadrant digit + reflected/
  //    swapped low bits), identical CTE-per-level on both engines —
  //    validated cell-for-cell against the textbook xy2d algorithm on
  //    the full 65536-cell grid. Report: files touched + skip ratio for
  //    the 2-D range predicate under hilbert / zorder / linear.
  q("q_hilbert_layout", {
    val zbits = (0 to 7).map(i =>
      s"(((bx >> $i) & 1) * 2 + ((by >> $i) & 1)) * ${1L << (2 * i)}")
      .mkString(" + ")
    // 8 Hilbert levels: quadrant digit ((3*rx) XOR ry as a CASE table),
    // then keep the reflected/swapped low bits for the next level
    val hLevels = (7 to 0 by -1).map { k =>
      val s = 1L << k
      val prev = if (k == 7) "hz" else s"h${k + 1}"
      s"""h$k AS (
         |  SELECT o_orderkey, bx, by, n, zv, lv,
         |    acc + ${s * s} * (CASE WHEN (hx // $s) % 2 = 1
         |        THEN (CASE WHEN (hy // $s) % 2 = 1 THEN 2 ELSE 3 END)
         |        ELSE (CASE WHEN (hy // $s) % 2 = 1 THEN 1 ELSE 0 END) END) AS acc,
         |    CASE WHEN (hy // $s) % 2 = 0 THEN
         |      CASE WHEN (hx // $s) % 2 = 1 THEN $s - 1 - (hy % $s) ELSE hy % $s END
         |    ELSE hx % $s END AS hx,
         |    CASE WHEN (hy // $s) % 2 = 0 THEN
         |      CASE WHEN (hx // $s) % 2 = 1 THEN $s - 1 - (hx % $s) ELSE hx % $s END
         |    ELSE hy % $s END AS hy
         |  FROM $prev)"""
    }.mkString(",\n")
    def lay(src: String, key: String, label: String) =
      s"""c_$key AS (SELECT $key, count(*) AS cn FROM $src GROUP BY $key),
         |m_$key AS (SELECT $key, sum(cn) OVER (ORDER BY $key) - cn AS bef FROM c_$key),
         |r_$key AS (SELECT z.bx, z.by, '$label' AS layout,
         |    CAST((m.bef + row_number() OVER (PARTITION BY z.$key ORDER BY z.o_orderkey) - 1)
         |         * 64 // z.n AS BIGINT) AS fid
         |  FROM $src z JOIN m_$key m USING ($key))"""
    s"""WITH d AS (
       |  SELECT o_orderkey, o_custkey,
       |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
       |  FROM orders),
       |lim AS (SELECT max(o_custkey) + 1 AS cmax,
       |    min(day) AS dmin, max(day) - min(day) + 1 AS dspan,
       |    CAST(count(*) AS BIGINT) AS n FROM d),
       |b AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey * 256 // cmax AS BIGINT) AS bx,
       |    CAST((day - dmin) * 256 // dspan AS BIGINT) AS by,
       |    n
       |  FROM d, lim),
       |hz AS (SELECT o_orderkey, bx, by, n,
       |    CAST($zbits AS BIGINT) AS zv,
       |    CAST(by * 256 + bx AS BIGINT) AS lv,
       |    CAST(0 AS BIGINT) AS acc, bx AS hx, by AS hy
       |  FROM b),
       |$hLevels,
       |hv AS (SELECT o_orderkey, bx, by, n, zv, lv, acc AS hv FROM h0),
       |${lay("hv", "hv", "hilbert")},
       |${lay("hv", "zv", "zorder")},
       |${lay("hv", "lv", "linear")},
       |zm AS (SELECT layout, fid, min(bx) lo_x, max(bx) hi_x,
       |         min(by) lo_y, max(by) hi_y
       |       FROM (SELECT * FROM r_hv UNION ALL SELECT * FROM r_zv
       |             UNION ALL SELECT * FROM r_lv)
       |       GROUP BY layout, fid)
       |SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
       |  CAST(count(*) FILTER (hi_x >= 64 AND lo_x <= 127 AND hi_y >= 64 AND lo_y <= 127) AS BIGINT) AS files_touched,
       |  CAST((count(*) - count(*) FILTER (hi_x >= 64 AND lo_x <= 127 AND hi_y >= 64 AND lo_y <= 127)) * 1000000 // count(*) AS BIGINT) AS skip_micro
       |FROM zm GROUP BY layout"""
  }) { (s, dir) =>
    val orders = load(s, dir, "orders")
    val lim = orders.agg(
      (max("o_custkey") + 1).as("cmax"),
      min(expr("unix_timestamp(o_orderdate) div 86400")).as("dmin"),
      (max(expr("unix_timestamp(o_orderdate) div 86400"))
        - min(expr("unix_timestamp(o_orderdate) div 86400")) + 1).as("dspan"),
      count(lit(1)).as("n"))
    val zbits = (0 to 7).map(i =>
      s"((shiftright(bx, $i) & 1) * 2 + (shiftright(by, $i) & 1)) * ${1L << (2 * i)}")
      .mkString(" + ")
    var z = orders.crossJoin(broadcast(lim))
      .select(col("o_orderkey"),
        expr("o_custkey * 256 div cmax").as("bx"),
        expr("(unix_timestamp(o_orderdate) div 86400 - dmin) * 256 div dspan")
          .as("by"),
        col("n"))
      .withColumn("zv", expr(s"cast($zbits as bigint)"))
      .withColumn("lv", expr("by * 256 + bx"))
      .withColumn("acc", lit(0L))
      .withColumn("hx", col("bx")).withColumn("hy", col("by"))
    // 8 unrolled levels as chained projections: each level's rx/ry/low
    // bits materialize ONCE per step, so codegen stays linear (a single
    // nested expression would blow up 4^8)
    for (k <- 7 to 0 by -1) {
      val s1 = 1L << k
      z = z
        .withColumn("rx", expr(s"(hx div $s1) % 2"))
        .withColumn("ry", expr(s"(hy div $s1) % 2"))
        .withColumn("acc", col("acc") + lit(s1 * s1) *
          when(col("rx") === 1,
            when(col("ry") === 1, 2L).otherwise(3L))
            .otherwise(when(col("ry") === 1, 1L).otherwise(0L)))
        .withColumn("nx",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s1 - 1) - col("hy") % s1)
              .otherwise(col("hy") % s1))
            .otherwise(col("hx") % s1))
        .withColumn("ny",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(s1 - 1) - col("hx") % s1)
              .otherwise(col("hx") % s1))
            .otherwise(col("hy") % s1))
        .withColumn("hx", col("nx")).withColumn("hy", col("ny"))
    }
    val base = z.select(col("o_orderkey"), col("bx"), col("by"), col("n"),
      col("zv"), col("lv"), col("acc").as("hv"))
      .localCheckpoint() // grid + all three curve keys computed once
    def files(key: String, label: String) = {
      val cells = boundedCells(base.groupBy(key).agg(count(lit(1)).as("cn")),
        key, 65536L, "q_hilbert_layout")
      val cum = cells.withColumn("bef",
        sum("cn").over(Window.orderBy(key)) - col("cn"))
      base.join(broadcast(cum.select(col(key), col("bef"))), key)
        .withColumn("rn",
          row_number().over(Window.partitionBy(key).orderBy("o_orderkey")))
        .select(col("bx"), col("by"),
          expr("(bef + rn - 1) * 64 div n").as("fid"))
        .groupBy("fid")
        .agg(min("bx").as("lo_x"), max("bx").as("hi_x"),
          min("by").as("lo_y"), max("by").as("hi_y"))
        .select(lit(label).as("layout"), col("lo_x"), col("hi_x"),
          col("lo_y"), col("hi_y"))
    }
    val touched = col("hi_x") >= 64 && col("lo_x") <= 127 &&
      col("hi_y") >= 64 && col("lo_y") <= 127
    files("hv", "hilbert").unionAll(files("zv", "zorder"))
      .unionAll(files("lv", "linear"))
      .groupBy("layout")
      .agg(count(lit(1)).as("files_total"),
        count(when(touched, 1)).as("files_touched"))
      .select(col("layout"), col("files_total"), col("files_touched"),
        expr("(files_total - files_touched) * 1000000 div files_total")
          .as("skip_micro"))
  }

  // -- small-file compaction plan: greedy sequential bin-packing of each
  //    source's files (documents as proxies, n_chars as bytes) into
  //    target-sized output files, expressed as prefix-sum DIV target —
  //    the deterministic equivalent of the greedy packer, computable as
  //    ONE per-source window pass (no driver loop, no global sort).
  q("q_compaction_plan",
    """WITH f AS (
      |  SELECT source, doc_id, n_chars,
      |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      |  FROM documents),
      |a AS (SELECT source, (cum - n_chars) // 4096 AS bin, n_chars FROM f)
      |SELECT source, CAST(bin AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  CAST(sum(n_chars) * 1000000 // 4096 AS BIGINT) AS fill_micro
      |FROM a GROUP BY source, bin""") { (s, dir) =>
    val w = Window.partitionBy("source").orderBy("doc_id")
    load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum("n_chars").over(w))
      .select(col("source"),
        expr("(cum - n_chars) div 4096").as("bin"), col("n_chars"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum("n_chars").as("bytes"),
        expr("sum(n_chars) * 1000000 div 4096").as("fill_micro"))
  }

  // ------------------------------------------------- behavioral rollups

  // -- audience segmentation: per-user behavior stats folded into a CASE
  //    segment taxonomy, then rolled up — two hash aggs, the classic
  //    "segment the user base" job. All-integer thresholds.
  q("q_audience_segments",
    """WITH u AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro,
      |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purch,
      |    CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_err
      |  FROM events GROUP BY user_id)
      |SELECT CASE
      |    WHEN n_purch >= 10 THEN 'whale'
      |    WHEN n_purch >= 1 AND n_err * 5 <= n_events THEN 'buyer'
      |    WHEN n_purch >= 1 THEN 'frustrated_buyer'
      |    WHEN n_events >= 50 THEN 'engaged_browser'
      |    ELSE 'casual' END AS segment,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  CAST(sum(value_micro) AS BIGINT) AS value_micro
      |FROM u GROUP BY segment""") { (s, dir) =>
    load(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 1000000) as bigint)")).as("value_micro"),
        count(when(col("event_type") === "purchase", 1)).as("n_purch"),
        count(when(col("event_type") === "error", 1)).as("n_err"))
      .select(
        when(col("n_purch") >= 10, "whale")
          .when(col("n_purch") >= 1 && col("n_err") * 5 <= col("n_events"),
            "buyer")
          .when(col("n_purch") >= 1, "frustrated_buyer")
          .when(col("n_events") >= 50, "engaged_browser")
          .otherwise("casual").as("segment"),
        col("n_events"), col("value_micro"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_users"), sum("n_events").as("n_events"),
        sum("value_micro").as("value_micro"))
  }

  // -- last-touch attribution: credit each purchase to the user's most
  //    recent non-purchase touchpoint (IGNORE NULLS last_value over the
  //    strictly-preceding frame), 'direct' when none — the marketing
  //    rollup. One user_id shuffle for the window, then a tiny hash agg.
  q("q_attribution_last_touch",
    """WITH o AS (
      |  SELECT user_id, event_type, value, ts, event_id,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM events)
      |SELECT coalesce(channel, 'direct') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_conversions,
      |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
      |FROM o WHERE event_type = 'purchase' GROUP BY 1""") { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    load(s, dir, "events")
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("cast(round(value * 1000000) as bigint)")).as("value_micro"))
  }

  // -- LIVE last-touch attribution — the state shape a marketing pipeline
  //    runs forever: per-user state is ONE string (the latest non-purchase
  //    touch); each purchase emits its credited (channel, value) exactly
  //    once in append mode, so the sink-side rollup equals the batch
  //    oracle under any batch split. O(users) state, no buffering.
  q("q_attribution_last_touch_live",
    """WITH o AS (
      |  SELECT user_id, event_type, value, ts, event_id,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM events)
      |SELECT coalesce(channel, 'direct') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_conversions,
      |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
      |FROM o WHERE event_type = 'purchase' GROUP BY 1""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s).stream[Long, (String, Long)](ev,
      col("user_id"),
      struct(col("event_type").as("_1"),
        expr("cast(round(value * 1000000) as bigint)").as("_2")),
      col("ots"))
    val credited = graft.streaming.StatefulOps
      .flatTransformWithState[Long, (String, Long), String, (String, Long)](
        stream) { (_, rows, state) =>
        var lastTouch = state.getOption.getOrElse("")
        val out = Seq.newBuilder[(String, Long)]
        rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
          case ((t, vm), _) =>
            if (t == "purchase")
              out += ((if (lastTouch.isEmpty) "direct" else lastTouch, vm))
            else lastTouch = t
        }
        state.update(lastTouch)
        out.result().iterator
      }
    val name = s"att_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    credited.toDF("channel", "vm").writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name).groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"), sum("vm").as("value_micro"))
  }

  // -- integer-exact EWMA smoothing (alpha = 1/4): the nonlinear per-key
  //    fold s <- s + trunc((x - s) / 4) — truncating division toward zero
  //    on both engines (Scala Long `/` = DuckDB integer `//`; arithmetic
  //    shift would FLOOR and diverge on negative deltas), so every step
  //    is bit-identical. Windows can't express the
  //    recurrence (each step floors), so this is the per-key sorted fold
  //    (mapGroups) — the sessionize shape: state is one accumulator,
  //    group size is a user's history, never the corpus.
  q("q_window_ewma",
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS xm,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      |  FROM events),
      |n AS (SELECT user_id, max(seq) AS n_ev FROM e GROUP BY user_id),
      |rec AS (
      |  SELECT user_id, seq, xm, xm AS sm FROM e WHERE seq = 1
      |  UNION ALL
      |  SELECT e.user_id, e.seq, e.xm, r.sm + CAST((e.xm - r.sm) // 4 AS BIGINT)
      |  FROM rec r JOIN e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(min(sm) AS BIGINT) AS min_ewma_micro,
      |  CAST(max(sm) AS BIGINT) AS max_ewma_micro,
      |  CAST(max(CASE WHEN seq = n_ev THEN sm END) AS BIGINT) AS last_ewma_micro
      |FROM rec JOIN n USING (user_id) GROUP BY user_id""") { (s, dir) =>
    import s.implicits._
    load(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tu"),
        col("event_id"), expr("cast(round(value * 1000000) as bigint)").as("xm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, rows) =>
        var (n, sm, mn, mx) = (0L, 0L, Long.MaxValue, Long.MinValue)
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, xm) =>
          sm = if (n == 0L) xm else sm + ((xm - sm) / 4) // trunc div = DuckDB //
          n += 1
          if (sm < mn) mn = sm
          if (sm > mx) mx = sm
        }
        (user, n, mn, mx, sm)
      }
      .toDF("user_id", "n_events", "min_ewma_micro", "max_ewma_micro",
        "last_ewma_micro")
  }

  // -- LIVE EWMA — the continuously-maintained twin: per-user state is
  //    (count, accumulator); each event emits its smoothed point exactly
  //    once in append mode, and the sink-side rollup (min/max/last by
  //    sequence) hash-equals the batch oracle. The state a metrics
  //    smoother holds forever: two longs per user.
  q("q_window_ewma_live",
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS xm,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      |  FROM events),
      |n AS (SELECT user_id, max(seq) AS n_ev FROM e GROUP BY user_id),
      |rec AS (
      |  SELECT user_id, seq, xm, xm AS sm FROM e WHERE seq = 1
      |  UNION ALL
      |  SELECT e.user_id, e.seq, e.xm, r.sm + CAST((e.xm - r.sm) // 4 AS BIGINT)
      |  FROM rec r JOIN e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(min(sm) AS BIGINT) AS min_ewma_micro,
      |  CAST(max(sm) AS BIGINT) AS max_ewma_micro,
      |  CAST(max(CASE WHEN seq = n_ev THEN sm END) AS BIGINT) AS last_ewma_micro
      |FROM rec JOIN n USING (user_id) GROUP BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s).stream[Long, Long](ev, col("user_id"),
      expr("cast(round(value * 1000000) as bigint)"), col("ots"))
    val points = graft.streaming.StatefulOps
      .flatTransformWithState[Long, Long, (Long, Long), (Long, Long, Long)](
        stream) { (user, rows, state) =>
        var (n, sm) = state.getOption.getOrElse((0L, 0L))
        val out = Seq.newBuilder[(Long, Long, Long)]
        rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
          case (xm, _) =>
            sm = if (n == 0L) xm else sm + ((xm - sm) / 4)
            n += 1
            out += ((user, n, sm))
        }
        state.update((n, sm))
        out.result().iterator
      }
    val name = s"ewm_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    points.toDF("user_id", "seq", "sm").writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("sm").as("min_ewma_micro"),
        max("sm").as("max_ewma_micro"),
        max_by(col("sm"), col("seq")).as("last_ewma_micro"))
  }

  /** Shared CUSUM oracle: one-sided cumulative-sum drift detection,
    * s <- max(0, s + x - k) with reset on alarm (s > h) — Page's test in
    * integer micro units (k = 50, h = 200 in value units). The recursion
    * is additive-integer only, so Spark's per-key fold and DuckDB's
    * recursive CTE are bit-identical. */
  private val CusumOracle =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS xm,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      |  FROM events),
      |n AS (SELECT user_id, max(seq) AS n_ev FROM e GROUP BY user_id),
      |rec AS (
      |  SELECT user_id, seq,
      |    CASE WHEN greatest(0, xm - 50000000) > 200000000 THEN 0
      |         ELSE greatest(0, xm - 50000000) END AS s,
      |    CASE WHEN greatest(0, xm - 50000000) > 200000000 THEN 1 ELSE 0 END AS alarm
      |  FROM e WHERE seq = 1
      |  UNION ALL
      |  SELECT e.user_id, e.seq,
      |    CASE WHEN greatest(0, r.s + e.xm - 50000000) > 200000000 THEN 0
      |         ELSE greatest(0, r.s + e.xm - 50000000) END,
      |    CASE WHEN greatest(0, r.s + e.xm - 50000000) > 200000000 THEN 1 ELSE 0 END
      |  FROM rec r JOIN e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(alarm) AS BIGINT) AS n_alarms,
      |  CAST(max(s) AS BIGINT) AS max_cusum_micro,
      |  CAST(max(CASE WHEN seq = n_ev THEN s END) AS BIGINT) AS last_cusum_micro
      |FROM rec JOIN n USING (user_id) GROUP BY user_id""".stripMargin

  /** One CUSUM step: (state, alarm) after folding `xm` into `s`. */
  private def cusumStep(s: Long, xm: Long): (Long, Long) = {
    val raw = Math.max(0L, s + xm - 50000000L)
    if (raw > 200000000L) (0L, 1L) else (raw, 0L)
  }

  // -- CUSUM drift detection (Page's test): the change-point monitor a
  //    metrics pipeline runs per key — alarms when the cumulative excess
  //    over target crosses the decision threshold, then resets. Same
  //    distributed shape as q_window_ewma: the recursion is a per-key
  //    sorted fold (state = one long), group size is a user's history.
  q("q_cusum_drift", CusumOracle) { (s, dir) =>
    import s.implicits._
    load(s, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tu"),
        col("event_id"), expr("cast(round(value * 1000000) as bigint)").as("xm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, rows) =>
        var (n, sm, alarms, mx) = (0L, 0L, 0L, 0L)
        rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, xm) =>
          val (s1, a) = cusumStep(sm, xm)
          sm = s1; alarms += a; n += 1
          if (sm > mx) mx = sm
        }
        (user, n, alarms, mx, sm)
      }
      .toDF("user_id", "n_events", "n_alarms", "max_cusum_micro",
        "last_cusum_micro")
  }

  // -- LIVE CUSUM — the monitor as it actually deploys: per-user state is
  //    (count, accumulator); each event appends its (s, alarm) point
  //    exactly once, and the sink-side rollup hash-equals the batch
  //    oracle. Alarms fire in-stream (the point of CUSUM) — the batch
  //    twin is the backfill audit.
  q("q_cusum_drift_live", CusumOracle) { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.api.GraftStreams
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val stream = GraftStreams(s).stream[Long, Long](ev, col("user_id"),
      expr("cast(round(value * 1000000) as bigint)"), col("ots"))
    val points = graft.streaming.StatefulOps
      .flatTransformWithState[Long, Long, (Long, Long),
        (Long, Long, Long, Long)](stream) { (user, rows, state) =>
        var (n, sm) = state.getOption.getOrElse((0L, 0L))
        val out = Seq.newBuilder[(Long, Long, Long, Long)]
        rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos)).foreach {
          case (xm, _) =>
            val (s1, a) = cusumStep(sm, xm)
            sm = s1; n += 1
            out += ((user, n, sm, a))
        }
        state.update((n, sm))
        out.result().iterator
      }
    val name = s"cus_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    points.toDF("user_id", "seq", "sm", "alarm").writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    s.table(name).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("alarm").as("n_alarms"),
        max("sm").as("max_cusum_micro"),
        max_by(col("sm"), col("seq")).as("last_cusum_micro"))
  }

  // ------------------------------------------------ governance / stats

  // -- k-anonymity report: equivalence-class sizes over the quasi-
  //    identifier tuple (lang, source, length bucket) — the re-
  //    identification-risk readout a training-data governance pass runs
  //    before release. log2 class-size histogram (the q_skew_report
  //    idiom) + the global k and at-risk mass broadcast onto every row.
  //    Two hash aggs and a 1-row cross join at any corpus size.
  q("q_k_anonymity",
    """WITH cls AS (
      |  SELECT lang, source, n_chars // 100 AS len_bucket,
      |    CAST(count(*) AS BIGINT) AS class_size
      |  FROM documents GROUP BY 1, 2, 3),
      |t AS (SELECT CAST(min(class_size) AS BIGINT) AS k_min,
      |        CAST(count(*) AS BIGINT) AS n_classes,
      |        CAST(sum(class_size) AS BIGINT) AS n_rows,
      |        CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS rows_at_risk
      |      FROM cls),
      |h AS (SELECT CAST(length(bin(class_size)) AS BIGINT) AS bucket,
      |        CAST(count(*) AS BIGINT) AS n_classes_in_bucket,
      |        CAST(sum(class_size) AS BIGINT) AS rows_in_bucket
      |      FROM cls GROUP BY 1)
      |SELECT h.bucket, h.n_classes_in_bucket, h.rows_in_bucket,
      |  t.k_min, t.n_classes, t.rows_at_risk,
      |  CAST(t.rows_at_risk * 1000000 // t.n_rows AS BIGINT) AS risk_micro
      |FROM h CROSS JOIN t""") { (s, dir) =>
    val cls = load(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .localCheckpoint() // class table computed once for both sides
    val t = cls.agg(min("class_size").as("k_min"),
      count(lit(1)).as("n_classes"), sum("class_size").as("n_rows"),
      sum(when(col("class_size") < 5, col("class_size")).otherwise(0L))
        .as("rows_at_risk"))
    cls.groupBy(length(bin(col("class_size"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_classes_in_bucket"),
        sum("class_size").as("rows_in_bucket"))
      .crossJoin(broadcast(t))
      .select(col("bucket"), col("n_classes_in_bucket"), col("rows_in_bucket"),
        col("k_min"), col("n_classes"), col("rows_at_risk"),
        expr("rows_at_risk * 1000000 div n_rows").as("risk_micro"))
  }

  // -- materialized-view delta maintenance: merge a per-(user, type)
  //    count view with an incremental batch — inserts for groups born in
  //    the delta, updates where both sides exist, unchanged for dormant
  //    groups (the % 7 churn carve keeps all three actions in play).
  //    Both sides partial-agg to one row per group BEFORE the full-outer
  //    join; the view is never rebuilt from the corpus — the point of
  //    incremental maintenance.
  q("q_mv_delta_maintenance",
    """WITH base AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS old_n
      |  FROM events WHERE ts < TIMESTAMP '2024-01-05' GROUP BY 1, 2),
      |delta AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS d_n
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-05' AND user_id % 7 <> 0
      |  GROUP BY 1, 2)
      |SELECT coalesce(base.user_id, delta.user_id) AS user_id,
      |  coalesce(base.event_type, delta.event_type) AS event_type,
      |  coalesce(old_n, 0) AS old_n,
      |  coalesce(old_n, 0) + coalesce(d_n, 0) AS new_n,
      |  CASE WHEN base.user_id IS NULL THEN 'insert'
      |       WHEN delta.user_id IS NULL THEN 'unchanged'
      |       ELSE 'update' END AS action
      |FROM base FULL JOIN delta
      |  ON base.user_id = delta.user_id
      |  AND base.event_type = delta.event_type""") { (s, dir) =>
    val e = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val cutoff = lit("2024-01-05").cast("timestamp")
    val base = e.filter(col("ts") < cutoff)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("old_n"))
    val delta = e.filter(col("ts") >= cutoff && col("user_id") % 7 =!= 0)
      .groupBy(col("user_id").as("d_user_id"),
        col("event_type").as("d_event_type"))
      .agg(count(lit(1)).as("d_n"))
    base.join(delta, col("user_id") === col("d_user_id") &&
        col("event_type") === col("d_event_type"), "full")
      .select(coalesce(col("user_id"), col("d_user_id")).as("user_id"),
        coalesce(col("event_type"), col("d_event_type")).as("event_type"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        (coalesce(col("old_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("new_n"),
        when(col("user_id").isNull, "insert")
          .when(col("d_user_id").isNull, "unchanged")
          .otherwise("update").as("action"))
  }

  // -- equi-depth histogram (ANALYZE-style table stats): 16 equal-mass
  //    buckets of l_extendedprice via the bounded-cell-domain rank trick
  //    — values coarsen onto 4096 grid cells, the cum count over the
  //    BOUNDED cell table assigns each cell its bucket, and boundaries
  //    are exact min/max cents per bucket. The same construction as
  //    q_zorder_layout's rank: no global-sort window, the corpus is
  //    touched by one hash agg.
  q("q_histogram_equidepth",
    """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |           FROM lineitem),
      |mx AS (SELECT max(cents) + 1 AS cmax, CAST(count(*) AS BIGINT) AS n FROM c),
      |cell AS (SELECT cents * 4096 // cmax AS cid, cents FROM c, mx),
      |g AS (SELECT cid, CAST(count(*) AS BIGINT) AS cn,
      |        CAST(min(cents) AS BIGINT) AS lo_c, CAST(max(cents) AS BIGINT) AS hi_c
      |      FROM cell GROUP BY cid),
      |cum AS (SELECT *, sum(cn) OVER (ORDER BY cid) - cn AS bef FROM g),
      |bk AS (SELECT CAST(bef * 16 // n AS BIGINT) AS bucket, cn, lo_c, hi_c
      |       FROM cum, mx)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_cells,
      |  CAST(sum(cn) AS BIGINT) AS n_rows,
      |  CAST(min(lo_c) AS BIGINT) AS lo_cents, CAST(max(hi_c) AS BIGINT) AS hi_cents
      |FROM bk GROUP BY bucket""") { (s, dir) =>
    val c = load(s, dir, "lineitem")
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
    val mx = c.agg((max("cents") + 1).as("cmax"), count(lit(1)).as("n"))
    val g = c.crossJoin(broadcast(mx))
      .select(expr("cents * 4096 div cmax").as("cid"), col("cents"), col("n"))
      .groupBy("cid", "n")
      .agg(count(lit(1)).as("cn"), min("cents").as("lo_c"),
        max("cents").as("hi_c"))
    // cum over the <= 4096-row cell table: bounded-by-construction window,
    // contract enforced by the cid-domain guard
    boundedCells(g, "cid", 4096L, "q_histogram_equidepth")
      .withColumn("bef", sum("cn").over(Window.orderBy("cid")) - col("cn"))
      .select(expr("bef * 16 div n").as("bucket"), col("cn"), col("lo_c"),
        col("hi_c"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_cells"), sum("cn").as("n_rows"),
        min("lo_c").as("lo_cents"), max("hi_c").as("hi_cents"))
  }

  /** DuckDB fragment mirroring [[graft.functions.TextFunctions.md5Long]]:
    * first 60 bits of md5 as a non-negative BIGINT. */
  private def sqlMd5Long(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  // -- Bloom-filter semi-join reduction: build a 16384-bit / 2-hash bloom
  //    from the dim-side keys (BUILDING customers), pre-filter the fact
  //    side with it, and report measured false-positive rate vs the exact
  //    semi join — the runtime-filter pattern that cuts a 100 TB fact
  //    shuffle down to near-matching rows before the real join (Spark's
  //    own runtime bloom, made explicit and measurable). md5-derived bit
  //    positions so the oracle sets the same bits. Scale shape: the bit
  //    table is <= 2 |dim| <= m rows and broadcasts; the fact side is
  //    probed by two broadcast semi joins (map-side, no fact shuffle);
  //    the report is three 1-row aggs cross-joined.
  q("q_bloom_semi_reduction", {
    def h(salt: String, key: String) =
      s"${sqlMd5Long(s"'${salt}_' || CAST($key AS VARCHAR)")} % 16384"
    s"""WITH dim AS (SELECT c_custkey FROM customer
       |            WHERE c_mktsegment = 'BUILDING'),
       |bits AS (
       |  SELECT DISTINCT ${h("b1", "c_custkey")} AS pos FROM dim
       |  UNION SELECT DISTINCT ${h("b2", "c_custkey")} FROM dim),
       |probe AS (
       |  SELECT o_orderkey,
       |    ${h("b1", "o_custkey")} AS p1,
       |    ${h("b2", "o_custkey")} AS p2
       |  FROM orders),
       |pass AS (
       |  SELECT o_orderkey FROM probe
       |  WHERE p1 IN (SELECT pos FROM bits) AND p2 IN (SELECT pos FROM bits)),
       |tru AS (SELECT o_orderkey FROM orders
       |        WHERE o_custkey IN (SELECT c_custkey FROM dim))
       |SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
       |  CAST((SELECT count(*) FROM pass) AS BIGINT) AS n_pass_bloom,
       |  CAST((SELECT count(*) FROM tru) AS BIGINT) AS n_true_match,
       |  CAST((SELECT count(*) FROM pass) - (SELECT count(*) FROM tru) AS BIGINT)
       |    AS n_false_pos,
       |  CAST(((SELECT count(*) FROM pass) - (SELECT count(*) FROM tru)) * 1000000
       |    // ((SELECT count(*) FROM orders) - (SELECT count(*) FROM tru)) AS BIGINT)
       |    AS fpr_micro,
       |  CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_bits_set"""
  }) { (s, dir) =>
    import graft.functions.{TextFunctions => T}
    def h(salt: String, key: org.apache.spark.sql.Column) =
      T.md5Long(concat(lit(s"${salt}_"), key.cast("string"))) % 16384
    val dim = load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .localCheckpoint() // dim keys read once for bits + exact semi join
    val bits = dim.select(h("b1", col("c_custkey")).as("pos"))
      .union(dim.select(h("b2", col("c_custkey"))))
      .distinct()
      .localCheckpoint() // <= 2|dim| positions — the broadcast filter
    val orders = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val probe = orders
      .select(col("o_orderkey"), col("o_custkey"),
        h("b1", col("o_custkey")).as("p1"), h("b2", col("o_custkey")).as("p2"))
    val pass = probe
      .join(broadcast(bits), col("p1") === col("pos"), "leftsemi")
      .join(broadcast(bits), col("p2") === col("pos"), "leftsemi")
    val tru = orders.join(broadcast(dim),
      col("o_custkey") === col("c_custkey"), "leftsemi")
    orders.agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(pass.agg(count(lit(1)).as("n_pass_bloom"))))
      .crossJoin(broadcast(tru.agg(count(lit(1)).as("n_true_match"))))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
      .select(col("n_orders"), col("n_pass_bloom"), col("n_true_match"),
        (col("n_pass_bloom") - col("n_true_match")).as("n_false_pos"),
        expr("(n_pass_bloom - n_true_match) * 1000000 div (n_orders - n_true_match)")
          .as("fpr_micro"),
        col("n_bits_set"))
  }

  // -- linear multi-touch attribution: every pre-purchase touch shares
  //    the conversion value equally (credit = value * touches_c DIV
  //    touches_total per channel) — the fairness-spread counterpart of
  //    q_attribution_last_touch. The five running counts ride ONE
  //    user_id window shuffle; the purchase set is then a bounded table
  //    that five 1-row aggs fold (localCheckpointed so the corpus window
  //    runs once).
  q("q_attribution_linear", {
    def cnt(t: String, as: String) =
      s"""count(*) FILTER (event_type ${if (t == "") "<> 'purchase'" else s"= '$t'"})
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS $as"""
    def ch(name: String) =
      s"""SELECT '$name', CAST(sum(vm * n_$name // n_prior) AS BIGINT),
         |    CAST(sum(n_$name) AS BIGINT) FROM p WHERE n_prior > 0"""
    s"""WITH o AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    CAST(round(value * 1000000) AS BIGINT) AS vm,
       |    ${cnt("", "n_prior")},
       |    ${cnt("click", "n_click")},
       |    ${cnt("view", "n_view")},
       |    ${cnt("signup", "n_signup")},
       |    ${cnt("error", "n_error")}
       |  FROM events),
       |p AS (SELECT * FROM o WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT 'click' AS channel,
       |    CAST(sum(vm * n_click // n_prior) AS BIGINT) AS credit_micro,
       |    CAST(sum(n_click) AS BIGINT) AS n_touches FROM p WHERE n_prior > 0
       |  UNION ALL ${ch("view")}
       |  UNION ALL ${ch("signup")}
       |  UNION ALL ${ch("error")}
       |  UNION ALL
       |  SELECT 'direct', CAST(coalesce(sum(vm), 0) AS BIGINT),
       |    CAST(count(*) AS BIGINT) FROM p WHERE n_prior = 0)
       |SELECT channel, credit_micro, n_touches FROM c"""
  }) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def cnt(cond: org.apache.spark.sql.Column) = count(when(cond, 1)).over(w)
    val p = load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        expr("cast(round(value * 1000000) as bigint)").as("vm"),
        cnt(col("event_type") =!= "purchase").as("n_prior"),
        cnt(col("event_type") === "click").as("n_click"),
        cnt(col("event_type") === "view").as("n_view"),
        cnt(col("event_type") === "signup").as("n_signup"),
        cnt(col("event_type") === "error").as("n_error"))
      .filter(col("event_type") === "purchase")
      .localCheckpoint() // corpus window runs once; five aggs fold this
    def ch(name: String) = p.filter(col("n_prior") > 0)
      .agg(sum(expr(s"vm * n_$name div n_prior")).as("credit_micro"),
        sum(col(s"n_$name")).as("n_touches"))
      .select(lit(name).as("channel"), col("credit_micro"), col("n_touches"))
    val direct = p.filter(col("n_prior") === 0)
      .agg(coalesce(sum("vm"), lit(0L)).as("credit_micro"),
        count(lit(1)).as("n_touches"))
      .select(lit("direct").as("channel"), col("credit_micro"),
        col("n_touches"))
    ch("click").unionAll(ch("view")).unionAll(ch("signup"))
      .unionAll(ch("error")).unionAll(direct)
  }

  // ------------------------------------------------- time-series analysis

  // -- integer-exact lag-k autocorrelation of the daily event-count
  //    series, per event type, lags 1..7 — the seasonality probe a
  //    metrics warehouse runs over ingest volumes (a spike at lag 7 =
  //    weekly cycle, see q_seasonality_dow for the per-dow readout).
  //    Engine-exact recipe: daily deviations land on a scale-free
  //    1e-4 grid FIRST — e_d = (1e4·(N·c_d − S)) div (N·S), signed
  //    truncating div on both engines (SignedDivisionSpec) — then
  //    r_micro = (1e6 · Σ e_d·e_{d+k}) div (Σ e_d²). Because e is
  //    relative (basis points), every intermediate fits Long at ANY
  //    corpus size: overflow needs |e| > ~5.4e5 = a 54x daily swing at
  //    N = 31. Scale shape: the corpus is touched ONCE (one hash agg to
  //    |types|·|days| rows); deviations, the 7-lag self-join and both
  //    sums fold that bounded table, with the totals broadcast.
  q("q_autocorr_daily",
    """WITH e AS (SELECT event_type,
      |        CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
      |      FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
      |        CAST(sum(c) AS BIGINT) AS s FROM c GROUP BY 1),
      |dev AS (SELECT c.event_type, c.day,
      |          CAST((10000 * (t.nd * c.c - t.s)) // (t.nd * t.s) AS BIGINT) AS ed
      |        FROM c JOIN t USING (event_type)),
      |den AS (SELECT event_type, CAST(sum(ed * ed) AS BIGINT) AS den,
      |          CAST(count(*) AS BIGINT) AS n_days FROM dev GROUP BY 1),
      |lg AS (SELECT a.event_type, CAST(l.lag AS BIGINT) AS lag,
      |         CAST(sum(a.ed * b.ed) AS BIGINT) AS num,
      |         CAST(count(*) AS BIGINT) AS n_pairs
      |       FROM dev a
      |       CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |       JOIN dev b ON b.event_type = a.event_type
      |         AND b.day = a.day + l.lag
      |       GROUP BY 1, 2)
      |SELECT lg.event_type, lg.lag, den.n_days, lg.n_pairs,
      |  CAST((1000000 * lg.num) // den.den AS BIGINT) AS r_micro
      |FROM lg JOIN den USING (event_type)""") { (s, dir) =>
    val e = load(s, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
    val c = e.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .localCheckpoint() // |types|·|days| rows; the corpus pass runs once
    val t = c.groupBy("event_type").agg(count(lit(1)).as("nd"), sum("c").as("s"))
    val dev = c.join(broadcast(t), "event_type")
      .select(col("event_type"), col("day"),
        expr("(10000 * (nd * c - s)) div (nd * s)").as("ed"))
      .localCheckpoint() // reused by den + 7-lag join
    val den = dev.groupBy("event_type")
      .agg(sum(expr("ed * ed")).as("den"), count(lit(1)).as("n_days"))
    val lagged = dev
      .withColumn("lag", explode(array((1 to 7).map(l => lit(l.toLong)): _*)))
      .withColumn("day2", col("day") + col("lag"))
    val num = lagged
      .join(dev.toDF("event_type", "day2", "ed2"), Seq("event_type", "day2"))
      .groupBy("event_type", "lag")
      .agg(sum(expr("ed * ed2")).as("num"), count(lit(1)).as("n_pairs"))
    num.join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag"), col("n_days"), col("n_pairs"),
        expr("(1000000 * num) div den").as("r_micro"))
  }

  // -- day-of-week seasonality profile per event type: count, traffic
  //    share and deviation from the uniform 1/7 share, all in integer
  //    micro units. dow = epoch-day mod 7 (day 0 = a Thursday) — the
  //    timezone/locale-free day-of-week both engines compute identically
  //    from the same integer. One hash agg over the corpus to |types|·7
  //    rows; totals broadcast back.
  /** Oracle shared by the batch and live dow-profile twins (identical
    * final state by construction). */
  private val SqlSeasonalityDow: String =
    """WITH e AS (SELECT event_type,
      |        CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |d AS (SELECT event_type, CAST(day % 7 AS BIGINT) AS dow,
      |        CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM d GROUP BY 1)
      |SELECT d.event_type, d.dow, d.n,
      |  CAST(d.n * 1000000 // t.tot AS BIGINT) AS share_micro,
      |  CAST(d.n * 1000000 // t.tot - 142857 AS BIGINT) AS dev_micro
      |FROM d JOIN t USING (event_type)""".stripMargin

  /** Share/deviation readout over a (event_type, dow, n) count table
    * (shared by the batch and live dow-profile twins). */
  private def dowReadout(d: org.apache.spark.sql.DataFrame) = {
    val t = d.groupBy("event_type").agg(sum("n").as("tot"))
    d.join(broadcast(t), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        expr("n * 1000000 div tot").as("share_micro"),
        expr("n * 1000000 div tot - 142857").as("dev_micro"))
  }

  q("q_seasonality_dow", SqlSeasonalityDow) { (s, dir) =>
    dowReadout(load(s, dir, "events")
      .select(col("event_type"),
        expr("(unix_timestamp(ts) div 86400) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
      .localCheckpoint()) // |types|·7 rows; totals fold this, not the corpus
  }

  // -- LIVE dow-profile maintenance — the streaming shape: state is the
  //    bounded (event_type, dow) count table (≤ |types|·7 rows forever),
  //    maintained by one streaming hash agg in complete mode; the
  //    share/deviation readout runs on the sunk state, so the final
  //    answer matches the batch oracle exactly (the q_hll_distinct_live
  //    pattern for the seasonality family).
  q("q_seasonality_dow_live", SqlSeasonalityDow) { (s, dir) =>
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawE = s.read.parquet(s"$dir/events.parquet")
    val ev = s.readStream.schema(rawE.schema).parquet(s"$dir/events.parq*")
      .transform(df => df.withColumn("ots", graft.Tables.eventTs(df)))
    val counts = ev
      .select(col("event_type"),
        expr("(unix_timestamp(ots) div 86400) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
    val name = s"dow_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    counts.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    dowReadout(s.table(name).localCheckpoint())
  }

  // -- gaps-and-islands: per-user daily activity streaks — consecutive
  //    active days collapse into islands via the classic
  //    day − row_number() grouping key (constant within a run of
  //    consecutive days, distinct across gaps), then per-user rollup:
  //    streak count, active days, longest streak, and the most recent
  //    streak via max_by(len, end_day) (argmax semantics agree across
  //    engines; end days are unique per user by construction). The
  //    per-user window rides the DISTINCT (user, day) table, bounded by
  //    the per-key history contract (the sessionize/EWMA shape) — state
  //    is a user's active-day set, never the corpus.
  q("q_user_streaks",
    """WITH d AS (SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |g AS (SELECT user_id, day,
      |        day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |          AS grp
      |      FROM d),
      |s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
      |        CAST(max(day) AS BIGINT) AS end_day
      |      FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(sum(len) AS BIGINT) AS active_days,
      |  CAST(max(len) AS BIGINT) AS max_streak,
      |  CAST(max_by(len, end_day) AS BIGINT) AS last_streak,
      |  CAST(max(end_day) AS BIGINT) AS last_day
      |FROM s GROUP BY user_id""") { (s, dir) =>
    val d = load(s, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .distinct()
    // bounded window: a user's distinct active days (per-key history)
    val g = d.withColumn("grp", col("day") -
      row_number().over(Window.partitionBy("user_id").orderBy("day")))
    val st = g.groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), max("day").as("end_day"))
    st.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum("len").as("active_days"),
        max("len").as("max_streak"),
        max_by(col("len"), col("end_day")).as("last_streak"),
        max("end_day").as("last_day"))
  }

  // ----------------------------------------------------------- governance

  /** Inverse-CDF magnitude table for seeded Laplace noise (b = 1, in
    * 1e-3 count units): LapTable(i) = round(−1000·ln((i+0.5)/1024)) for
    * i = 0..1023. Precomputed ONCE and interpolated as integer literals
    * into both engines (the HyperLogLog.LcTable discipline), so no
    * transcendental evaluates at query time. */
  private val LapTable: IndexedSeq[Long] =
    (0 until 1024).map(i => math.round(-1000.0 * math.log((i + 0.5) / 1024.0)))

  // -- DETERMINISTIC TWIN of a Laplace count release (ε = 1,
  //    sensitivity 1 — Dwork et al. 2006): this query benchmarks the
  //    ENGINE PLUMBING of the mechanism — the inverse-CDF magnitude
  //    table ([[LapTable]]), sign/bucket selection, milli-unit additive
  //    noise — NOT a private release. The "noise" here is a
  //    deterministic function of the public group key (u = md5(key) mod
  //    2048), and the output deliberately exposes the true count n and
  //    noise_milli so the oracle can pin the arithmetic bit-exactly; by
  //    construction it provides NO privacy (r9 ADVICE — a real DP
  //    release needs fresh per-release randomness, which no
  //    deterministic-twin oracle can pin; swap element selection for a
  //    CSPRNG draw and drop n/noise_milli to deploy the mechanism).
  //    Scale: one hash agg, noise is a per-GROUP map over |groups| rows.
  q("q_dp_noisy_counts", {
    val lits = LapTable.mkString(", ")
    s"""WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |           FROM events GROUP BY 1),
       |u AS (SELECT event_type, n,
       |        ${sqlMd5Long("event_type")} % 2048 AS u FROM c)
       |SELECT event_type, n,
       |  CAST((CASE WHEN u >= 1024 THEN 1 ELSE -1 END) *
       |       list_extract([$lits], CAST(u % 1024 AS INT) + 1) AS BIGINT)
       |    AS noise_milli,
       |  CAST(n * 1000 + (CASE WHEN u >= 1024 THEN 1 ELSE -1 END) *
       |       list_extract([$lits], CAST(u % 1024 AS INT) + 1) AS BIGINT)
       |    AS noisy_milli
       |FROM u""".stripMargin
  }) { (s, dir) =>
    val lap = array(LapTable.map(lit): _*)
    load(s, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("u", expr(
        "cast(conv(substring(md5(event_type), 1, 15), 16, 10) as bigint) % 2048"))
      .withColumn("noise_milli",
        (when(col("u") >= 1024, lit(1L)).otherwise(lit(-1L)) *
          element_at(lap, (col("u") % 1024).cast("int") + 1)))
      .select(col("event_type"), col("n"), col("noise_milli"),
        (col("n") * 1000L + col("noise_milli")).as("noisy_milli"))
  }

  // -- l-diversity report, the companion readout to q_k_anonymity
  //    (Machanavajjhala et al., ICDE 2006): k-anonymity bounds class
  //    SIZE, but a class whose sensitive attribute is homogeneous leaks
  //    anyway — here, per quasi-identifier class (source, length bucket),
  //    how many distinct sensitive values (lang) it holds and how
  //    dominant the top one is, plus the global minimum l and the row
  //    mass in classes below l = 3. Scale: ONE corpus hash agg to the
  //    (class, lang) table, everything after folds that bounded table
  //    with the 1-row totals broadcast.
  q("q_l_diversity",
    """WITH sl AS (
      |  SELECT source, n_chars // 100 AS len_bucket, lang,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2, 3),
      |cls AS (SELECT source, len_bucket,
      |          CAST(sum(n) AS BIGINT) AS class_size,
      |          CAST(count(*) AS BIGINT) AS l_distinct,
      |          CAST(max(n) AS BIGINT) AS top_lang_n
      |        FROM sl GROUP BY 1, 2),
      |t AS (SELECT CAST(min(l_distinct) AS BIGINT) AS l_min,
      |        CAST(sum(class_size) AS BIGINT) AS n_rows,
      |        CAST(sum(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END) AS BIGINT)
      |          AS rows_at_risk
      |      FROM cls)
      |SELECT cls.source, cls.len_bucket, cls.class_size, cls.l_distinct,
      |  CAST(top_lang_n * 1000000 // class_size AS BIGINT) AS dominant_micro,
      |  t.l_min, t.rows_at_risk,
      |  CAST(t.rows_at_risk * 1000000 // t.n_rows AS BIGINT) AS risk_micro
      |FROM cls CROSS JOIN t""") { (s, dir) =>
    val sl = load(s, dir, "documents")
      .groupBy(col("source"), expr("n_chars div 100").as("len_bucket"),
        col("lang"))
      .agg(count(lit(1)).as("n"))
    val cls = sl.groupBy("source", "len_bucket")
      .agg(sum("n").as("class_size"), count(lit(1)).as("l_distinct"),
        max("n").as("top_lang_n"))
      .localCheckpoint() // class table computed once for both sides
    val t = cls.agg(min("l_distinct").as("l_min"),
      sum("class_size").as("n_rows"),
      sum(when(col("l_distinct") < 3, col("class_size")).otherwise(0L))
        .as("rows_at_risk"))
    cls.crossJoin(broadcast(t))
      .select(col("source"), col("len_bucket"), col("class_size"),
        col("l_distinct"),
        expr("top_lang_n * 1000000 div class_size").as("dominant_micro"),
        col("l_min"), col("rows_at_risk"),
        expr("rows_at_risk * 1000000 div n_rows").as("risk_micro"))
  }

  // -- seasonal anomaly detection on daily ingest volumes: residual of
  //    each (event type, day) count against its day-of-week mean (the
  //    q_seasonality_dow profile), flagged when the absolute residual
  //    exceeds 3x the type's median absolute residual — the
  //    volume-monitoring alarm a metrics warehouse runs nightly.
  //    All-integer: expected = (dow sum * 1e6) div dow days; the median
  //    absolute residual is the q_length_quantiles discrete selection at
  //    floor((n-1)/2), so both engines pick the SAME element. Scale: one
  //    corpus hash agg to |types|·|days| rows; the dow profile, residuals
  //    and the per-type median all fold that bounded table (per-type
  //    windows over |days| rows).
  q("q_seasonal_anomaly",
    """WITH e AS (SELECT event_type,
      |        CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
      |      FROM e GROUP BY 1, 2),
      |dw AS (SELECT event_type, day % 7 AS dow, CAST(sum(c) AS BIGINT) AS s,
      |         CAST(count(*) AS BIGINT) AS nd FROM c GROUP BY 1, 2),
      |r AS (SELECT c.event_type, c.day, c.c,
      |        CAST(s * 1000000 // nd AS BIGINT) AS expected_micro,
      |        CAST(c.c * 1000000 - (s * 1000000 // nd) AS BIGINT) AS resid_micro
      |      FROM c JOIN dw ON dw.event_type = c.event_type
      |        AND dw.dow = c.day % 7),
      |o AS (SELECT event_type, day, c, expected_micro, resid_micro,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY abs(resid_micro), day) - 1 AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS n
      |      FROM r),
      |m AS (SELECT event_type,
      |        max(CASE WHEN rn = (n - 1) * 50 // 100
      |            THEN abs(resid_micro) END) AS mad_micro
      |      FROM o GROUP BY 1)
      |SELECT o.event_type, o.day, o.c, o.expected_micro, o.resid_micro,
      |  m.mad_micro,
      |  CAST(CASE WHEN abs(o.resid_micro) > 3 * m.mad_micro
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM o JOIN m USING (event_type)""") { (s, dir) =>
    val c = load(s, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .localCheckpoint() // |types|·|days| rows; the corpus pass runs once
    val dw = c.groupBy(col("event_type").as("et"), (col("day") % 7).as("dow"))
      .agg(sum("c").as("s"), count(lit(1)).as("nd"))
    val r = c.join(broadcast(dw),
        col("event_type") === col("et") && col("day") % 7 === col("dow"))
      .select(col("event_type"), col("day"), col("c"),
        expr("s * 1000000 div nd").as("expected_micro"),
        expr("c * 1000000 - (s * 1000000 div nd)").as("resid_micro"))
    // bounded windows: |days| rows per event type by construction
    val o = r
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(abs(col("resid_micro")), col("day"))).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val m = o.groupBy("event_type")
      .agg(max(when(col("rn") === expr("(n - 1) * 50 div 100"),
        abs(col("resid_micro")))).as("mad_micro"))
    o.select("event_type", "day", "c", "expected_micro", "resid_micro")
      .join(broadcast(m), "event_type")
      .select(col("event_type"), col("day"), col("c"), col("expected_micro"),
        col("resid_micro"), col("mad_micro"),
        when(abs(col("resid_micro")) > lit(3L) * col("mad_micro"), 1L)
          .otherwise(0L).as("is_anomaly"))
  }
}
