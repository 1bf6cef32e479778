package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Seventh relational pack: customer-analytics classics. Opens with RFM
  * segmentation — the recency/frequency/monetary quartile grid every CRM
  * warehouse derives — spelled with the d66 two-phase shard rank so no
  * window in the plan ranks more than a bounded shard of customers.
  */
object Relational7 {

  def pack: Seq[Q] = Seq(q94RfmSegments, q95ShipmentSpan, q96DwellMatrix,
    q97RevenueGini, q98Skyline, q99CusumChangepoint, q100StatsHistogram,
    q101Expectations, q102Spearman)

  /** q102: SPEARMAN RANK CORRELATION — per nation, does ordering MORE
    * often go with spending MORE: ρ between customer order count and
    * lifetime spend. q49's Pearson answers this for linear association;
    * Spearman is the robust rank-based complement (outlier whales don't
    * drag it), and with custkey-tie-broken unique ranks the classic
    * ρ = 1 − 6Σd²/(n(n²−1)) identity applies exactly.
    *
    * Determinism: ranks are integers (both windows fully tie-broken);
    * Σd² accumulates in DECIMAL(38,0) (n³-scale, the g70 idiom); ρ is
    * two exact casts, one IEEE divide and one subtract, rounded 6dp.
    *
    * Scale shape: one orders-grain aggregate, a keyed nation attach,
    * two NATION-PARTITIONED rank windows, one 25-group rollup.
    */
  val q102Spearman: Q = Q(
    "q102_spearman",
    (s: SparkSession, dir: String) => {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val per = Q.spread(t(s, dir, "orders"), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("freq"),
          (sum(Q.dec2(col("o_totalprice"))) * 100).cast("long").as("mon"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      def rk(ord: Column*) = row_number().over(
        Window.partitionBy(col("n_name")).orderBy(ord: _*)).cast("long")
      per.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey"), col("freq"), col("mon"))
        .withColumn("rf", rk(col("freq"), col("o_custkey")))
        .withColumn("rm", rk(col("mon"), col("o_custkey")))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(((col("rf") - col("rm")) * (col("rf") - col("rm")))
            .cast(d38)).as("sd2"))
        .filter(col("n_customers") > 1)
        .select(col("n_name"), col("n_customers"),
          round(lit(1.0) -
            (lit(6).cast(d38) * col("sd2")).cast("double") /
            (col("n_customers").cast(d38) *
              (col("n_customers").cast(d38) *
                col("n_customers").cast(d38) - 1)).cast("double"), 6)
            .as("spearman_rho"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH per AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS freq,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS mon
        FROM orders GROUP BY o_custkey),
      ranked AS (
        SELECT n_name,
          CAST(row_number() OVER (PARTITION BY n_name
            ORDER BY freq, o_custkey) AS BIGINT) AS rf,
          CAST(row_number() OVER (PARTITION BY n_name
            ORDER BY mon, o_custkey) AS BIGINT) AS rm
        FROM per
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey)
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        round(1.0 -
          CAST(6 * sum(CAST((rf - rm) * (rf - rm) AS DECIMAL(38,0)))
               AS DOUBLE) /
          CAST(CAST(count(*) AS DECIMAL(38,0)) *
               (CAST(count(*) AS DECIMAL(38,0)) *
                CAST(count(*) AS DECIMAL(38,0)) - 1) AS DOUBLE), 6)
          AS spearman_rho
      FROM ranked GROUP BY n_name HAVING count(*) > 1
      ORDER BY n_name"""))

  /** q101: DATA-QUALITY EXPECTATIONS SUITE — the dbt-test / Great
    * Expectations report as ONE query: uniqueness, referential
    * integrity, not-null, accepted-range and freshness checks, each a
    * row of (test, n_checked, n_violations, status). Running the whole
    * contract as one plan is the point: the orchestrator gets a single
    * pass/fail table, and Spark shares scans between the checks that
    * touch the same table.
    *
    * Scale shape: uniqueness is count−countDistinct (two map-side
    * aggregates); the FK check is a LEFT ANTI join on the natural join
    * key; everything else is a single filtered aggregate. Each check is
    * a 1-row frame; the report is a bounded union.
    */
  val q101Expectations: Q = Q(
    "q101_expectations",
    (s: SparkSession, dir: String) => {
      val orders = Q.spread(t(s, dir, "orders"), "o_orderkey")
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
      val cust = t(s, dir, "customer")
      def report(name: String, checked: org.apache.spark.sql.Column,
          viol: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
        df.agg(checked.as("n_checked"), viol.as("n_violations"))
          .select(lit(name).as("test"), col("n_checked"),
            col("n_violations"),
            when(col("n_violations") === 0, "pass").otherwise("fail")
              .as("status"))
      val unique = report("orders_orderkey_unique", count(lit(1)),
        count(lit(1)) - countDistinct(col("o_orderkey")))(orders)
      val fk = report("lineitem_orderkey_fk", count(lit(1)),
        count(lit(1)))(
        li.select(col("l_orderkey"))
          .join(orders.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti"))
        // n_checked for the FK test is the full line count, not orphans:
        .drop("n_checked")
        .crossJoin(broadcast(li.agg(count(lit(1)).as("n_checked"))))
        .select(col("test"), col("n_checked"), col("n_violations"),
          col("status"))
      val notNull = report("customer_custkey_not_null", count(lit(1)),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)))(cust)
      val range = report("orders_totalprice_positive", count(lit(1)),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)))(orders)
      val fresh = report("orders_fresh_within_90d_of_20010901",
        count(lit(1)),
        when(datediff(lit("2001-09-01").cast("timestamp"),
          max(col("o_orderdate"))) > 90, 1L).otherwise(0L))(orders)
      unique.unionAll(fk).unionAll(notNull).unionAll(range)
        .unionAll(fresh)
        .orderBy(col("test"))
    },
    Some("""
      SELECT test, n_checked, n_violations,
        CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
      FROM (
        SELECT 'orders_orderkey_unique' AS test,
          CAST(count(*) AS BIGINT) AS n_checked,
          CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
            AS n_violations
        FROM orders
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
          CAST((SELECT count(*) FROM lineitem
                WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey)) AS BIGINT)
        UNION ALL
        SELECT 'customer_custkey_not_null',
          CAST(count(*) AS BIGINT),
          CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'orders_totalprice_positive',
          CAST(count(*) AS BIGINT),
          CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
               AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_fresh_within_90d_of_20010901',
          CAST(count(*) AS BIGINT),
          CAST(CASE WHEN date_diff('day', max(o_orderdate),
                 TIMESTAMP '2001-09-01 00:00:00') > 90
               THEN 1 ELSE 0 END AS BIGINT)
        FROM orders) t
      ORDER BY test"""))

  /** q100: EQUI-DEPTH HISTOGRAM BUILD (optimizer statistics) — the
    * ANALYZE-TABLE artifact a cost-based optimizer consumes: 32
    * equal-row-count buckets over l_extendedprice with per-bucket
    * bounds, row count and NDV. Selectivity estimation quality is
    * exactly this table's quality; the build is the canonical
    * rank-then-cut shape.
    *
    * Scale-stable spelling: the global rank comes from the d66/q78
    * two-phase device — per-VALUE-BAND shard row_number + broadcast
    * shard prefixes (price bands are value-bounded) — then
    * bucket = (rank−1)·32 div N and a 32-group aggregate. The oracle
    * states the same rank as one global window.
    */
  val q100StatsHistogram: Q = Q(
    "q100_stats_histogram",
    (s: SparkSession, dir: String) => {
      val v = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .select((Q.dec2(col("l_extendedprice")) * 100).cast("long").as("x"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      val sharded = v.withColumn("shard", expr("x div 1000000"))
      val local = sharded.withColumn("lrn", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("x"), col("ok"), col("ln"))).cast("long"))
      val prefixes = local.groupBy(col("shard"))
        .agg(count(lit(1)).as("tot"))
        .withColumn("prefix", coalesce(sum(col("tot")).over(
          Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("tot")).over())
        .select(col("shard"), col("prefix"), col("n"))
      local.join(broadcast(prefixes), "shard")
        .select(col("x"),
          expr("(((prefix + lrn) - 1) * 32) div n").as("bucket"))
        .groupBy(col("bucket"))
        .agg(min(col("x")).as("lo_cents"), max(col("x")).as("hi_cents"),
          count(lit(1)).as("n_rows"), countDistinct(col("x")).as("ndv"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH v AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS x,
          l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem),
      ranked AS (
        SELECT x,
          CAST(row_number() OVER (ORDER BY x, ok, ln) AS BIGINT) AS r,
          CAST(count(*) OVER () AS BIGINT) AS n
        FROM v)
      SELECT ((r - 1) * 32) // n AS bucket,
        CAST(min(x) AS BIGINT) AS lo_cents,
        CAST(max(x) AS BIGINT) AS hi_cents,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT x) AS BIGINT) AS ndv
      FROM ranked GROUP BY 1 ORDER BY bucket"""))

  /** q99: CUSUM CHANGEPOINT SCAN — where did the daily-revenue level
    * SHIFT: the cumulative-sum statistic C_i = S_i − i·μ peaks exactly at
    * a mean change (Page's classic), so the top-|C| days are the
    * changepoint candidates every regime-shift monitor reports. Output:
    * the 3 strongest candidates with their N-scaled CUSUM and shift
    * direction.
    *
    * Determinism: μ is kept RATIONAL — the statistic is cross-multiplied
    * to C_i·N = S_i·N − i·T (exact BIGINTs; |S·N| ≤ cents·days² stays
    * far under 2⁶³ at warehouse scale), so no division ever happens;
    * ranking keys on (|C·N| desc, day).
    *
    * Scale shape: the fact stream collapses to daily totals first (one
    * keyed aggregate — the only data-sized pass); the running sum, the
    * scan index and the ranking all run on the DAY domain (calendar-
    * bounded, the q92 exception) — a 30-year warehouse is ~11k rows.
    */
  val q99CusumChangepoint: Q = Q(
    "q99_cusum_changepoint",
    (s: SparkSession, dir: String) => {
      val daily = Q.spread(t(s, dir, "orders"), "o_orderkey")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(Q.dec2(col("o_totalprice"))) * 100).cast("long").as("x"))
      val wDay = Window.orderBy(col("day"))
      val tot = daily.agg(sum(col("x")).as("t"), count(lit(1)).as("n"))
      daily
        .withColumn("i", row_number().over(wDay).cast("long"))
        .withColumn("srun", sum(col("x")).over(
          wDay.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tot))
        .select(col("day"),
          (col("srun") * col("n") - col("i") * col("t")).as("cusum_n"))
        .withColumn("r", row_number().over(
          Window.orderBy(abs(col("cusum_n")).desc, col("day"))).cast("int"))
        .filter(col("r") <= 3)
        .select(col("r").as("rank"), col("day"), col("cusum_n"),
          when(col("cusum_n") > 0, "level_drop_after")
            .otherwise("level_rise_after").as("verdict"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS x
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(sum(x) AS BIGINT) AS t,
                     CAST(count(*) AS BIGINT) AS n FROM daily),
      scan AS (
        SELECT day,
          CAST(sum(x) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            * n
          - CAST(row_number() OVER (ORDER BY day) AS BIGINT) * t
            AS cusum_n
        FROM daily CROSS JOIN tot)
      SELECT CAST(row_number() OVER (ORDER BY abs(cusum_n) DESC, day)
                  AS INT) AS rank,
        day, cusum_n,
        CASE WHEN cusum_n > 0 THEN 'level_drop_after'
             ELSE 'level_rise_after' END AS verdict
      FROM scan
      QUALIFY rank <= 3
      ORDER BY rank"""))

  /** q98: SKYLINE (PARETO FRONTIER) — customers not DOMINATED on the
    * (recency, lifetime spend) plane: no other customer is both strictly
    * more recent AND a strictly higher spender. The dominance-query
    * family's classic: "who are the efficient frontier of accounts" —
    * every multi-criteria shortlist (cheapest-and-freshest supplier,
    * best-price-best-speed route) is this operator.
    *
    * The 2-D skyline needs NO pairwise comparison: sorted by recency
    * (ties: spend desc, custkey), a customer is on the frontier iff its
    * spend strictly exceeds every PRECEDING spend — one running-max
    * window. Spelled scale-stable: the running max is computed per
    * recency-band shard with broadcast per-shard prefix maxima (the d66
    * device applied to max instead of count), so no customer-sized
    * window exists. Ties on BOTH axes keep the lowest custkey only.
    *
    * Scale shape: one orders-grain keyed aggregate, then shard-local
    * windows + one bounded shard-prefix window + a broadcast join.
    */
  val q98Skyline: Q = Q(
    "q98_skyline",
    (s: SparkSession, dir: String) => {
      val per = Q.spread(t(s, dir, "orders"), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          (sum(Q.dec2(col("o_totalprice"))) * 100).cast("long").as("mon"))
        .select(col("o_custkey").as("c"),
          datediff(lit("2001-09-01").cast("timestamp"), col("last_order"))
            .as("rec"), col("mon"))
      // shard = recency day band; within-shard running max over the
      // (rec, mon desc, c) order, prefix max from STRICTLY earlier shards
      val sharded = per.withColumn("shard", expr("rec div 30"))
      val wLocal = Window.partitionBy(col("shard"))
        .orderBy(col("rec"), col("mon").desc, col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = sharded.withColumn("lmax",
        max(col("mon")).over(wLocal))
      val prefixes = sharded.groupBy(col("shard"))
        .agg(max(col("mon")).as("smax"))
        .withColumn("pmax", max(col("smax")).over(
          Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("shard"), col("pmax"))
      local.join(broadcast(prefixes), "shard")
        .filter(col("mon") > greatest(
          coalesce(col("lmax"), lit(Long.MinValue)),
          coalesce(col("pmax"), lit(Long.MinValue))))
        .select(col("c").as("c_custkey"), col("rec").as("recency_days"),
          col("mon").as("monetary_cents"))
        .orderBy(col("recency_days"))
    },
    Some("""
      WITH per AS (
        SELECT o_custkey AS c,
          CAST(date_diff('day', max(o_orderdate),
                         TIMESTAMP '2001-09-01 00:00:00') AS INT) AS rec,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS mon
        FROM orders GROUP BY o_custkey)
      SELECT c AS c_custkey, rec AS recency_days, mon AS monetary_cents
      FROM (
        SELECT c, rec, mon,
          max(mon) OVER (ORDER BY rec, mon DESC, c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        FROM per) t
      WHERE prevmax IS NULL OR mon > prevmax
      ORDER BY rec"""))

  /** q97: REVENUE CONCENTRATION (Gini + top-decile share) — per nation:
    * how unequally customer lifetime revenue is distributed. The two
    * numbers every account-concentration review asks for: the share of
    * revenue held by the top 10% of customers (integer bp) and the Gini
    * coefficient from the rank formula G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n
    * over ascending-sorted revenues.
    *
    * Determinism: revenues are exact cents; the rank moment Σ i·xᵢ
    * accumulates in DECIMAL(38,0) (overflow-proof at any customer count,
    * the g70 idiom); the Gini assembles with two IEEE divides + one
    * subtract on exact operands, rounded 6dp; the decile share is integer
    * cross-multiplication.
    *
    * Scale shape: one orders-level keyed aggregate (the only fact pass),
    * a keyed customer attach (dimension-sized, AQE picks the strategy) +
    * broadcast nation names, then NATION-PARTITIONED rank windows (never
    * global; a nation's customer set is the d66 shard-rank candidate if
    * a single nation outgrows a partition) and a 25-group rollup.
    */
  val q97RevenueGini: Q = Q(
    "q97_revenue_gini",
    (s: SparkSession, dir: String) => {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val rev = Q.spread(t(s, dir, "orders"), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg((sum(Q.dec2(col("o_totalprice"))) * 100).cast("long").as("x"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("x"), col("o_custkey"))
      val ranked = rev
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey"), col("x"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("n_name"))).cast("long"))
      ranked.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("x")).as("revenue_cents"),
          sum((col("i") * col("x")).cast(d38)).as("ix"),
          sum(when(col("i") * 10 > col("n") * 9, col("x"))
            .otherwise(0L)).as("top_cents"))
        .select(col("n_name"), col("n_customers"), col("revenue_cents"),
          expr("top_cents * 10000 div revenue_cents").as("top10_share_bp"),
          round(
            (lit(2).cast(d38) * col("ix")).cast("double") /
              (col("n_customers").cast(d38) *
                col("revenue_cents").cast(d38)).cast("double") -
            (col("n_customers") + 1).cast("double") /
              col("n_customers").cast("double"), 6).as("gini"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH rev AS (
        SELECT o_custkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS x
        FROM orders GROUP BY o_custkey),
      ranked AS (
        SELECT n_name, x,
          CAST(row_number() OVER (PARTITION BY n_name
            ORDER BY x, o_custkey) AS BIGINT) AS i,
          CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
        FROM rev
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey)
      SELECT n_name,
        CAST(count(*) AS BIGINT) AS n_customers,
        CAST(sum(x) AS BIGINT) AS revenue_cents,
        CAST(sum(CASE WHEN i * 10 > n * 9 THEN x ELSE 0 END) * 10000
          // CAST(sum(x) AS BIGINT) AS BIGINT) AS top10_share_bp,
        round(
          CAST(2 * sum(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS DOUBLE) /
          CAST(CAST(count(*) AS DECIMAL(38,0)) *
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS DOUBLE) -
          CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          AS gini
      FROM ranked GROUP BY n_name ORDER BY n_name"""))

  /** q96: DWELL-TIME TRANSITION MATRIX — q68 counts WHERE users go next;
    * this measures HOW LONG they linger before each transition: per
    * (from_type → to_type) pair, the transition count, mean dwell
    * microseconds, and the slowest observed dwell. The timing layer
    * turns a Markov matrix into a latency-annotated journey map (which
    * hops are quick reflexes vs considered decisions).
    *
    * Determinism: dwell = unix-µs difference of consecutive events in
    * the same user's (ts, event_id)-ordered stream — non-negative by
    * construction, so the mean is a plain integer-sum `div` count.
    *
    * Scale shape: one user-partitioned lag window (per-user state never
    * leaves its partition), then a keyed aggregate bounded by
    * |event types|² — constant-size output at any event volume.
    */
  val q96DwellMatrix: Q = Q(
    "q96_dwell_matrix",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      Q.spread(t(s, dir, "events"), "event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("from_t", lag(col("t"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("t") - col("from_t")).as("sd"),
          max(col("t") - col("from_t")).as("max_dwell_us"))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("sd div n").as("avg_dwell_us"), col("max_dwell_us"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS from_type,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS from_t
        FROM events)
      SELECT from_type, event_type AS to_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(t - from_t) // count(*) AS BIGINT) AS avg_dwell_us,
        CAST(max(t - from_t) AS BIGINT) AS max_dwell_us
      FROM ev WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
      ORDER BY from_type, to_type"""))

  /** q95: SHIPMENT-SPAN DECOMPOSITION — per order priority: how fast the
    * FIRST item ships (pick latency), how long until the LAST item ships
    * (the span a customer actually waits for a complete order), and how
    * often an order splits across multiple ship dates. The supply-chain
    * panel answering "does priority buy speed, and what does split
    * shipping cost us" — from the only date columns the star carries
    * (o_orderdate, l_shipdate).
    *
    * Two-level aggregation: per-order min/max/distinct-count of ship
    * dates first (the orderkey shuffle the join needs anyway), then a
    * 5-group priority rollup. Every average is an integer day-sum `div`
    * a count. The driver's generator ships some items BEFORE the order
    * date, so the first-ship lag can be negative — and a negative
    * dividend is where Spark's truncating `div` and DuckDB's flooring
    * `//` disagree; the lag is therefore shifted +5000 days per order
    * before the division and shifted back after (the verify-skill
    * negatives rule).
    *
    * Scale shape: the orders ⋈ lineitem join shuffles both sides on the
    * join key once; the per-order aggregate rides that same partitioning
    * (no second shuffle), and the priority rollup is 5 groups with full
    * map-side combine.
    */
  val q95ShipmentSpan: Q = Q(
    "q95_shipment_span",
    (s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(
          (datediff(min(col("l_shipdate")), max(col("o_orderdate")))
            .cast("long") + 5000L).as("first_lag"),
          datediff(max(col("l_shipdate")), min(col("l_shipdate")))
            .cast("long").as("span"),
          countDistinct(col("l_shipdate")).as("n_ship_dates"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("first_lag")).as("sf"), sum(col("span")).as("sp"),
          sum(when(col("n_ship_dates") > 1, 1L).otherwise(0L)).as("nm"))
        .select(col("o_orderpriority"), col("n_orders"),
          expr("(sf div n_orders) - 5000").as("avg_first_ship_days"),
          expr("sp div n_orders").as("avg_span_days"),
          expr("nm * 10000 div n_orders").as("multi_ship_bp"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST((sum(first_lag) // count(*)) - 5000 AS BIGINT)
          AS avg_first_ship_days,
        CAST(sum(span) // count(*) AS BIGINT) AS avg_span_days,
        CAST(sum(multi) * 10000 // count(*) AS BIGINT) AS multi_ship_bp
      FROM (
        SELECT o_orderkey, o_orderpriority,
          CAST(date_diff('day', max(o_orderdate), min(l_shipdate)) + 5000
               AS BIGINT) AS first_lag,
          CAST(date_diff('day', min(l_shipdate), max(l_shipdate))
               AS BIGINT) AS span,
          CASE WHEN count(DISTINCT l_shipdate) > 1 THEN 1 ELSE 0 END
            AS multi
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_orderpriority) t
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Global row number by (value, custkey) without a global window: shard
    * by a bucket monotone in the sort order (equal values always share a
    * shard), row_number within each shard, then add broadcast per-shard
    * prefix counts. The only unpartitioned window ranks one row per shard
    * (bounded: recency days / distinct order counts / $10k monetary
    * bands), never per customer.
    */
  private def shardRank(per: DataFrame, out: String, shard: Column,
      ord: Column): DataFrame = {
    val local = per.withColumn("shard", shard)
      .withColumn("lrn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(ord, col("c"))).cast("long"))
    val prefixes = local.groupBy(col("shard")).agg(count(lit(1)).as("tot"))
      .withColumn("prefix", coalesce(sum(col("tot")).over(
        Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("prefix"))
    local.join(broadcast(prefixes), "shard")
      .select(col("c"), (col("prefix") + col("lrn")).as(out))
  }

  /** q94: RFM SEGMENTATION — quartile-bucket customers on recency (days
    * since last order at 2001-09-01), frequency (order count) and monetary
    * (lifetime spend, exact cents), label the marketing segments, and
    * report the segment census with spend totals.
    *
    * Bucket = ⌊4·(rank−1)/n⌋+1 on the fully tie-broken (value, custkey)
    * rank — deterministic equal-quota quartiles both engines can state
    * identically (ntile semantics when 4 | n). The Spark side computes the
    * rank with the two-phase shard rank (no customer-sized window); the
    * oracle states the same rank as a plain global window, which DuckDB
    * may run single-threaded at sf0.01.
    *
    * Scale shape: one keyed aggregation over orders (the only fact-table
    * pass), then all ranking work is customer-dimension-sized with
    * bounded-width windows; the quartile formula attaches n as a 1-row
    * broadcast.
    */
  val q94RfmSegments: Q = Q(
    "q94_rfm_segments",
    (s: SparkSession, dir: String) => {
      val per = Q.spread(t(s, dir, "orders"), "o_custkey")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          (sum(Q.dec2(col("o_totalprice"))) * 100).cast("long").as("mon"))
        .select(col("o_custkey").as("c"),
          datediff(lit("2001-09-01").cast("timestamp"), col("last_order"))
            .as("rec"),
          col("freq"), col("mon"))
        .persist()
      val rr = shardRank(per, "rrn", col("rec"), col("rec").asc)
      val fr = shardRank(per, "frn", -col("freq"), col("freq").desc)
      val mr = shardRank(per, "mrn", -expr("mon div 100000000"),
        col("mon").desc)
      val nd = per.agg(count(lit(1)).as("nd"))
      val labeled = per.select(col("c"), col("mon"))
        .join(rr, "c").join(fr, "c").join(mr, "c")
        .crossJoin(broadcast(nd))
        .select(col("mon"),
          expr("((4*(rrn-1)) div nd)+1").as("rb"),
          expr("((4*(frn-1)) div nd)+1").as("fb"),
          expr("((4*(mrn-1)) div nd)+1").as("mb"))
        .select(col("mon"),
          concat(lit("r"), col("rb"), lit("f"), col("fb"),
            lit("m"), col("mb")).as("segment"),
          when(col("rb") === 1 && col("fb") === 1 && col("mb") === 1,
            "champion")
            .when(col("rb") === 4 && col("fb") === 4, "lost")
            .when(col("rb") >= 3 && col("mb") === 1, "at_risk_whale")
            .when(col("rb") === 1, "recent")
            .otherwise("regular").as("label"))
      val out = labeled.groupBy(col("segment"), col("label"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("mon")).as("total_cents"))
        .withColumn("avg_cents", expr("total_cents div n_customers"))
        .orderBy(col("segment"))
      Q.materialized(out, per)
    },
    Some("""
      WITH per AS (
        SELECT o_custkey AS c,
          CAST(date_diff('day', max(o_orderdate),
                         TIMESTAMP '2001-09-01 00:00:00') AS INT) AS rec,
          CAST(count(*) AS BIGINT) AS freq,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS mon
        FROM orders GROUP BY o_custkey),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM per),
      rk AS (
        SELECT c, mon,
          ((4*(row_number() OVER (ORDER BY rec, c) - 1)) // nd) + 1 AS rb,
          ((4*(row_number() OVER (ORDER BY freq DESC, c) - 1)) // nd) + 1
            AS fb,
          ((4*(row_number() OVER (ORDER BY mon DESC, c) - 1)) // nd) + 1
            AS mb
        FROM per CROSS JOIN n)
      SELECT segment, label,
        CAST(count(*) AS BIGINT) AS n_customers,
        CAST(sum(mon) AS BIGINT) AS total_cents,
        CAST(sum(mon) // count(*) AS BIGINT) AS avg_cents
      FROM (
        SELECT mon, 'r' || rb || 'f' || fb || 'm' || mb AS segment,
          CASE WHEN rb = 1 AND fb = 1 AND mb = 1 THEN 'champion'
               WHEN rb = 4 AND fb = 4 THEN 'lost'
               WHEN rb >= 3 AND mb = 1 THEN 'at_risk_whale'
               WHEN rb = 1 THEN 'recent'
               ELSE 'regular' END AS label
        FROM rk) t
      GROUP BY segment, label ORDER BY segment"""))
}
