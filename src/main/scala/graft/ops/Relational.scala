package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.Dates
import Q.{dec2, dec4, sumDec, t}

/** Relational operator closure (SURVEY.md §2-B): joins, aggregation,
  * windows, set ops, top-k, scalar functions — each a declarative
  * DataFrame plan so Catalyst handles pushdown/pruning/join-strategy,
  * each paired with a DuckDB oracle.
  *
  * Scale posture per query is noted inline: what shuffles, what
  * broadcasts, and why the plan survives 1000 executors × 100 TB.
  */
object Relational {

  def pack: Seq[Q] = Seq(
    q01PricingSummary, q02FilterScan, q03RegionalRevenue, q04OrderPriority,
    q05CustOrderHistogram, q06DormantCustomers, q07TopKPerBrand,
    q08WindowAnalytics, q09Rollup, q10Cube, q11GroupingSets, q12DistinctAgg,
    q12bApproxDistinct, q13SetOps, q13bSetOpsAll, q14StringFns, q15DateAgg, q16JsonProps,
    q17AsOfJoin, q18RangeJoin, q19HavingAgg, q20MultiFormatDate,
    q21ExplodeTokens, q22KeepFirstDedup, q27MathFns, q28OuterJoins,
    q29RangeFrames)

  /** TPC-H Q1-style pricing summary: full-scan partial+final hash agg on a
    * low-cardinality key — map-side combine means the shuffle carries only
    * (#flags × #partitions) rows at any scale.
    */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    (s, dir) => {
      // Q.spread: 7 decimal partial-sums over every row otherwise run
      // inside the test layout's single-row-group scan task (no-op under a
      // real multi-file layout); measured 1.6→1.1s at sf0.1/local[32]
      Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .filter(col("l_shipdate") <= lit("2001-06-30").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(Q.discPrice).cast("double").as("sum_disc_price"),
          sum(Q.chargePrice).cast("double").as("sum_charge"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec4(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2)) * CAST(1+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Predicate/projection pushdown showcase: every filter below reaches the
    * parquet scan as PushedFilters; only 6 of 11 columns are read. Shuffle:
    * only the final orderBy's range exchange.
    */
  val q02FilterScan: Q = Q(
    "q02_filter_scan",
    (s, dir) => {
      t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
          col("o_orderstatus").isin("O", "F") &&
          col("o_orderpriority").like("1%") &&
          col("o_totalprice").between(1000.0, 200000.0) &&
          col("o_custkey").isNotNull)
        .select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("order_year"),
          datediff(lit("1998-01-01").cast("timestamp"), col("o_orderdate"))
            .cast("long").as("days_before_1998"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice,
        CAST(year(o_orderdate) AS INT) AS order_year,
        date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_before_1998
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderstatus IN ('O','F')
        AND o_orderpriority LIKE '1%'
        AND o_totalprice BETWEEN 1000.0 AND 200000.0
        AND o_custkey IS NOT NULL
      ORDER BY o_orderkey"""))

  /** Flagship star join: fact `orders` joined to dims customer→nation→region.
    * nation/region are broadcast (they are bounded at any scale); customer is
    * the one true shuffle. Aggregates to 5 rows.
    */
  val q03RegionalRevenue: Q = Q(
    "q03_regional_revenue",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("r_name"))
    },
    Some(s"""
      SELECT r_name, count(*) AS n_orders, ${sumDec("o_totalprice")} AS revenue
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Left-semi (EXISTS) fact-fact join: orders having any heavy lineitem.
    * Semi-join keeps only the left columns and stops at first match — far
    * cheaper than join+distinct at scale.
    */
  val q04OrderPriority: Q = Q(
    "q04_order_priority",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"))
      orders.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q13-style outer-join histogram: customers × their order counts,
    * including zero. Outer join preserves unmatched left rows; count(col)
    * (not count(*)) gives the null-aware zero.
    */
  val q05CustOrderHistogram: Q = Q(
    "q05_cust_order_histogram",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders"))
    },
    Some("""
      SELECT n_orders, count(*) AS n_customers FROM (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY n_orders ORDER BY n_orders"""))

  /** Left-anti (NOT EXISTS): customers with no early-1995 order, by segment. */
  val q06DormantCustomers: Q = Q(
    "q06_dormant_customers",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val early = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_custkey"))
      customer.join(early, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Per-group top-k via rank window — never a global sort: the only wide
    * exchanges are the agg shuffle on (brand, partkey) and the window
    * shuffle on brand. Revenue is decimal-exact so ranks agree across
    * engines; partkey breaks ties deterministically.
    */
  val q07TopKPerBrand: Q = Q(
    "q07_topk_per_brand",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = broadcast(t(s, dir, "part"))
      val rev = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum(Q.discPrice).cast("double").as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("l_partkey"))
      rev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .orderBy(col("p_brand"), col("revenue").desc, col("l_partkey"))
    },
    Some("""
      SELECT p_brand, l_partkey, revenue FROM (
        SELECT p_brand, l_partkey,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          row_number() OVER (PARTITION BY p_brand
                             ORDER BY CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) DESC,
                                      l_partkey) AS rn
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey) t
      WHERE rn <= 3
      ORDER BY p_brand, revenue DESC, l_partkey"""))

  /** Ranking + analytic + frame windows in one pass over a single
    * partition-by-custkey exchange: row_number, lag, lead, running sum
    * (ROWS UNBOUNDED PRECEDING), rank, dense_rank, ntile.
    */
  val q08WindowAnalytics: Q = Q(
    "q08_window_analytics",
    (s, dir) => {
      val orders = t(s, dir, "orders").filter(col("o_custkey") <= 100)
      val seq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        row_number().over(seq).as("rn"),
        lag(col("o_totalprice"), 1).over(seq).as("prev_price"),
        lead(col("o_totalprice"), 1).over(seq).as("next_price"),
        sum(dec2(col("o_totalprice")))
          .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        rank().over(byPrice).as("price_rank"),
        dense_rank().over(byPrice).as("price_dense_rank"),
        ntile(4).over(byPrice).as("price_quartile"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        row_number() OVER w AS rn,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        rank() OVER p AS price_rank,
        dense_rank() OVER p AS price_dense_rank,
        ntile(4) OVER p AS price_quartile
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             p AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, rn"""))

  /** ROLLUP over the geography dims; grouping() flags disambiguate the
    * subtotal rows so ordering stays null-free and deterministic.
    */
  val q09Rollup: Q = Q(
    "q09_rollup_geo",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      customer
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"))
        .orderBy(col("g_region"), col("g_nation"),
          coalesce(col("r_name"), lit("")), coalesce(col("n_name"), lit("")))
    },
    Some(s"""
      SELECT r_name, n_name, count(*) AS n_customers,
        ${sumDec("c_acctbal")} AS total_bal,
        CAST(grouping(r_name) AS INT) AS g_region,
        CAST(grouping(n_name) AS INT) AS g_nation
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_region, g_nation, coalesce(r_name,''), coalesce(n_name,'')"""))

  /** CUBE over lineitem flags: all 4 grouping combinations in one shuffle. */
  val q10Cube: Q = Q(
    "q10_cube_flags",
    (s, dir) => {
      // Q.spread: the 4-way cube EXPAND multiplies every scanned row before
      // the shuffle, all inside the single-row-group scan task otherwise
      // (no-op under a multi-file layout); measured 1.3→0.9s at sf0.1
      Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          coalesce(col("l_returnflag"), lit("")), coalesce(col("l_linestatus"), lit("")))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        ${sumDec("l_quantity")} AS sum_qty,
        CAST(grouping(l_returnflag) AS INT) AS g_flag,
        CAST(grouping(l_linestatus) AS INT) AS g_status
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, coalesce(l_returnflag,''), coalesce(l_linestatus,'')"""))

  /** GROUPING SETS through the SQL surface (registered temp view). */
  val q11GroupingSets: Q = Q(
    "q11_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          ${sumDec("o_totalprice")} AS revenue,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY g_status, g_priority,
          coalesce(o_orderstatus,''), coalesce(o_orderpriority,'')""")
    },
    Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        ${sumDec("o_totalprice")} AS revenue,
        CAST(grouping(o_orderstatus) AS INT) AS g_status,
        CAST(grouping(o_orderpriority) AS INT) AS g_priority
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY g_status, g_priority,
        coalesce(o_orderstatus,''), coalesce(o_orderpriority,'')"""))

  /** Exact multi-column distinct aggregation (expand + two-phase agg). */
  val q12DistinctAgg: Q = Q(
    "q12_distinct_agg",
    (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps,
        count(DISTINCT l_orderkey) AS n_orders,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** HLL-sketch distinct (approx_count_distinct). No oracle: sketch results
    * are implementation-specific; the driver records a rows-only check and
    * `ApproxDistinctSpec` asserts the error envelope against exact counts.
    * At 100 TB this replaces the expensive exact-distinct expand with a
    * constant-size sketch per group.
    */
  val q12bApproxDistinct: Q = Q(
    "q12b_approx_distinct",
    (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    },
    None)

  /** Set operations: INTERSECT / EXCEPT / UNION (distinct semantics), each
    * reduced to a count so the result is one stable 3-row frame.
    */
  val q13SetOps: Q = Q(
    "q13_set_ops",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      def buyers(yr: Int) = orders
        .filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
      val b95 = buyers(1995)
      val b96 = buyers(1996)
      val counted = Seq(
        ("both_years", b95.intersect(b96)),
        ("only_1995", b95.except(b96)),
        ("either_year", b95.union(b96).distinct()))
        .map { case (tag, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), col("n"))
        }
      counted.reduce(_.unionByName(_)).orderBy(col("op"))
    },
    Some("""
      SELECT 'both_years' AS op, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996) t
      UNION ALL
      SELECT 'only_1995', count(*) FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996) t
      UNION ALL
      SELECT 'either_year', count(*) FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
        UNION
        SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996) t
      ORDER BY op"""))

  /** Set operations with bag (ALL) semantics: UNION ALL / INTERSECT ALL /
    * EXCEPT ALL over per-customer order rows, reduced to counts. Spark's
    * `union` is already bag-semantic; `intersectAll`/`exceptAll` keep
    * per-row multiplicity (min / left-minus-right of the multiplicities) —
    * physically a count-aggregated join rather than a distinct, so the
    * shuffle carries one row per distinct key, not per duplicate.
    */
  val q13bSetOpsAll: Q = Q(
    "q13b_setops_all",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      // month-of-order keys repeat per customer → real multiplicities
      def keys(yr: Int) = orders
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"), month(col("o_orderdate")).as("m"))
      val k95 = keys(1995)
      val k96 = keys(1996)
      val counted = Seq(
        ("union_all", k95.union(k96)),
        ("intersect_all", k95.intersectAll(k96)),
        ("except_all", k95.exceptAll(k96)))
        .map { case (tag, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), col("n"))
        }
      counted.reduce(_.unionByName(_)).orderBy(col("op"))
    },
    Some("""
      SELECT 'union_all' AS op, count(*) AS n FROM (
        SELECT o_custkey, month(o_orderdate) AS m FROM orders WHERE year(o_orderdate)=1995
        UNION ALL
        SELECT o_custkey, month(o_orderdate) FROM orders WHERE year(o_orderdate)=1996) t
      UNION ALL
      SELECT 'intersect_all', count(*) FROM (
        SELECT o_custkey, month(o_orderdate) AS m FROM orders WHERE year(o_orderdate)=1995
        INTERSECT ALL
        SELECT o_custkey, month(o_orderdate) FROM orders WHERE year(o_orderdate)=1996) t
      UNION ALL
      SELECT 'except_all', count(*) FROM (
        SELECT o_custkey, month(o_orderdate) AS m FROM orders WHERE year(o_orderdate)=1995
        EXCEPT ALL
        SELECT o_custkey, month(o_orderdate) FROM orders WHERE year(o_orderdate)=1996) t
      ORDER BY op"""))

  /** Scalar string functions — all codegen'd builtins, zero shuffle beyond
    * the output sort.
    */
  val q14StringFns: Q = Q(
    "q14_string_fns",
    (s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_type")).as("type_uc"),
        substring(col("p_brand"), 1, 5).as("brand_prefix"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        element_at(split(col("p_name"), " "), -1).as("last_word"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
        lower(p_name) AS name_lc,
        upper(p_type) AS type_uc,
        substring(p_brand, 1, 5) AS brand_prefix,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        concat_ws('|', p_brand, p_type) AS brand_type,
        CAST(length(p_name) AS INT) AS name_len,
        string_split(p_name, ' ')[1] AS first_word,
        string_split(p_name, ' ')[-1] AS last_word
      FROM part ORDER BY p_partkey"""))

  /** Date functions + aggregation by calendar month. */
  val q15DateAgg: Q = Q(
    "q15_date_agg",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
        .orderBy(col("yr"), col("mo"))
    },
    Some(s"""
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        date_trunc('month', o_orderdate) AS month_start,
        count(*) AS n_orders,
        ${sumDec("o_totalprice")} AS revenue,
        min(o_orderdate) AS first_order,
        max(o_orderdate) AS last_order
      FROM orders
      GROUP BY 1, 2, 3 ORDER BY yr, mo"""))

  /** JSON extraction from the events.props payload via schema-on-read
    * from_json (Spark side); the oracle reaches the same value through a
    * regexp so it needs no JSON extension.
    */
  val q16JsonProps: Q = Q(
    "q16_json_props",
    (s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("int").as("min_k"),
          max(col("k")).cast("int").as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
        min(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS min_k,
        max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** As-of join: each purchase event picks the latest order (by date) of the
    * same user at-or-before the event. Composed as join + row_number=1 —
    * the standard Spark idiom; at scale both sides hash-shuffle once on the
    * user key and the window piggybacks on that partitioning.
    */
  val q17AsOfJoin: Q = Q(
    "q17_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      ev.join(orders,
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
          "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
          row_number() OVER (PARTITION BY e.event_id
                             ORDER BY o.o_orderdate DESC NULLS LAST,
                                      o.o_orderkey DESC NULLS LAST) AS rn
        FROM events e
        LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        WHERE e.event_type = 'purchase') t
      WHERE rn = 1 ORDER BY event_id"""))

  /** Range (theta) self-join: pairs of events of one user within 5 minutes.
    * Equi-part of the condition (user_id) drives the shuffle; the range
    * predicate evaluates post-shuffle, so no cartesian product.
    */
  val q18RangeJoin: Q = Q(
    "q18_range_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.select(col("user_id"), col("ts").as("ts_a"))
      val b = ev.select(col("user_id").as("user_b"), col("ts").as("ts_b"))
      a.join(b,
          col("user_id") === col("user_b") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT a.user_id, count(*) AS n_pairs
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts
       AND b.ts <= a.ts + INTERVAL '5 minutes'
      GROUP BY a.user_id ORDER BY a.user_id"""))

  /** Aggregate-then-filter (HAVING): orders whose total lineitem quantity
    * exceeds a threshold (TPC-H Q18 shape).
    */
  val q19HavingAgg: Q = Q(
    "q19_having_agg",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 150)
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      SELECT o_orderkey, o_orderdate, o_totalprice,
        ${sumDec("l_quantity")} AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderdate, o_totalprice
      HAVING ${sumDec("l_quantity")} > 150
      ORDER BY o_orderkey"""))

  /** The reference's multi-precision date parse (T7) exercised on testdata:
    * format dates at 3 precisions keyed by orderkey mod 3, then recover them
    * with the coalescing parser from [[graft.etl.Dates]].
    */
  val q20MultiFormatDate: Q = Q(
    "q20_multiformat_date",
    (s, dir) => {
      val staged = t(s, dir, "orders").select(
        when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .as("dstr"))
      staged.select(Dates.parseReleaseDate(col("dstr")).as("parsed"))
        .groupBy(col("parsed"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("parsed"))
    },
    Some(s"""
      SELECT ${Dates.parseReleaseDateSql("dstr")} AS parsed, count(*) AS n
      FROM (
        SELECT CASE CAST(o_orderkey % 3 AS INT)
          WHEN 0 THEN strftime(o_orderdate, '%Y')
          WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
          ELSE strftime(o_orderdate, '%Y-%m-%d') END AS dstr
        FROM orders) t
      GROUP BY 1 ORDER BY parsed"""))

  /** Explode/unnest (the reference's T1 operator) over document tokens:
    * generate → re-aggregate → top-100. Deterministic via (count, token)
    * tie-broken ordering.
    */
  val q21ExplodeTokens: Q = Q(
    "q21_explode_tokens",
    (s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)
    },
    Some("""
      SELECT token, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      GROUP BY token ORDER BY n DESC, token LIMIT 100"""))

  /** Scalar math functions — restricted to IEEE-exact ops (abs, sqrt,
    * floor/ceil, mod, sign, greatest/least) so both engines agree
    * bit-for-bit; transcendentals are deliberately excluded from
    * oracle-compared output (they differ by 1 ulp across libms).
    */
  val q27MathFns: Q = Q(
    "q27_math_fns",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - lit(50000.0)).as("abs_from_mid"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          floor(col("l_extendedprice")).cast("long").as("floor_price"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod7"),
          signum(col("l_discount") - 0.05).as("disc_sign"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("greatest_v"),
          least(col("l_tax"), col("l_discount")).as("least_v"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        abs(l_extendedprice - 50000.0) AS abs_from_mid,
        sqrt(l_quantity) AS sqrt_qty,
        CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        l_orderkey % 7 AS key_mod7,
        CASE WHEN l_discount - 0.05 > 0 THEN 1.0
             WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign,
        greatest(l_quantity, l_discount * 100) AS greatest_v,
        least(l_tax, l_discount) AS least_v
      FROM lineitem WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  /** Full- and right-outer joins, reduced to match/miss counts. */
  val q28OuterJoins: Q = Q(
    "q28_outer_joins",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
      val full = customer
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "full")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("c_custkey")).as("n_with_cust"),
          count(col("o_orderkey")).as("n_with_order"))
        .select(lit("full").as("join_type"), col("n_rows"),
          col("n_with_cust"), col("n_with_order"))
      val right = bigOrders
        .join(customer, col("o_custkey") === col("c_custkey"), "right")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("c_custkey")).as("n_with_cust"),
          count(col("o_orderkey")).as("n_with_order"))
        .select(lit("right").as("join_type"), col("n_rows"),
          col("n_with_cust"), col("n_with_order"))
      full.unionByName(right).orderBy(col("join_type"))
    },
    Some("""
      SELECT 'full' AS join_type, count(*) AS n_rows,
        count(c_custkey) AS n_with_cust, count(o_orderkey) AS n_with_order
      FROM customer FULL JOIN
        (SELECT * FROM orders WHERE o_totalprice > 150000) o
        ON c_custkey = o_custkey
      UNION ALL
      SELECT 'right', count(*), count(c_custkey), count(o_orderkey)
      FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
        RIGHT JOIN customer ON o_custkey = c_custkey
      ORDER BY join_type"""))

  /** RANGE-frame windows (value-based frames, peers included) plus
    * first/last over a ROWS frame: 90-day trailing spend per customer.
    */
  val q29RangeFrames: Q = Q(
    "q29_range_frames",
    (s, dir) => {
      val orders = t(s, dir, "orders").filter(col("o_custkey") <= 50)
        .withColumn("day_num",
          datediff(col("o_orderdate"), lit("1990-01-01").cast("date")))
      val byDay = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      val seq = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec2(col("o_totalprice")))
          .over(byDay.rangeBetween(-90, Window.currentRow))
          .cast("double").as("trailing_90d_spend"),
        count(lit(1))
          .over(byDay.rangeBetween(Window.unboundedPreceding, Window.currentRow))
          .as("orders_to_date"),
        first(col("o_totalprice"))
          .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_order_price"),
        last(col("o_totalprice"))
          .over(seq.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("last_order_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY day_num
                   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS trailing_90d_spend,
        count(*) OVER (PARTITION BY o_custkey ORDER BY day_num
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS orders_to_date,
        first_value(o_totalprice)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS first_order_price,
        last_value(o_totalprice)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS last_order_price
      FROM (SELECT *, date_diff('day', TIMESTAMP '1990-01-01 00:00:00', o_orderdate) AS day_num
            FROM orders WHERE o_custkey <= 50) t
      ORDER BY o_custkey, o_orderkey"""))

  /** The reference's keep-first dedup (T8/T9) generalized to testdata:
    * first doc (lowest id) per (lang, source).
    */
  val q22KeepFirstDedup: Q = Q(
    "q22_keepfirst_dedup",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
          row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents) t
      WHERE rn = 1 ORDER BY lang, source"""))
}
