package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.{sumDec, t}

/** Second relational pack: pivot, correlated subqueries, exact percentiles,
  * and the SQL/CTE surface.
  */
object Relational2 {

  def pack: Seq[Q] = Seq(q08bWindowAnalytics2, q14bStringFns2, q15bDateArith,
    q31ScalarSubquery, q33Pivot, q34Percentiles, q35CteSql,
    q34bApproxPercentiles, q38MapFns, q39NullSafeArith, q44SubqueriesSql,
    q45UpsertApply, q46LateralSql, q48ArrayFns)

  /** Distribution-analytic window functions: percent_rank / cume_dist /
    * nth_value over each customer's orders. Ratios are exact integer
    * divisions in double, so the compare needs no rounding; nth_value gets
    * an explicit full frame on both engines (default frames differ by
    * dialect history).
    */
  val q08bWindowAnalytics2: Q = Q(
    "q08b_window_analytics2",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd,
        nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** String surface part 2: padding, character translation, edit distance,
    * repetition, reversal, code points — all integer/string-exact on both
    * engines.
    */
  val q14bStringFns2: Q = Q(
    "q14b_string_fns2",
    (s, dir) => {
      t(s, dir, "part")
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_lpad"),
          rpad(col("p_type"), 20, ".").as("type_rpad"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          levenshtein(col("p_brand"), col("p_type")).as("lev"),
          repeat(col("p_size").cast("string"), 2).as("size2"),
          reverse(col("p_name")).as("name_rev"),
          ascii(col("p_name")).as("name_ascii"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
        lpad(p_brand, 12, '*') AS brand_lpad,
        rpad(p_type, 20, '.') AS type_rpad,
        translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        levenshtein(p_brand, p_type) AS lev,
        repeat(CAST(p_size AS VARCHAR), 2) AS size2,
        reverse(p_name) AS name_rev,
        ascii(p_name) AS name_ascii
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey"""))

  /** Date arithmetic surface: day/month offsets, month boundaries, day-of-
    * week, quarters, day differences — all integer/date-exact. Spark's
    * dayofweek is 1-based Sunday, DuckDB's 0-based Sunday; the oracle
    * mirrors with +1.
    */
  val q15bDateArith: Q = Q(
    "q15b_date_arith",
    (s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("due_30d"),
          add_months(col("o_orderdate"), 3).as("q_later"),
          last_day(col("o_orderdate")).as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("qtr"),
          datediff(lit(java.sql.Date.valueOf("1999-01-01")), col("o_orderdate"))
            .as("days_to_1999"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_30d,
        CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS q_later,
        last_day(o_orderdate) AS month_end,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(date_diff('day', o_orderdate, DATE '1999-01-01') AS INT) AS days_to_1999
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"""))

  /** Correlated scalar-subquery semantics: orders above their customer's
    * average order value. Expressed as window-average + filter (the
    * decorrelated plan Spark produces for the subquery form).
    */
  val q31ScalarSubquery: Q = Q(
    "q31_scalar_subquery",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
      orders
        .withColumn("cust_avg",
          sum(Q.dec2(col("o_totalprice"))).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("cust_avg"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, cust_avg FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey) AS DOUBLE)
            / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders) t
      WHERE o_totalprice > cust_avg
      ORDER BY o_orderkey"""))

  /** Pivot (long → wide): order counts and revenue per year × status.
    * Explicit pivot values keep the output schema static — the only form
    * that scales (value discovery is a driver-side distinct scan).
    */
  val q33Pivot: Q = Q(
    "q33_pivot",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("yr"), col("F").as("n_f"), col("O").as("n_o"),
          col("P").as("n_p"))
        .orderBy(col("yr"))
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
        count(*) FILTER (o_orderstatus = 'F') AS n_f,
        count(*) FILTER (o_orderstatus = 'O') AS n_o,
        count(*) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY 1 ORDER BY yr"""))

  /** Exact interpolated percentiles (median, p90) per group. Both engines
    * use the same linear-interpolation definition; output rounds to 4dp to
    * absorb last-ulp interpolation differences.
    */
  val q34Percentiles: Q = Q(
    "q34_percentiles",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Sketch-based percentiles — the 100 TB path: `percentile_approx`
    * (Greenwald-Khanna) needs one pass and O(accuracy) state per group
    * where the exact form materializes and sorts every group's values.
    * Rows-only (the sketch is engine-specific); ApproxPercentileSpec pins
    * the estimates against the exact q34 values within rank-error bounds.
    */
  val q34bApproxPercentiles: Q = Q(
    "q34b_approx_percentiles",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("median_est"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("p90_est"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },
    None)

  /** Map-typed columns: build a map from aggregated entries, then consume
    * it with element_at / map_keys / size. Output is flat columns (map
    * column ordering is not canonical across engines, so the map itself
    * never leaves the query).
    */
  val q38MapFns: Q = Q(
    "q38_map_fns",
    (s, dir) => {
      val counts = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      counts
        .groupBy(col("yr"))
        .agg(map_from_entries(collect_list(struct(col("o_orderstatus"), col("n"))))
          .as("status_map"))
        .select(
          col("yr"),
          size(col("status_map")).as("n_statuses"),
          coalesce(element_at(col("status_map"), "F"), lit(0L)).as("n_f"),
          coalesce(element_at(col("status_map"), "O"), lit(0L)).as("n_o"),
          // flatten the key list to a string: array-typed output columns
          // sort/hash differently across compare harnesses
          concat_ws(",", array_sort(map_keys(col("status_map")))).as("statuses"))
        .orderBy(col("yr"))
    },
    Some("""
      SELECT yr, CAST(len(status_list) AS INT) AS n_statuses,
        coalesce(n_f, 0) AS n_f, coalesce(n_o, 0) AS n_o,
        array_to_string(status_list, ',') AS statuses
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
          list_sort(list(DISTINCT o_orderstatus)) AS status_list,
          count(*) FILTER (o_orderstatus = 'F') AS n_f,
          count(*) FILTER (o_orderstatus = 'O') AS n_o
        FROM orders GROUP BY 1) t
      ORDER BY yr"""))

  /** Null-safe arithmetic: try_divide and friends return NULL where ANSI
    * would throw — the engine's stance on dirty data (same reason the date
    * parser uses try_to_date).
    */
  val q39NullSafeArith: Q = Q(
    "q39_nullsafe_arith",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          try_divide(col("l_extendedprice"), col("l_discount")).as("price_per_disc"),
          try_divide(col("l_quantity"), col("l_quantity") - col("l_quantity"))
            .as("div_by_zero"),
          (col("l_extendedprice") <=> lit(null)).as("nullsafe_eq"),
          nvl2(col("l_returnflag"), lit("flagged"), lit("none")).as("nvl2_demo"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CASE WHEN l_discount = 0 THEN NULL
             ELSE l_extendedprice / l_discount END AS price_per_disc,
        CAST(NULL AS DOUBLE) AS div_by_zero,
        l_extendedprice IS NOT DISTINCT FROM NULL AS nullsafe_eq,
        CASE WHEN l_returnflag IS NOT NULL THEN 'flagged' ELSE 'none' END AS nvl2_demo
      FROM lineitem WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, l_linenumber"""))

  /** The SQL surface end-to-end: CTEs, a join, a window, and HAVING through
    * spark.sql — the oracle is nearly the same text, which is the point.
    */
  val q35CteSql: Q = Q(
    "q35_cte_sql",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(s"""
        WITH spend AS (
          SELECT c_custkey, c_mktsegment,
            ${sumDec("o_totalprice")} AS total_spend,
            count(*) AS n_orders
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey, c_mktsegment
          HAVING count(*) >= 10),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY total_spend DESC, c_custkey) AS rn
          FROM spend)
        SELECT c_mktsegment, CAST(rn AS INT) AS rank, c_custkey,
               total_spend, n_orders
        FROM ranked WHERE rn <= 5
        ORDER BY c_mktsegment, rank""")
    },
    Some(s"""
      WITH spend AS (
        SELECT c_custkey, c_mktsegment,
          ${sumDec("o_totalprice")} AS total_spend,
          count(*) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
        HAVING count(*) >= 10),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY total_spend DESC, c_custkey) AS rn
        FROM spend)
      SELECT c_mktsegment, CAST(rn AS INT) AS rank, c_custkey,
             total_spend, n_orders
      FROM ranked WHERE rn <= 5
      ORDER BY c_mktsegment, rank"""))

  /** Correlated subquery surface in literal SQL: EXISTS (correlated),
    * NOT IN (uncorrelated, null-free key), and a correlated scalar
    * subquery in the projection — Catalyst decorrelates all three into
    * joins (semi / anti / aggregate-join). ONE ANSI string serves as both
    * the Spark query and the DuckDB oracle, so the surfaces cannot drift.
    */
  private val q44Sql: String = """
      SELECT c.c_custkey, c.c_mktsegment,
        CAST((SELECT count(*) FROM orders o2
              WHERE o2.o_custkey = c.c_custkey
                AND o2.o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000)
        AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'P')
      ORDER BY c.c_custkey"""

  val q44SubqueriesSql: Q = Q(
    "q44_subqueries_sql",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(q44Sql)
    },
    Some(q44Sql))

  /** CDC upsert apply (the batch MERGE a lakehouse table maintenance job
    * runs): events are a change stream keyed by user_id; reduce to
    * LAST-WRITE-WINS per key (ts desc, event_id desc as the deterministic
    * tiebreak — CDC logs can carry equal timestamps), then FULL-OUTER
    * apply onto the customer base table: matched keys get the update's
    * value folded into the balance, unmatched base rows pass through, and
    * update keys absent from the base become inserts. At scale this is one
    * window over the (much smaller) change set + one key-partitioned
    * full-outer join — the standard merge dataflow; nothing touches rows
    * outside the change keys' partitions when the base is key-bucketed.
    */
  val q45UpsertApply: Q = Q(
    "q45_upsert_apply",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val updates = t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id").as("key"), col("event_type").as("last_type"),
          col("value").as("upd_value"), col("ts").as("upd_ts"))
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name"), col("c_acctbal"))
      base.join(updates, Seq("key"), "full_outer")
        .select(col("key"),
          col("c_name"), // null for pure inserts, as MERGE would leave it
          // single IEEE add — bit-exact across engines, no staging needed
          when(col("upd_value").isNotNull,
            coalesce(col("c_acctbal"), lit(0.0)) + col("upd_value"))
            .otherwise(col("c_acctbal")).as("balance"),
          col("last_type"), col("upd_ts"))
        .orderBy(col("key"))
    },
    Some("""
      WITH updates AS (
        SELECT user_id AS key, event_type AS last_type,
               value AS upd_value, ts AS upd_ts
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) e
        WHERE rn = 1),
      base AS (
        SELECT c_custkey AS key, c_name, c_acctbal FROM customer)
      SELECT COALESCE(b.key, u.key) AS key, b.c_name,
        CASE WHEN u.upd_value IS NOT NULL
             THEN COALESCE(b.c_acctbal, 0.0) + u.upd_value
             ELSE b.c_acctbal END AS balance,
        u.last_type, u.upd_ts
      FROM base b FULL OUTER JOIN updates u ON b.key = u.key
      ORDER BY key"""))

  /** Array-function surface over the token arrays: sort, slice, distinct
    * cardinality, membership, element access — the list-manipulation
    * toolkit (per-row narrow, fully codegen'd; the only shuffle is the
    * output sort). Token strings are lowercase ASCII, so Spark's binary
    * UTF-8 sort and DuckDB's default collation order identically.
    */
  val q48ArrayFns: Q = Q(
    "q48_array_fns",
    (s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          concat_ws("-", slice(array_sort(toks), 1, 3)).as("first3_sorted"),
          size(array_distinct(toks)).cast("long").as("n_distinct_toks"),
          array_contains(toks, "the").as("has_the"),
          element_at(toks, -1).as("last_tok"),
          reverse(array_sort(toks))(0).as("max_tok"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        array_to_string(list_sort(words)[1:3], '-') AS first3_sorted,
        CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_toks,
        list_contains(words, 'the') AS has_the,
        words[-1] AS last_tok,
        list_reverse_sort(words)[1] AS max_tok
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE doc_id < 100
      ORDER BY doc_id"""))

  private val q46Sql: String = """
      SELECT tok, CAST(count(*) AS BIGINT) AS n,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM documents
      LATERAL VIEW explode(split(text, ' ')) tk AS tok
      WHERE doc_id < 50
      GROUP BY tok
      HAVING count(*) >= 100
      ORDER BY n DESC, tok"""

  /** LATERAL VIEW surface: the HiveQL-lineage table-generating-function
    * syntax Spark SQL supports (same plan as the DataFrame explode in
    * q21 — this pins the literal-SQL spelling works too). The oracle is
    * the ANSI/DuckDB unnest spelling of the same query.
    */
  val q46LateralSql: Q = Q(
    "q46_lateral_sql",
    (s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(q46Sql)
    },
    Some("""
      SELECT tok, CAST(count(*) AS BIGINT) AS n,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 50) t
      GROUP BY tok
      HAVING count(*) >= 100
      ORDER BY n DESC, tok"""))
}
