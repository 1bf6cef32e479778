package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.{sumDec, t}

/** Second relational pack: pivot, correlated subqueries, exact percentiles,
  * and the SQL/CTE surface.
  */
object Relational2 {

  def pack: Seq[Q] = Seq(q31ScalarSubquery, q33Pivot, q34Percentiles, q35CteSql)

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
}
