package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based-optimizer wiring: q100 computes ANALYZE-style column
  * statistics as a query RESULT; this component feeds real catalog
  * statistics INTO Spark's CBO so they change plans. [[ensureAnalyzed]]
  * registers the driver parquet tables in the session catalog and runs
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` (row counts +
  * per-column NDV/min/max/null histograms — the inputs
  * `CostBasedJoinReorder` and filter-selectivity estimation consume);
  * [[starQuery]] is a deliberately badly-ordered 3-table star join
  * (fact first, selective dim last) whose optimal order only a
  * stats-driven optimizer can discover. `CboSpec` proves the reorder
  * fires (the innermost join flips from fact⋈dim to dim⋈dim under
  * `spark.sql.cbo.enabled` + `joinReorder.enabled`) and that results
  * stay identical either way.
  *
  * At warehouse scale this is the difference between shuffling the fact
  * table against an unfiltered mid dim and first collapsing the dims to
  * a near-empty broadcast side: the stats, not the query author, pick
  * the order — the last optimizer-facing behavior the engine exercised
  * only implicitly.
  */
object CboStats {

  /** Catalog-register `tables` from `dir` (external parquet, no copy) and
    * compute full column statistics. Idempotent per session+suffix.
    */
  def ensureAnalyzed(spark: SparkSession, dir: String,
      tables: Seq[String], suffix: String = "cbo"): Unit =
    tables.foreach { t =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS ${t}_$suffix USING PARQUET " +
        s"LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE ${t}_$suffix COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** The star probe, written WORST-FIRST on purpose: the orders fact is
    * joined to the full customer dim before the one-row nation filter is
    * reachable. With statistics, the optimizer should associate
    * customer⋈nation first (a ~1/25-selective dim collapse), then touch
    * the fact once.
    */
  def starQuery(spark: SparkSession, suffix: String = "cbo"): DataFrame =
    spark.sql(s"""
      SELECT n.n_name, count(*) AS n_orders,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders_$suffix o
      JOIN customer_$suffix c ON o.o_custkey = c.c_custkey
      JOIN nation_$suffix n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_name = 'FRANCE'
      GROUP BY n.n_name""")
}
