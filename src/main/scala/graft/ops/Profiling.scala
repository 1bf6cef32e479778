package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Data-profiling operators: the "analyze my table" surface a pipeline runs
  * before trusting a new snapshot — per-column stats, distribution
  * histograms, and statistical outlier flagging. All single-pass aggregates
  * with exact-decimal staging wherever doubles are summed.
  */
object Profiling {

  def pack: Seq[Q] = Seq(q41Outliers, q42Histogram, q43Profile, q49CovarCorr)

  /** Cross-column second moments: population covariance and Pearson
    * correlation of (event value, hour-of-day) per event type — the
    * feature-correlation scan a dataset audit runs. The engines' own
    * covar_pop/corr are double accumulations whose order differs across
    * partitionings, so both sides compute from exact-decimal Σx, Σy, Σxy,
    * Σx², Σy² (hour is an exact small int, value exact at 2dp) and then
    * apply the IDENTICAL double expression tree — one partial+final
    * shuffle, bit-stable output, the same trick as q41's variance.
    */
  val q49CovarCorr: Q = Q(
    "q49_covar_corr",
    (s, dir) => {
      import org.apache.spark.sql.functions.hour
      val x = Q.dec2(col("value"))
      val y = hour(col("ts")).cast(org.apache.spark.sql.types.DecimalType(4, 0))
      val agg = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val covar = d("sxy") / n - (d("sx") / n) * (d("sy") / n)
      val varx = d("sxx") / n - (d("sx") / n) * (d("sx") / n)
      val vary = d("syy") / n - (d("sy") / n) * (d("sy") / n)
      agg.select(col("event_type"), col("n").cast("long").as("n"),
        covar.as("covar_pop"),
        (covar / (sqrt(varx) * sqrt(vary))).as("corr"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH m AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(hour(ts) AS DECIMAL(4,0))) AS DOUBLE) AS sy,
          CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(hour(ts) AS DECIMAL(4,0))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(hour(ts) AS DECIMAL(4,0)) * CAST(hour(ts) AS DECIMAL(4,0))) AS DOUBLE) AS syy
        FROM events GROUP BY event_type)
      SELECT event_type, n,
        sxy/n - (sx/n)*(sy/n) AS covar_pop,
        (sxy/n - (sx/n)*(sy/n)) /
          (sqrt(sxx/n - (sx/n)*(sx/n)) * sqrt(syy/n - (sy/n)*(sy/n))) AS corr
      FROM m ORDER BY event_type"""))

  /** Statistical outliers: order totals more than 1.5σ above their
    * priority-group mean (totals are near-uniform, so a 3σ band would be
    * empty — the distribution-aware tail cut is the realistic knob).
    * Mean and variance are computed from
    * exact-decimal Σx and Σx² (never the engines' own stddev — their
    * accumulation orders differ), so z-scores are bit-identical; sqrt is
    * IEEE-exact.
    */
  val q41Outliers: Q = Q(
    "q41_outliers",
    (s, dir) => {
      val stats = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(Q.dec2(col("o_totalprice"))).as("sx"),
          sum(Q.dec2(col("o_totalprice")) * Q.dec2(col("o_totalprice"))).as("sxx"))
        .select(col("o_orderpriority"), col("n"),
          (col("sx").cast("double") / col("n")).as("mean"),
          sqrt(col("sxx").cast("double") / col("n") -
            (col("sx").cast("double") / col("n")) *
              (col("sx").cast("double") / col("n"))).as("sd"))
      t(s, dir, "orders")
        .join(broadcast(stats), "o_orderpriority")
        .filter(col("o_totalprice") > col("mean") + lit(1.5) * col("sd"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), round(col("mean"), 4).as("grp_mean"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      WITH stats AS (
        SELECT o_orderpriority, count(*) AS n,
          ${Q.sumDec("o_totalprice")} AS sx,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
                   CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM orders GROUP BY o_orderpriority)
      SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
        round(s.sx/s.n, 4) AS grp_mean
      FROM orders o JOIN stats s USING (o_orderpriority)
      WHERE o.o_totalprice > s.sx/s.n + 1.5 * sqrt(s.sxx/s.n - (s.sx/s.n)*(s.sx/s.n))
      ORDER BY o_orderkey"""))

  /** Value-distribution histogram via width_bucket: fixed [0, 600000)
    * range in 12 buckets per order status. DuckDB has no width_bucket, so
    * the oracle mirrors Spark's exact arithmetic —
    * floor(v / ((max-min)/n)) + 1 with out-of-range rows in buckets 0 and
    * n+1 — the same IEEE double ops on both engines.
    */
  val q42Histogram: Q = Q(
    "q42_histogram",
    (s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12L))
            .cast("int").as("bucket"))
        .groupBy(col("o_orderstatus"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("bucket"))
    },
    Some("""
      SELECT o_orderstatus,
        CAST(CASE WHEN o_totalprice < 0 THEN 0
                  WHEN o_totalprice >= 600000 THEN 13
                  ELSE floor(o_totalprice / (600000.0/12)) + 1 END AS INT) AS bucket,
        count(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket"""))

  /** Single-pass column profile of the orders snapshot: row count, null
    * rates, distinct counts, extrema — the trust-but-verify scan run on
    * every new ingest. One aggregate, no shuffle beyond the final
    * single-row reduce.
    */
  val q43Profile: Q = Q(
    "q43_profile",
    (s, dir) => {
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("orderkey_nonnull"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        min(col("o_orderdate")).as("date_min"),
        max(col("o_orderdate")).as("date_max"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"))
    },
    Some("""
      SELECT count(*) AS n_rows,
        count(o_orderkey) AS orderkey_nonnull,
        count(DISTINCT o_custkey) AS custkey_distinct,
        count(DISTINCT o_orderstatus) AS status_distinct,
        min(o_orderdate) AS date_min,
        max(o_orderdate) AS date_max,
        min(o_totalprice) AS price_min,
        max(o_totalprice) AS price_max
      FROM orders"""))
}
