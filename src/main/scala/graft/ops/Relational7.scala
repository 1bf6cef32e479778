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

  def pack: Seq[Q] = Seq(q94RfmSegments)

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
