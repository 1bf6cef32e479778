package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Relational/analytics surface additions, round 6 (second continuation):
  * relational division, gaps-and-islands, and batch sessionization — three
  * classic warehouse shapes whose naive spellings hide quadratic or
  * single-task plans, each stated here in its scale-stable form.
  */
object Relational6 {

  def pack: Seq[Q] = Seq(q75Division, q76Islands, q77BatchSessions)

  /** q75: RELATIONAL DIVISION — customers whose orders span EVERY order
    * priority class ("suppliers who stock all parts" in its textbook
    * form). The double-NOT-EXISTS spelling is a correlated anti-join per
    * divisor row; the scale-stable spelling is set-cardinality algebra:
    * one keyed distinct on (customer, priority), one keyed count per
    * customer, and a single-row broadcast of the divisor's cardinality.
    * Every shuffle is keyed by customer — nothing is quadratic in either
    * input, and the divisor table never materializes per-customer.
    */
  val q75Division: Q = Q(
    "q75_division",
    (s, dir) => {
      val cp = t(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"),
          col("o_orderpriority").as("pri"))
        .distinct()
      val divisor = cp.select(col("pri")).distinct()
        .agg(count(lit(1)).as("n_total"))
      val perCust = cp.groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_priorities"))
      perCust.crossJoin(broadcast(divisor))
        .filter(col("n_priorities") === col("n_total"))
        .join(t(s, dir, "customer"), Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_priorities"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH cp AS (
        SELECT DISTINCT o_custkey AS c_custkey, o_orderpriority AS pri
        FROM orders),
      divisor AS (SELECT count(*) AS n_total FROM (SELECT DISTINCT pri FROM cp)),
      per_cust AS (
        SELECT c_custkey, count(*) AS n_priorities FROM cp GROUP BY 1)
      SELECT c.c_custkey, c.c_name, p.n_priorities
      FROM per_cust p CROSS JOIN divisor d
      JOIN customer c USING (c_custkey)
      WHERE p.n_priorities = d.n_total
      ORDER BY c_custkey"""))

  /** q76: GAPS AND ISLANDS — collapse each customer's distinct order dates
    * into maximal runs of consecutive days. The classic trick: inside one
    * customer, `date − row_number()` is constant exactly along a
    * consecutive run, so a keyed window plus a keyed aggregate finds every
    * island with NO self-join (the naive "adjacent pairs" spelling is a
    * quadratic range self-join). The window is partitioned by customer —
    * parallel at any scale; reported islands are the ≥2-day runs.
    */
  val q76Islands: Q = Q(
    "q76_islands",
    (s, dir) => {
      val d = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
        .distinct()
      val grp = date_sub(col("d"),
        row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("d"))))
      d.withColumn("grp", grp)
        .groupBy(col("o_custkey"), col("grp"))
        .agg(min(col("d")).as("island_start"), max(col("d")).as("island_end"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") >= 2)
        .select(col("o_custkey"), col("island_start"), col("island_end"),
          col("n_days"))
        .orderBy(col("o_custkey"), col("island_start"))
    },
    Some("""
      WITH d AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
      g AS (
        SELECT o_custkey, d,
          d - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d)
                   AS INTEGER) AS grp
        FROM d)
      SELECT o_custkey, min(d) AS island_start, max(d) AS island_end,
        count(*) AS n_days
      FROM g GROUP BY o_custkey, grp
      HAVING count(*) >= 2
      ORDER BY o_custkey, island_start"""))

  /** q77: BATCH SESSIONIZATION — gap-based sessions (30-minute timeout)
    * over the event log, the batch twin of the streaming session window
    * (q25) and the fMGWS sessionizer (q36). Flag each event whose gap from
    * the previous event of the same user exceeds the timeout, then a
    * running sum of flags numbers the sessions — two windows and one
    * aggregate, ALL partitioned by user, so the plan is one shuffle on
    * user_id however large the log grows (no global sort, no self-join).
    * Ties broken by event_id so both engines number identically.
    */
  val q77BatchSessions: Q = Q(
    "q77_batch_sessions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(w))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(Q.dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some(s"""
      WITH l AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, ts, value,
          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS session_id
        FROM l)
      SELECT user_id, session_id, min(ts) AS session_start,
        max(ts) AS session_end, count(*) AS n_events,
        ${Q.sumDec("value")} AS sum_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))
}
