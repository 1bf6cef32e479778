package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.t

/** Warehouse-operations additions, round 6 (continuation): referential-
  * integrity auditing and snapshot reconciliation (table diff) — the two
  * checks every pipeline runs between ingest and publish.
  */
object Relational5 {

  def pack: Seq[Q] = Seq(q64FkOrphans, q65TableDiff,
    q66MultitouchAttribution, q67PeriodMovers, q68TransitionMatrix,
    q69ActiveUsers, q70SoleLateSupplier, q71JoinIvm, q73RatioToReport,
    q74Scd2AsOf)

  /** The q64 core for one relationship — exposed for planted-orphan specs:
    * child rows whose FK has no parent (LEFT ANTI join, the relational
    * spelling of "orphan"), reported as total/orphan/distinct-key counts.
    */
  def fkAudit(child: DataFrame, fk: String, parent: DataFrame, pk: String,
      relName: String): DataFrame = {
    val orphans = child.select(col(fk).as("k"))
      .join(parent.select(col(pk).as("k")).distinct(), Seq("k"), "left_anti")
    child.agg(count(lit(1)).as("child_rows"))
      .crossJoin(broadcast(orphans.agg(
        count(lit(1)).as("orphan_rows"),
        countDistinct(col("k")).as("orphan_keys"))))
      .select(lit(relName).as("relationship"), col("child_rows"),
        col("orphan_rows"), col("orphan_keys"))
  }

  /** q64: REFERENTIAL-INTEGRITY AUDIT over the whole star — for every FK
    * edge, how many child rows point at a missing parent. Each edge is
    * one anti-join keyed on the FK (dim side broadcast when small, keyed
    * shuffle otherwise — Spark's threshold decides); the report is one
    * row per relationship however large the facts are. On the driver's
    * FK-consistent data all zeros IS the assertion — the spec plants
    * orphans to prove the detector fires.
    */
  val q64FkOrphans: Q = Q(
    "q64_fk_orphans",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
      val o = t(s, dir, "orders")
      Seq(
        fkAudit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders"),
        fkAudit(li, "l_partkey", t(s, dir, "part"), "p_partkey",
          "lineitem->part"),
        fkAudit(li, "l_suppkey", t(s, dir, "supplier"), "s_suppkey",
          "lineitem->supplier"),
        fkAudit(o, "o_custkey", t(s, dir, "customer"), "c_custkey",
          "orders->customer"),
        fkAudit(t(s, dir, "customer"), "c_nationkey", t(s, dir, "nation"),
          "n_nationkey", "customer->nation"),
        fkAudit(t(s, dir, "nation"), "n_regionkey", t(s, dir, "region"),
          "r_regionkey", "nation->region"))
        .reduce(_ unionAll _)
        .orderBy(col("relationship"))
    },
    Some("""
      WITH edges(rel, child_rows, orphan_rows, orphan_keys) AS (
        SELECT 'lineitem->orders', (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
          (SELECT count(DISTINCT l_orderkey) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL SELECT 'lineitem->part', (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
          (SELECT count(DISTINCT l_partkey) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL SELECT 'lineitem->supplier', (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
          (SELECT count(DISTINCT l_suppkey) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL SELECT 'orders->customer', (SELECT count(*) FROM orders),
          (SELECT count(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
          (SELECT count(DISTINCT o_custkey) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL SELECT 'customer->nation', (SELECT count(*) FROM customer),
          (SELECT count(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
          (SELECT count(DISTINCT c_nationkey) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL SELECT 'nation->region', (SELECT count(*) FROM nation),
          (SELECT count(*) FROM nation n WHERE NOT EXISTS
            (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)),
          (SELECT count(DISTINCT n_regionkey) FROM nation n WHERE NOT EXISTS
            (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)))
      SELECT rel AS relationship, child_rows, orphan_rows, orphan_keys
      FROM edges ORDER BY relationship"""))

  /** The q65 core over any old/new keyed pair — exposed for specs. Both
    * inputs must carry (k, status, price) columns; emits the diff report.
    */
  def tableDiff(oldT: DataFrame, newT: DataFrame): DataFrame = {
    val o = oldT.select(col("k"), col("status").as("o_status"),
      col("price").as("o_price"))
    val n = newT.select(col("k"), col("status").as("n_status"),
      col("price").as("n_price"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        when(col("o_status").isNull && col("o_price").isNull, "added")
          .when(col("n_status").isNull && col("n_price").isNull, "removed")
          .when(col("o_status") === col("n_status") &&
            col("o_price") === col("n_price"), "unchanged")
          .otherwise("changed").as("verdict"),
        (col("o_status") =!= col("n_status")).as("status_diff"),
        (col("o_price") =!= col("n_price")).as("price_diff"))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("status_diff"), 1L).otherwise(0L)).as("status_changes"),
        sum(when(col("price_diff"), 1L).otherwise(0L)).as("price_changes"))
      .orderBy(col("verdict"))
  }

  /** q65: SNAPSHOT DIFF / reconciliation — classify every key across two
    * table versions as added / removed / changed / unchanged with
    * per-column change counts, via ONE full-outer join keyed on the
    * primary key (the only shuffle; per-column compares are free row
    * ops). The "new" snapshot here is simulated deterministically from
    * `orders` (keys ≡0 mod 101 deleted, ≡0 mod 97 price-bumped, a mod-103
    * cohort re-inserted with shifted keys), so the classifier exercises
    * all four verdicts under the oracle. At warehouse scale both sides
    * bucket by the key for an exchange-free diff ([[Bucketing]]).
    */
  val q65TableDiff: Q = Q(
    "q65_table_diff",
    (s, dir) => {
      val base = Q.spread(t(s, dir, "orders"), "o_orderkey")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
            .as("price"))
      val newT = base.filter(col("k") % 101 =!= 0)
        .select(col("k"),
          when(col("k") % 97 === 0, "X").otherwise(col("status")).as("status"),
          when(col("k") % 97 === 0, col("price") + lit(1)).otherwise(col("price"))
            .as("price"))
        .unionAll(base.filter(col("k") % 103 === 0)
          .select((col("k") + 1000000000L).as("k"), col("status"), col("price")))
      tableDiff(base, newT)
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
          CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders),
      newt AS (
        SELECT k,
          CASE WHEN k % 97 = 0 THEN 'X' ELSE status END AS status,
          CASE WHEN k % 97 = 0 THEN price + 1 ELSE price END AS price
        FROM base WHERE k % 101 <> 0
        UNION ALL
        SELECT k + 1000000000, status, price FROM base WHERE k % 103 = 0),
      joined AS (
        SELECT
          CASE WHEN o.k IS NULL THEN 'added'
               WHEN n.k IS NULL THEN 'removed'
               WHEN o.status = n.status AND o.price = n.price THEN 'unchanged'
               ELSE 'changed' END AS verdict,
          o.status <> n.status AS status_diff,
          o.price <> n.price AS price_diff
        FROM base o FULL OUTER JOIN newt n ON o.k = n.k)
      SELECT verdict, count(*) AS n_rows,
        CAST(sum(CASE WHEN status_diff THEN 1 ELSE 0 END) AS BIGINT)
          AS status_changes,
        CAST(sum(CASE WHEN price_diff THEN 1 ELSE 0 END) AS BIGINT)
          AS price_changes
      FROM joined GROUP BY verdict ORDER BY verdict"""))

  private val AttribWindowUs = 7L * 86400000000L // 7-day lookback
  private val CreditScale = 1000000L

  /** q66: LINEAR MULTI-TOUCH ATTRIBUTION — every purchase splits one unit
    * of credit equally across the user's view/click touches in the 7 days
    * before it (q37 is the last-touch variant; linear is what growth
    * teams reconcile budgets against). Credit is integer-scaled
    * (10⁶ div n_touches — deterministic truncation, no rational
    * arithmetic), the per-purchase touch count comes from a window
    * PARTITIONED by purchase, and the purchase×touch pairing is the q18
    * bounded range join: user equi-key + time-band predicate, so join
    * state is O(events in window) per user, never a cross product.
    * Purchases with no touch window report as one `unattributed` row —
    * the reconciliation total every attribution report must carry.
    */
  /** The q66 core over any (event_id, user_id, event_type, t) frame —
    * exposed for planted-credit specs.
    */
  def multitouch(ev: DataFrame): DataFrame = {
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("t").as("pt"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("touch_type"),
          col("t").as("tt"))
      val pairs = purchases.join(touches, Seq("user_id"))
        .filter(col("tt") <= col("pt") &&
          col("tt") > col("pt") - AttribWindowUs)
      val credited = pairs.withColumn("n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("pid"))))
        .withColumn("credit", expr(s"$CreditScale div n"))
      val byType = credited.groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("credit")).as("credit_total"))
      val unattributed = purchases
        .join(pairs.select(col("pid")).distinct(), Seq("pid"), "left_anti")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("unattributed").as("touch_type"), col("n_rows"),
          lit(0L).as("credit_total"))
      byType.unionAll(unattributed).orderBy(col("touch_type"))
  }

  val q66MultitouchAttribution: Q = Q(
    "q66_multitouch_attribution",
    (s, dir) => multitouch(Q.spread(t(s, dir, "events"), "event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))),
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
      p AS (
        SELECT event_id AS pid, user_id, t AS pt FROM ev
        WHERE event_type = 'purchase'),
      tc AS (
        SELECT user_id, event_type AS touch_type, t AS tt FROM ev
        WHERE event_type IN ('view', 'click')),
      pairs AS (
        SELECT p.pid, tc.touch_type FROM p JOIN tc USING (user_id)
        WHERE tc.tt <= p.pt AND tc.tt > p.pt - $AttribWindowUs),
      credited AS (
        SELECT touch_type,
          $CreditScale // count(*) OVER (PARTITION BY pid) AS credit
        FROM pairs)
      SELECT touch_type, count(*) AS n_rows,
        CAST(sum(credit) AS BIGINT) AS credit_total
      FROM credited GROUP BY touch_type
      UNION ALL
      SELECT 'unattributed', count(*), 0 FROM p
      WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.pid = p.pid)
      ORDER BY touch_type"""))

  /** q67: PERIOD-OVER-PERIOD TOP MOVERS — revenue per nation for two
    * adjacent years side by side, delta in exact cents, relative change
    * in integer basis points, top 10 by absolute swing (the BI "what
    * moved and why" report). One star join (dims broadcast) feeding one
    * grouped conditional aggregation — the two periods come out of a
    * single fact pass, not two scans — then a global top-k as
    * TakeOrderedAndProject. The |delta| tie breaks on nation name, so
    * the cut is deterministic.
    */
  val q67PeriodMovers: Q = Q(
    "q67_period_movers",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
      val rev = li
        .join(t(s, dir, "orders").filter(
          year(col("o_orderdate")).isin(1997, 1998)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(when(year(col("o_orderdate")) === 1997, Q.discPrice))
            .as("prev"),
          sum(when(year(col("o_orderdate")) === 1998, Q.discPrice))
            .as("cur"))
        .select(col("n_name"),
          // discPrice sums are scale-4 DECIMALs: x10000 makes them
          // INTEGRAL before the bigint cast (a fractional cast would hit
          // Spark-truncates vs DuckDB-rounds); delta_bp runs on |delta|
          // with the sign re-applied, because the engines disagree on
          // NEGATIVE integer division (trunc vs floor)
          (coalesce(col("prev"), lit(0)) * 10000).cast("long").as("prev_e4"),
          (coalesce(col("cur"), lit(0)) * 10000).cast("long").as("cur_e4"))
        .select(col("n_name"), col("prev_e4"), col("cur_e4"),
          (col("cur_e4") - col("prev_e4")).as("delta_e4"))
        .withColumn("delta_bp",
          signum(col("delta_e4")).cast("long") *
            expr("abs(delta_e4) * 10000 div prev_e4"))
      rev.orderBy(abs(col("delta_e4")).desc, col("n_name")).limit(10)
    },
    Some(s"""
      WITH rev AS (
        SELECT n_name,
          sum(CASE WHEN year(o_orderdate) = 1997 THEN ${Q.sqlDiscPrice} END)
            AS prev,
          sum(CASE WHEN year(o_orderdate) = 1998 THEN ${Q.sqlDiscPrice} END)
            AS cur
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) IN (1997, 1998)
        GROUP BY n_name),
      m AS (
        SELECT n_name,
          CAST(coalesce(prev, 0) * 10000 AS BIGINT) AS prev_e4,
          CAST(coalesce(cur, 0) * 10000 AS BIGINT) AS cur_e4
        FROM rev)
      SELECT n_name, prev_e4, cur_e4,
        cur_e4 - prev_e4 AS delta_e4,
        CAST(sign(cur_e4 - prev_e4) AS BIGINT) *
          (abs(cur_e4 - prev_e4) * 10000 // prev_e4) AS delta_bp
      FROM m ORDER BY abs(cur_e4 - prev_e4) DESC, n_name LIMIT 10"""))

  /** q68: USER-JOURNEY TRANSITION MATRIX — Markov counts between each
    * user's consecutive event types plus row-stochastic probabilities in
    * integer basis points: the "where do users go next" report behind
    * funnel design and session-flow anomaly detection (q52's funnel is
    * one fixed path; this is the full matrix). One user-partitioned `lag`
    * window ordered by (time, event_id) — deterministic successor per
    * event — then a keyed count bounded by |event types|²; the row
    * normalizer is a window over that tiny matrix. Per-user state never
    * leaves its partition; the matrix is constant-size at any scale.
    */
  val q68TransitionMatrix: Q = Q(
    "q68_transition_matrix",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val ev = Q.spread(t(s, dir, "events"), "event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
      val matrix = ev.filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      matrix.withColumn("row_total",
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("n * 10000 div row_total").as("p_bp"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS from_type
        FROM events),
      m AS (
        SELECT from_type, event_type AS to_type, count(*) AS n
        FROM ev WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        n * 10000 // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
          AS p_bp
      FROM m ORDER BY from_type, to_type"""))

  /** q69: DAU / trailing-7-day WAU / stickiness — the engagement
    * dashboard's first row. The fact stream collapses to DISTINCT
    * (user, day) pairs first (the only data-volume pass); DAU is a keyed
    * count over that, and WAU(d) joins each day against its trailing
    * 7-day window of the SAME collapsed table — a (day × window) join
    * bounded by the calendar on one side, with the distinct-user count
    * per (day, window) keyed. Stickiness = DAU·10⁴ div WAU in integer bp.
    * Nothing here scales with raw events beyond the initial distinct.
    */
  val q69ActiveUsers: Q = Q(
    "q69_active_users",
    (s, dir) => {
      val ud = Q.spread(t(s, dir, "events"), "event_id")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val days = ud.select(col("day")).distinct()
      val wau = days.as("d")
        .join(ud.as("u"),
          col("u.day") <= col("d.day") &&
            col("u.day") > date_sub(col("d.day"), 7))
        .groupBy(col("d.day").as("day"))
        .agg(countDistinct(col("u.user_id")).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("dau * 10000 div wau").as("stickiness_bp"))
        .orderBy(col("day"))
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      wau AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM (SELECT DISTINCT day FROM ud) d
          JOIN ud u ON u.day <= d.day AND u.day > d.day - 7
        GROUP BY d.day)
      SELECT day, dau, wau, dau * 10000 // wau AS stickiness_bp
      FROM dau JOIN wau USING (day) ORDER BY day"""))

  /** q70: the TPC-H Q21 pattern ("suppliers who kept orders waiting") on
    * this schema — for multi-supplier orders, the supplier who was the
    * ONLY late shipper (ship date > 90 days after order date), counted
    * per supplier, top 20. The classic formulation is DOUBLY correlated
    * (EXISTS another supplier on the order AND NOT EXISTS another LATE
    * one) — the decorrelation stress test. The Spark side runs the
    * scalable AGGREGATE REWRITE: one pass computes per-order distinct
    * supplier and distinct-late-supplier counts, the late rows join back,
    * and the filter (≥2 suppliers, exactly 1 late) replaces both
    * correlated subqueries — two keyed shuffles total, no per-row
    * subquery execution. The ORACLE keeps the textbook EXISTS/NOT EXISTS
    * form, so the hash match PROVES the rewrite's equivalence.
    */
  val q70SoleLateSupplier: Q = Q(
    "q70_sole_late_supplier",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 90).as("late"))
      val perOrder = li.groupBy(col("ok"))
        .agg(countDistinct(col("sk")).as("n_supp"),
          countDistinct(when(col("late"), col("sk"))).as("n_late"))
      val pairs = li.filter(col("late"))
        .select(col("ok"), col("sk")).distinct()
        .join(perOrder.hint("shuffle_hash"), "ok")
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      pairs.join(broadcast(t(s, dir, "supplier")),
          col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk,
          date_diff('day', o_orderdate, l_shipdate) > 90 AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      sole AS (
        SELECT DISTINCT l1.ok, l1.sk FROM li l1
        WHERE l1.late
          AND EXISTS (
            SELECT 1 FROM li l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
          AND NOT EXISTS (
            SELECT 1 FROM li l3
            WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late))
      SELECT s_name, count(*) AS numwait
      FROM sole JOIN supplier ON sk = s_suppkey
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** q71: INCREMENTAL VIEW MAINTENANCE for a JOIN — q56 maintains an
    * AGGREGATE under deltas; this maintains a materialized JOIN view with
    * the classic delta identity
    * Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB:
    * the Spark side builds the new view as old-view ∪ the three delta
    * terms (insert deltas carved deterministically out of orders and
    * customer by mod cohorts), while the ORACLE aggregates the plain full
    * join — the hash match proves the maintenance lossless. At warehouse
    * scale the delta terms are the whole point: ΔA⋈B touches only delta
    * keys (a keyed semi-sized join), never the full fact re-join; the
    * old view is already materialized and only appended to.
    */
  val q71JoinIvm: Q = Q(
    "q71_join_ivm",
    (s, dir) => {
      val o = Q.spread(t(s, dir, "orders"), "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
            .as("price"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val oOld = o.filter(col("o_orderkey") % 101 =!= 0)
      val oDelta = o.filter(col("o_orderkey") % 101 === 0)
      val cOld = c.filter(col("c_custkey") % 97 =!= 0)
      val cDelta = c.filter(col("c_custkey") % 97 === 0)
      val key = col("o_custkey") === col("c_custkey")
      val oldView = oOld.join(cOld, key)
      val deltaTerms = oDelta.join(cOld, key)
        .unionAll(oOld.join(cDelta, key))
        .unionAll(oDelta.join(cDelta, key))
      oldView.unionAll(deltaTerms)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** q73: RATIO-TO-REPORT — each nation's revenue as a share of its
    * region (window sum over the aggregated rows) AND of the global total
    * (one-row broadcast), both in integer basis points on exact scale-4
    * units. The classic "percent of total" report: the windows and the
    * total run over the ALREADY-AGGREGATED nation rows (25 of them), so
    * the share computation is free at any fact scale — the only
    * data-volume work is the star-join aggregate that q03 already showed.
    */
  val q73RatioToReport: Q = Q(
    "q73_ratio_to_report",
    (s, dir) => {
      val rev = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((sum(Q.discPrice) * 10000).cast("long").as("rev_e4"))
      val wRegion = org.apache.spark.sql.expressions.Window
        .partitionBy(col("r_name"))
      val total = rev.agg(sum(col("rev_e4")).as("tot_e4"))
      rev.withColumn("region_e4", sum(col("rev_e4")).over(wRegion))
        .crossJoin(broadcast(total))
        .select(col("r_name"), col("n_name"), col("rev_e4"),
          expr("rev_e4 * 10000 div region_e4").as("share_of_region_bp"),
          expr("rev_e4 * 10000 div tot_e4").as("share_of_total_bp"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""
      WITH rev AS (
        SELECT r_name, n_name,
          CAST(sum(${Q.sqlDiscPrice}) * 10000 AS BIGINT) AS rev_e4
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name, rev_e4,
        rev_e4 * 10000 //
          CAST(sum(rev_e4) OVER (PARTITION BY r_name) AS BIGINT)
          AS share_of_region_bp,
        rev_e4 * 10000 // (SELECT CAST(sum(rev_e4) AS BIGINT) FROM rev)
          AS share_of_total_bp
      FROM rev ORDER BY r_name, n_name"""))

  /** q74: POINT-IN-TIME (AS-OF) QUERY over the q55 SCD2 history — "what
    * did every dimension row look like on Jan 15": rebuild the versioned
    * validity intervals (one keyed window pass, q55's shape) and keep the
    * version whose [valid_from, valid_to) interval contains the as-of
    * instant. The temporal-warehouse read pattern that SCD2 exists to
    * serve; at scale the history table is already materialized and the
    * as-of read is one interval predicate — with the history partitioned
    * on valid_from date, the predicate prunes partitions.
    */
  val q74Scd2AsOf: Q = Q(
    "q74_scd2_asof",
    (s, dir) => {
      val asOf = "2024-01-15 00:00:00"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .filter(col("ts") <= lit(asOf).cast("timestamp") &&
          (col("valid_to").isNull ||
            col("valid_to") > lit(asOf).cast("timestamp")))
        .select(col("user_id"), col("version").cast("int").as("version"),
          col("ts").as("valid_from"), col("valid_to"), col("value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, version, valid_from, valid_to, value FROM (
        SELECT user_id,
          CAST(row_number() OVER w AS INT) AS version,
          ts AS valid_from,
          lead(ts, 1) OVER w AS valid_to,
          value
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) h
      WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
      ORDER BY user_id"""))
}
