package graft.ops

import org.apache.spark.sql.functions._
import Q.{dec2, dec4, sumDec, t}

/** Relational surface additions, round 4: wide→long reshaping (UNPIVOT)
  * and ordered-sequence funnel analysis over the event stream.
  */
object Relational3 {

  def pack: Seq[Q] =
    Seq(q51Unpivot, q52Funnel, q55Scd2, q56IncrementalAgg, q57RecursiveCte,
      q58MarketBasket, q59SkewReport)

  /** q51: UNPIVOT/melt — the inverse of q33's pivot. A wide per-flag
    * metric table reshapes into (key, metric, value) rows via
    * `Dataset.unpivot` (Spark's native EXPAND-based melt — one narrow
    * local expansion, no shuffle beyond the source aggregation). The
    * oracle mirrors with the portable UNION ALL form. Sums are
    * decimal-staged so the unpivoted doubles compare exactly.
    */
  val q51Unpivot: Q = Q(
    "q51_unpivot",
    (s, dir) => {
      val wide = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec4(col("l_discount"))).cast("double").as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    },
    Some(s"""
      WITH wide AS (
        SELECT l_returnflag,
          ${sumDec("l_quantity")} AS sum_qty,
          ${sumDec("l_extendedprice")} AS sum_price,
          ${sumDec("l_discount", 4)} AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
      ORDER BY l_returnflag, metric"""))

  /** q52: strict-order funnel — per user, the FIRST view, then the first
    * click strictly after it, then the first purchase strictly after
    * that; only completed funnels survive. The sequence-detection shape
    * (MATCH_RECOGNIZE's bread-and-butter) expressed as three
    * filter→keyed-min stages chained by (user, anchor-ts) joins — every
    * stage is a key-partitioned aggregation on user_id, so the whole
    * funnel is shuffle-bounded by the (small) per-stage survivor sets,
    * never a corpus-wide window sort.
    */
  val q52Funnel: Q = Q(
    "q52_funnel",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("view_ts"))
        .groupBy(col("user_id"), col("view_ts"))
        .agg(min(col("ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("click_ts"))
        .groupBy(col("user_id"), col("view_ts"), col("click_ts"))
        .agg(min(col("ts")).as("purchase_ts"))
      p.select(col("user_id"), col("view_ts"), col("click_ts"),
          col("purchase_ts"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
            .as("funnel_us"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS view_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
        WHERE e.event_type = 'click' GROUP BY e.user_id, v.view_ts),
      p AS (
        SELECT e.user_id, c.view_ts, c.click_ts, min(e.ts) AS purchase_ts
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id, c.view_ts, c.click_ts)
      SELECT user_id, view_ts, click_ts, purchase_ts,
        CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS funnel_us
      FROM p ORDER BY user_id"""))

  /** q55: SCD type-2 history build — turn a change stream into versioned
    * validity intervals per key: version number, valid_from = the change's
    * timestamp, valid_to = the NEXT change's timestamp (null while
    * current), is_current flag. The dimension-history companion to q45's
    * MERGE (which keeps only final state): one window pass per key,
    * shuffle keyed on user_id, deterministic under timestamp ties via the
    * event_id tiebreak. Purchases stand in for the change stream.
    */
  val q55Scd2: Q = Q(
    "q55_scd2",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version").cast("int").as("version"),
          col("ts").as("valid_from"), col("valid_to"), col("value"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("version"))
    },
    Some("""
      SELECT user_id,
        CAST(row_number() OVER w AS INT) AS version,
        ts AS valid_from,
        lead(ts, 1) OVER w AS valid_to,
        value,
        lead(ts, 1) OVER w IS NULL AS is_current
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version"""))

  /** q56: incremental aggregate maintenance — merge yesterday's
    * aggregate STATE with today's delta instead of recomputing over the
    * full history: counts/sums add, mins/maxes combine, and because the
    * sum state is exact decimal the merged figures are BIT-identical to
    * the full recompute. That equality IS the oracle (which aggregates
    * the whole table directly): it proves the merge is lossless, the
    * property that lets a 100 TB nightly rollup touch only the new
    * partition. Halves are staged by l_orderkey parity.
    */
  val q56IncrementalAgg: Q = Q(
    "q56_incremental_agg",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
      def state(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as(s"n$tag"),
          sum(dec2(col("l_quantity"))).as(s"sq$tag"), // DECIMAL state: exact merge
          min(col("l_shipdate")).as(s"mn$tag"),
          max(col("l_shipdate")).as(s"mx$tag"))
      val zero = lit(0).cast(DecimalType(28, 2))
      state(li.filter(col("l_orderkey") % 2 === 0), "1")
        .join(state(li.filter(col("l_orderkey") % 2 === 1), "2"),
          Seq("l_returnflag"), "full_outer") // a key may exist in one side only
        .select(col("l_returnflag"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("sq1"), zero) + coalesce(col("sq2"), zero))
            .cast("double").as("sum_qty"),
          least(col("mn1"), col("mn2")).as("first_ship"), // least/greatest skip nulls
          greatest(col("mx1"), col("mx2")).as("last_ship"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      SELECT l_returnflag, count(*) AS n_rows,
        ${sumDec("l_quantity")} AS sum_qty,
        min(l_shipdate) AS first_ship,
        max(l_shipdate) AS last_ship
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q57: recursive CTE through Spark SQL (supported natively since
    * Spark 4) — walk each user up the implicit binary referral tree
    * (parent = floor(id/2)) to the root and report chain length and
    * ancestor-id sum. ONE portable ANSI string is both the Spark query
    * and the DuckDB oracle (the q44 pattern — the strongest equivalence
    * form), so it uses floor(x/2) instead of the engines' differing
    * integer-division spellings. Recursion depth is O(log max-id); each
    * round is one self-join-free projection of the frontier.
    */
  private val recursiveSql = """
      WITH RECURSIVE walk(user_id, anc) AS (
        SELECT DISTINCT user_id, user_id FROM events
        UNION ALL
        SELECT user_id, CAST(floor(anc / 2) AS BIGINT) FROM walk WHERE anc > 0
      )
      SELECT user_id, count(*) AS chain_len,
        CAST(sum(anc) AS BIGINT) AS anc_sum
      FROM walk GROUP BY user_id ORDER BY user_id"""

  val q57RecursiveCte: Q = Q(
    "q57_recursive_cte",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql(recursiveSql)
    },
    Some(recursiveSql))

  /** q58: market-basket association rules — the top-20 bought-together
    * part pairs by support, with confidence and lift. The co-occurrence
    * counting is g62's pair stage (per-order self-join, keyed aggregate);
    * per-item counts join back by key. Lift and confidence are ratios of
    * exact integers, so the doubles divide identically in both engines;
    * ranking is on the integer support with a (x, y) tie-break, so the
    * top-20 cut is deterministic. Scale shape: everything is keyed joins
    * over (order, part) and (pair) keys — the only broadcast is the
    * one-row basket count; the global top-20 goes through orderBy+limit
    * (TakeOrderedAndProject: per-partition heaps merged at the driver,
    * k rows each), NEVER a global rank window.
    */
  val q58MarketBasket: Q = Q(
    "q58_market_basket",
    (s, dir) => {
      val lp = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nOrders = lp.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val item = lp.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      val pairs = lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("x"), col("b.p").as("y"))
        .agg(count(lit(1)).as("cxy"))
        .filter(col("cxy") >= 2)
      val res = pairs
        .join(item.select(col("p").as("x"), col("cnt").as("cx")), "x")
        .join(item.select(col("p").as("y"), col("cnt").as("cy")), "y")
        .crossJoin(broadcast(nOrders))
        .orderBy(col("cxy").desc, col("x"), col("y"))
        .limit(20)
        .select(col("x"), col("y"), col("cxy").as("support_cnt"),
          round(col("cxy") / col("cx"), 6).as("confidence"),
          round(col("cxy") * col("n_orders") / (col("cx") * col("cy")), 6)
            .as("lift"))
        .orderBy(col("support_cnt").desc, col("x"), col("y"))
      Q.materialized(res, lp)
    },
    Some("""
      WITH lp AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      n AS (SELECT count(DISTINCT ok) AS n_orders FROM lp),
      item AS (SELECT p, count(*) AS cnt FROM lp GROUP BY p),
      pairs AS (
        SELECT a.p AS x, b.p AS y, count(*) AS cxy
        FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      ranked AS (
        SELECT x, y, cxy, ix.cnt AS cx, iy.cnt AS cy,
          row_number() OVER (ORDER BY cxy DESC, x, y) AS rk
        FROM pairs JOIN item ix ON pairs.x = ix.p
          JOIN item iy ON pairs.y = iy.p)
      SELECT x, y, cxy AS support_cnt,
        round(CAST(cxy AS DOUBLE) / cx, 6) AS confidence,
        round(CAST(cxy AS DOUBLE) * (SELECT n_orders FROM n) / (cx * cy), 6)
          AS lift
      FROM ranked WHERE rk <= 20
      ORDER BY support_cnt DESC, x, y"""))

  /** q59: join-key SKEW REPORT — per candidate join column of the fact
    * table: row count, distinct keys, the heaviest key's count and share,
    * and the max/mean ratio (the number that decides whether q30/q32's
    * salting or AQE skew-join is needed BEFORE a 100 TB join hangs on one
    * straggler task). One keyed count per column + one tiny aggregate —
    * the report costs what a group-by costs, and the max/mean ratio is
    * the exact integer expression max_cnt·n_keys/n_rows (both engines
    * divide the same BIGINTs into the same double). The heaviest key id
    * itself is reported via the packed integer argmax `max(cnt·2³² + key)`
    * (e57's tie-break trick, highest count then highest key — exact in
    * both engines; key ids are far below 2³²).
    */
  val q59SkewReport: Q = Q(
    "q59_skew_report",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val reports = Seq("l_orderkey", "l_partkey", "l_suppkey").map { c =>
        li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(
            sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("cnt")).as("max_cnt"),
            expr(s"max(cnt * ${1L << 32} + $c)").as("packed"))
          .select(lit(c).as("join_col"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            expr(s"packed % ${1L << 32}").as("heaviest_key"),
            round(col("max_cnt") / col("n_rows"), 6).as("max_share"),
            round(col("max_cnt") * col("n_keys") / col("n_rows"), 6)
              .as("skew_ratio"))
      }
      val res = reports.reduce(_ unionAll _).orderBy(col("join_col"))
      Q.materialized(res, li)
    },
    Some {
      def one(c: String) = s"""
        SELECT '$c' AS join_col,
          CAST(sum(cnt) AS BIGINT) AS n_rows,
          count(*) AS n_keys,
          max(cnt) AS max_cnt,
          CAST(max(cnt * ${1L << 32} + $c) % ${1L << 32} AS BIGINT)
            AS heaviest_key,
          round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT), 6)
            AS max_share,
          round(CAST(max(cnt) * count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT),
            6) AS skew_ratio
        FROM (SELECT $c, count(*) AS cnt FROM lineitem GROUP BY $c) t"""
      Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
        .mkString("", "\n        UNION ALL", "\n        ORDER BY join_col")
    })
}
