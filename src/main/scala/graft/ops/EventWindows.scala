package graft.ops

import graft.streaming.EventTransforms
import org.apache.spark.sql.functions._
import Q.t

/** Event-time window operators exercised in batch mode (the driver's oracle
  * can only check batch results); the SAME transforms run streaming in
  * [[graft.streaming.EventTransforms]] — see EventStreamSpec for the
  * streaming-mode coverage with watermarks and late data.
  */
object EventWindows {

  def pack: Seq[Q] =
    Seq(q23Tumbling, q24Sliding, q25Sessions, q36StatefulSessions,
      q37ClickAttribution, q37bConversionFull, q47GapFill, q50ForwardFill)

  /** Forward fill / last-observation-carried-forward (q47's companion:
    * gap fill densifies the GRID, LOCF densifies the VALUES): treat
    * error-type events as missing readings and carry each user's last
    * non-null value forward in (ts, event_id) order — `last(...,
    * ignoreNulls)` over an unbounded-preceding frame, the canonical LOCF
    * window. No arithmetic touches the carried doubles, so the compare
    * is bit-exact without decimal staging. One partitioned window
    * shuffle; scales like any keyed window.
    */
  val q50ForwardFill: Q = Q(
    "q50_forward_fill",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val v = when(col("event_type") === "error", lit(null)).otherwise(col("value"))
      t(s, dir, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"), v.as("v"),
          last(v, ignoreNulls = true).over(w).as("v_filled"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id, v,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS v_filled
      FROM (SELECT user_id, event_id, ts,
              CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events WHERE user_id < 10) t
      ORDER BY user_id, event_id"""))

  /** Time-series resample with gap filling (the densification step before
    * any per-entity time-series model: a day with no events must appear as
    * an explicit zero row, not be silently absent): build the full
    * user × calendar-day grid from the corpus' date bounds via
    * `sequence()` + explode, left-join the per-day aggregates, and
    * zero-fill the holes. The calendar is one scalar-aggregate row
    * exploded to #days — broadcast-sized at ANY corpus scale (a century
    * is 36 525 rows) — so the only real shuffle is the per-(user, day)
    * aggregation; user_id < 20 bounds the demo grid.
    */
  val q47GapFill: Q = Q(
    "q47_gap_fill",
    (s, dir) => {
      val events = t(s, dir, "events").filter(col("user_id") < 20)
      val daily = events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(Q.dec2(col("value"))).as("v"))
      val cal = events
        .agg(min(to_date(col("ts"))).as("dmin"), max(to_date(col("ts"))).as("dmax"))
        .select(explode(expr("sequence(dmin, dmax, interval 1 day)")).as("day"))
      val users = events.select(col("user_id")).distinct()
      users.crossJoin(broadcast(cal))
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_events"),
          coalesce(col("v").cast("double"), lit(0.0)).as("total_value"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH ev AS (SELECT * FROM events WHERE user_id < 20),
      daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM ev GROUP BY 1, 2),
      bounds AS (
        SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
        FROM ev),
      cal AS (
        SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds),
      grid AS (
        SELECT u.user_id, c.day
        FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN cal c)
      SELECT g.user_id, g.day,
        CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
        COALESCE(d.v, 0.0) AS total_value
      FROM grid g LEFT JOIN daily d
        ON g.user_id = d.user_id AND g.day = d.day
      ORDER BY g.user_id, g.day"""))

  /** Tumbling 1-hour windows per event type. */
  val q23Tumbling: Q = Q(
    "q23_tumbling_window",
    (s, dir) => EventTransforms.tumbling(t(s, dir, "events"))
      .orderBy(col("window_start"), col("event_type")),
    Some(s"""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        count(*) AS n, ${Q.sumDec("value")} AS total_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Sliding 1-hour windows every 30 minutes: each event lands in 2 windows.
    * The oracle replicates Spark's epoch-aligned window assignment by
    * unnesting the slide offsets.
    */
  val q24Sliding: Q = Q(
    "q24_sliding_window",
    (s, dir) => EventTransforms.sliding(t(s, dir, "events"))
      .orderBy(col("window_start"), col("event_type")),
    Some(s"""
      SELECT ws AS window_start, event_type,
        count(*) AS n, ${Q.sumDec("value")} AS total_value
      FROM (
        SELECT e.*,
          time_bucket(INTERVAL '30 minutes', e.ts) - ks.k * INTERVAL '30 minutes' AS ws
        FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks) t
      WHERE ts < ws + INTERVAL '1 hour'
      GROUP BY ws, event_type ORDER BY ws, event_type"""))

  /** The stream-stream join transform run in batch mode: each purchase
    * attributed to the same user's clicks within the preceding 30 minutes
    * (see EventStreamSpec for the streaming run with watermark-bounded
    * state).
    */
  val q37ClickAttribution: Q = Q(
    "q37_click_attribution",
    (s, dir) => EventTransforms.clickToPurchase(t(s, dir, "events"))
      .orderBy(col("click_id"), col("purchase_id")),
    Some("""
      SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
             p.event_id AS purchase_id, p.ts AS purchase_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts > c.ts
       AND p.ts <= c.ts + INTERVAL '30 minutes'
      ORDER BY click_id, purchase_id"""))

  /** The stream-stream FULL OUTER join transform run in batch mode: every
    * click (converted or not) AND every orphan purchase emits exactly once
    * with a three-way status. In streaming the outer rows emit only after
    * the opposing watermark proves the non-match (EventStreamSpec pins
    * that late emission); in batch the full outer is immediate — the
    * results agree, which is exactly the Structured Streaming contract
    * this oracle certifies.
    */
  val q37bConversionFull: Q = Q(
    "q37b_conversion_full",
    // NULLS LAST explicitly: the full-outer join makes both sort keys
    // nullable, and Spark's ascending default is nulls FIRST while
    // DuckDB's is nulls LAST — without pinning one, the orphan/no-match
    // rows land at opposite ends and the order-sensitive hash diverges
    (s, dir) => EventTransforms.clickConversionFull(t(s, dir, "events"))
      .orderBy(col("click_id").asc_nulls_last, col("purchase_id").asc_nulls_last),
    Some("""
      SELECT coalesce(c.user_id, p.user_id) AS user_id,
             c.event_id AS click_id, c.ts AS click_ts,
             p.event_id AS purchase_id, p.ts AS purchase_ts,
             CASE WHEN c.event_id IS NULL THEN 'orphan_purchase'
                  WHEN p.event_id IS NULL THEN 'no_conversion'
                  ELSE 'converted' END AS status
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts > c.ts
       AND p.ts <= c.ts + INTERVAL '30 minutes'
      ORDER BY click_id, purchase_id"""))

  /** Session windows (30-minute gap) per user. The oracle derives sessions
    * with the classic gaps-and-islands window idiom; a new session starts
    * when the gap is >= the threshold (session_window's end is exclusive).
    */
  val q25Sessions: Q = Q(
    "q25_session_window",
    (s, dir) => EventTransforms.sessions(t(s, dir, "events"))
      .orderBy(col("user_id"), col("session_start")),
    Some(s"""
      WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id, ts, value,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT min(ts) AS session_start,
        max(ts) + INTERVAL '30 minutes' AS session_end,
        user_id, count(*) AS n_events, ${Q.sumDec("value")} AS total_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** The CUSTOM-STATE sessionizer (`streaming/StatefulSessions.scala`,
    * flatMapGroupsWithState) run in batch mode against the same
    * gaps-and-islands oracle as q25 — an end-to-end correctness gate for
    * the arbitrary-state code path, not just the declarative
    * `session_window`. Counts only: the accumulator sums `value` in
    * event-time order (a Double fold), which is not order-independent
    * across engines, so the money column stays out of the compared output.
    */
  val q36StatefulSessions: Q = Q(
    "q36_stateful_sessions",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value").cast("double").as("value"))
        .as[graft.streaming.Event]
      graft.streaming.StatefulSessions.sessionize(ev, gapMs = 30 * 60 * 1000)
        .toDF()
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id, ts,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL '30 minutes' AS session_end,
        count(*) AS n_events
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))
}
