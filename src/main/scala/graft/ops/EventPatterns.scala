package graft.ops

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Sequence-pattern detection over event streams — the MATCH_RECOGNIZE
  * capability (SQL:2016 row-pattern matching, present in Flink/Oracle/
  * Snowflake, absent from Spark) re-expressed relationally: each user's
  * event history is collapsed into an ordered single-character journey
  * string and the row patterns become regular expressions over it, which
  * is exactly the automaton MATCH_RECOGNIZE compiles to.
  */
object EventPatterns {

  def pack: Seq[Q] = Seq(q107EventPattern)

  /** q107: EVENT-SEQUENCE PATTERNS per user — conversions (a view leading
    * through any clicks to a purchase, `VC*P`), error bursts (`EE+`), the
    * longest uninterrupted click run, and a signup-before-purchase flag.
    * Non-overlapping leftmost-greedy match counts — the same semantics in
    * Java regex and DuckDB's RE2 for these backtrack-free patterns, so
    * every count is hash-exact.
    *
    * Determinism: the journey is built by sorting each user's (ts,
    * event_id, char) triples — (user, ts) is unique in the corpus and
    * event_id breaks any future tie — so both engines assemble the
    * identical string.
    *
    * Scale shape: one user-keyed aggregate; per-user state is the user's
    * own history (bounded by per-entity activity — at warehouse scale the
    * same pattern runs per SESSION via the q77 sessionizer, which bounds
    * the string by the session window). No window over the fact table, no
    * cross-user state.
    */
  val q107EventPattern: Q = Q(
    "q107_event_pattern",
    (s: SparkSession, dir: String) => {
      val ch = when(col("event_type") === "signup", "S")
        .when(col("event_type") === "view", "V")
        .when(col("event_type") === "click", "C")
        .when(col("event_type") === "purchase", "P")
        .otherwise("E")
      val journeys = Q.spread(t(s, dir, "events"), "user_id")
        .select(col("user_id"), col("ts"), col("event_id"), ch.as("ch"))
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("ch")))).as("arr"))
        .select(col("user_id"),
          array_join(transform(col("arr"), x => x.getField("ch")), "")
            .as("journey"))
      journeys.select(
          col("user_id"),
          length(col("journey")).as("journey_len"),
          size(regexp_extract_all(col("journey"), lit("VC*P"), lit(0)))
            .as("n_conversions"),
          size(regexp_extract_all(col("journey"), lit("EE+"), lit(0)))
            .as("n_error_bursts"),
          coalesce(array_max(transform(
            regexp_extract_all(col("journey"), lit("C+"), lit(0)),
            x => length(x))), lit(0)).as("max_click_run"),
          col("journey").rlike("S.*P").as("signup_then_purchase"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, event_id,
          CASE event_type WHEN 'signup' THEN 'S' WHEN 'view' THEN 'V'
            WHEN 'click' THEN 'C' WHEN 'purchase' THEN 'P'
            ELSE 'E' END AS ch
        FROM events),
      j AS (
        SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id) AS journey
        FROM ev GROUP BY user_id)
      SELECT user_id,
        CAST(len(journey) AS INT) AS journey_len,
        CAST(len(regexp_extract_all(journey, 'VC*P')) AS INT) AS n_conversions,
        CAST(len(regexp_extract_all(journey, 'EE+')) AS INT) AS n_error_bursts,
        CAST(coalesce(list_max(list_transform(
          regexp_extract_all(journey, 'C+'), x -> len(x))), 0) AS INT)
          AS max_click_run,
        regexp_matches(journey, 'S.*P') AS signup_then_purchase
      FROM j ORDER BY user_id"""))
}
