package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Q.dec2

/** Event-time window transforms, written once and applied to BOTH batch and
  * streaming frames (the Structured Streaming contract: a streaming query is
  * the same declarative plan as its batch equivalent). In batch mode
  * `withWatermark` is a no-op; in streaming it bounds state.
  *
  * Scale posture: all of these shuffle once on (window, key) with partial
  * aggregation map-side; state per group is O(1). Watermarks bound streaming
  * state so a 100 TB/day stream holds only the open windows.
  */
object EventTransforms {

  /** Tumbling event-time windows per event_type. */
  def tumbling(events: DataFrame, size: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding windows: each event lands in size/slide windows. */
  def sliding(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Session windows per user: a session extends while consecutive events
    * are less than `gap` apart; the window closes gap after the last event.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Watermarked stream-stream join: attribute each purchase to the same
    * user's clicks in the preceding `within` window. Both sides carry
    * watermarks and the join condition bounds event-time distance, so each
    * side's state is evicted once the other side's watermark passes — the
    * only join shape that holds state O(window), not O(stream). Works
    * identically in batch (cf. the q18 range join).
    */
  def clickToPurchase(events: DataFrame, within: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", within)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER join — the conversion-tracking
    * shape: every click emits, WITH its purchase when one lands in the
    * attribution window, with NULLs once the purchase-side watermark has
    * passed the window's end and no purchase can still arrive. The outer
    * row is therefore emitted LATE by construction (only watermark
    * progress can prove a non-conversion), which is the semantic a
    * conversion funnel needs and an inner join silently drops. Same
    * bounded O(window) state as the inner form: the time-bound condition
    * plus both watermarks let each side evict.
    */
  def clickConversionOuter(events: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", within)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $within"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"),
        col("purchase_id").isNotNull.as("converted"))
  }

  /** Watermarked stream-stream FULL OUTER join — completes the join
    * family (inner q37, left-outer above): clicks that never convert AND
    * purchases with no attributable click BOTH emit, each only once the
    * opposing side's watermark proves no match can still arrive. The
    * orphan-purchase rows are what a left join cannot see — purchases
    * arriving with no click are the broken-tracking / ad-fraud signal a
    * funnel audit starts from. `status` labels the three outcomes so one
    * sink serves conversion AND anomaly consumers. State stays O(window)
    * for the same reason as the inner form: the time-bound condition plus
    * both watermarks let each side evict matched-or-expired rows.
    */
  def clickConversionFull(events: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", within)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $within"),
      "full_outer")
      .select(
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"),
        when(col("click_id").isNull, lit("orphan_purchase"))
          .when(col("purchase_id").isNull, lit("no_conversion"))
          .otherwise(lit("converted")).as("status"))
  }

  /** Exactly-once-per-id dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped; state older than the
    * watermark is evicted. (The reference dedups only within one file —
    * this is the cross-batch superset, SURVEY.md §7.4.)
    */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join each micro-batch against a STATIC
    * dimension (no watermark, no state — the static side is just re-read
    * per batch, so a dim table updated in place is picked up on the next
    * trigger). Broadcast because event-type dims are small by nature;
    * a big static side would flip to a shuffled stream-static join with
    * the same semantics. Left join: stream rows NEVER block on missing
    * dim rows (an inner stream-static join silently drops them — the
    * classic enrichment footgun).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"), "left")
}
