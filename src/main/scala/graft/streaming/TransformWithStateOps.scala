package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Running per-user aggregate state. */
case class RunningAgg(n_events: Long, total_value: Double)

/** One updated leaderboard row per user per micro-batch. */
case class UserRunning(
    user_id: Long,
    n_events: Long,
    total_value: Double,
    recent_avg: Double)

/** Per-user running stats via Spark 4's `transformWithState` — the
  * arbitrary-state successor to `flatMapGroupsWithState` (which
  * [[StatefulSessions]] demonstrates): instead of ONE opaque state blob
  * per key, the processor declares NAMED, independently-stored state
  * variables through the handle. Here a ValueState running aggregate and
  * a ListState rolling tail coexist — under the old API both would be
  * crammed into one case class rewritten wholesale every batch; RocksDB
  * stores them as separate column families, so the list append does not
  * rewrite the aggregate.
  *
  * State size: the aggregate is O(1) per user and the tail is capped at
  * [[TransformWithStateOps.RecentN]] — per-key state is CONSTANT, so the
  * store scales with distinct users only. Production streams with churning
  * key spaces would add a TTLConfig (API surfaced below) to expire idle
  * users; tests keep TTL off for determinism (TTL is processing-time).
  */
class RunningStatsProcessor extends StatefulProcessor[Long, Event, UserRunning] {

  @transient private var agg: ValueState[RunningAgg] = _
  @transient private var recent: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState[RunningAgg](
      "agg", Encoders.product[RunningAgg], TTLConfig.NONE)
    recent = getHandle.getListState[Double](
      "recent", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[UserRunning] = {
    // batch iterator order is not contractual — impose event-time order so
    // the rolling tail is deterministic
    val evs = rows.toSeq.sortBy(e => (StatefulSessions.tsToUs(e.ts), e.event_id))
    if (evs.isEmpty) Iterator.empty
    else {
      val prev = if (agg.exists()) agg.get() else RunningAgg(0L, 0.0)
      val next = evs.foldLeft(prev)((a, e) =>
        RunningAgg(a.n_events + 1, a.total_value + e.value))
      agg.update(next)
      evs.foreach(e => recent.appendValue(e.value))
      val tail = recent.get().toSeq.takeRight(TransformWithStateOps.RecentN)
      recent.put(tail.toArray)
      Iterator.single(UserRunning(
        key, next.n_events, next.total_value, tail.sum / tail.length))
    }
  }
}

/** Running moment state for the anomaly gate. */
case class Moments(n: Long, sum: Double, sumsq: Double)

/** One anomaly alert: a value that deviated from the key's RUNNING mean by
  * more than [[TransformWithStateOps.Sigmas]] standard deviations, with the
  * pre-observation baseline attached for triage.
  */
case class AnomalyAlert(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, value: Double, n_baseline: Long,
    mean_before: Double, std_before: Double)

/** Streaming ANOMALY GATE on running per-key moments — the online z-score
  * monitor every metrics pipeline runs against its event stream. State is
  * three numbers per key (n, Σx, Σx²); each event is tested against the
  * moments of the events BEFORE it (so a spike cannot mask itself by
  * inflating the variance it is tested against) and then folded in.
  * Warm-up: no alerts until [[TransformWithStateOps.MinBaseline]]
  * observations — a z-score against 2 points is noise. In-batch events
  * fold in event-time order, so batch boundaries never change verdicts:
  * the same stream chunked differently alerts identically (spec-pinned).
  * O(1) state per key, no timers — the cheapest possible tWS processor,
  * and the one most deployments reach for first.
  */
class AnomalyProcessor extends StatefulProcessor[Long, Event, AnomalyAlert] {

  @transient private var mom: ValueState[Moments] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    mom = getHandle.getValueState[Moments](
      "mom", Encoders.product[Moments], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[AnomalyAlert] = {
    val evs = rows.toSeq.sortBy(e => (StatefulSessions.tsToUs(e.ts), e.event_id))
    var m = if (mom.exists()) mom.get() else Moments(0L, 0.0, 0.0)
    val alerts = Seq.newBuilder[AnomalyAlert]
    evs.foreach { e =>
      if (m.n >= TransformWithStateOps.MinBaseline) {
        val mean = m.sum / m.n
        val variance = math.max(0.0, m.sumsq / m.n - mean * mean)
        val std = math.sqrt(variance)
        if (math.abs(e.value - mean) > TransformWithStateOps.Sigmas * std)
          alerts += AnomalyAlert(key, e.event_id, e.ts, e.value, m.n, mean, std)
      }
      m = Moments(m.n + 1, m.sum + e.value, m.sumsq + e.value * e.value)
    }
    mom.update(m)
    alerts.result().iterator
  }
}

/** Last-seen state for the inactivity detector. */
case class LastSeen(lastUs: Long, n_events: Long)

/** One "user went quiet" alert: emitted when the event-time watermark
  * passes `last_seen + gap` with no further activity.
  */
case class InactivityAlert(user_id: Long, last_seen: java.sql.Timestamp,
    n_events: Long)

/** Event-time TIMERS through the transformWithState handle — the API
  * surface the old flatMapGroupsWithState timeout couldn't express: a key
  * may hold MANY independent timers, registered/deleted individually.
  * Each input re-arms the key's single inactivity timer (delete + register
  * — timers are identified by their expiry timestamp, so re-arming must
  * delete the stale one); when the watermark passes it, handleExpiredTimer
  * emits the alert and clears state, so an idle key costs nothing after
  * its alert fires. State is O(1) per live key and timers are
  * watermark-driven — both bounded, both 100 TB/day-safe.
  */
class InactivityProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, InactivityAlert] {

  @transient private var last: ValueState[LastSeen] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[LastSeen](
      "last", Encoders.product[LastSeen], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[InactivityAlert] = {
    val prev = if (last.exists()) Some(last.get()) else None
    val seen = rows.map(e => StatefulSessions.tsToUs(e.ts)).toSeq
    if (seen.isEmpty) Iterator.empty
    else {
      val lastUs = math.max(prev.map(_.lastUs).getOrElse(Long.MinValue), seen.max)
      last.update(LastSeen(lastUs, prev.map(_.n_events).getOrElse(0L) + seen.size))
      // re-arm: timers are keyed by expiry ms, so drop the stale one
      // first — MATERIALIZED before deleting, never mutating the store
      // under the live listTimers() iterator
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      // ceil to ms so the timer can never fire before the µs deadline
      getHandle.registerTimer(Math.floorDiv(lastUs + gapMs * 1000L + 999L, 1000L))
      Iterator.empty
    }
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[InactivityAlert] = {
    val s = last.get()
    last.clear()
    Iterator.single(InactivityAlert(
      key, StatefulSessions.usToTs(s.lastUs), s.n_events))
  }
}

object TransformWithStateOps {

  /** Rolling-tail length for `recent_avg`. */
  val RecentN = 3

  /** Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `...state.RocksDBStateStoreProvider`) — transformWithState does not
    * run on the default HDFS-backed store.
    */
  def runningStats(events: Dataset[Event]): Dataset[UserRunning] = {
    implicit val outEnc = Encoders.product[UserRunning]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new RunningStatsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Observations a key needs before the anomaly gate opens. */
  val MinBaseline = 5L
  /** Alert threshold in standard deviations of the running baseline. */
  val Sigmas = 3.0

  /** Streaming anomaly alerts (see [[AnomalyProcessor]]); same RocksDB-
    * provider requirement as [[runningStats]].
    */
  def anomalyAlerts(events: Dataset[Event]): Dataset[AnomalyAlert] = {
    implicit val outEnc = Encoders.product[AnomalyAlert]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new AnomalyProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Inactivity alerts via event-time timers (see [[InactivityProcessor]]);
    * same RocksDB-provider requirement as [[runningStats]].
    */
  def inactivityAlerts(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[InactivityAlert] = {
    implicit val outEnc = Encoders.product[InactivityAlert]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermark).as(events.encoder)
      .groupByKey(_.user_id)
      .transformWithState(
        new InactivityProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
