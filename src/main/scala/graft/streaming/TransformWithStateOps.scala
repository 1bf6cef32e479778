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
