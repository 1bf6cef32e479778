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
}
