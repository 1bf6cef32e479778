package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (typed view of the `events` table minus props). */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Mutable-between-batches session accumulator kept in GroupState. */
case class SessionAcc(startMs: Long, lastMs: Long, nEvents: Long, total: Double)

/** A closed user session (end = last event + gap, mirroring session_window). */
case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Custom session logic via `flatMapGroupsWithState` — the "hard streaming
  * item" from SURVEY.md §7.4. Unlike the declarative `session_window`, this
  * keeps arbitrary per-user state, emits a session the moment the event-time
  * watermark passes its gap (EventTimeTimeout), and evicts state
  * deterministically — the pattern to extend when session logic outgrows
  * SQL (e.g. value caps, max-duration splits).
  *
  * State size: one `SessionAcc` per active user — bounded by watermark, not
  * by history, so it holds at 100 TB/day.
  */
object StatefulSessions {

  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "30 minutes"): Dataset[UserSession] = {
    implicit val accEnc = Encoders.product[SessionAcc]
    implicit val outEnc = Encoders.product[UserSession]
    implicit val longEnc = Encoders.scalaLong

    def toSession(userId: Long, a: SessionAcc): UserSession =
      UserSession(userId, new Timestamp(a.startMs),
        new Timestamp(a.lastMs + gapMs), a.nEvents, a.total)

    def update(userId: Long, it: Iterator[Event],
        state: GroupState[SessionAcc]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val closed = toSession(userId, state.get)
        state.remove()
        Iterator.single(closed)
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
        var acc = state.getOption
        for (e <- sorted) {
          val ms = e.ts.getTime
          acc = acc match {
            case Some(a) if ms - a.lastMs < gapMs =>
              Some(a.copy(lastMs = math.max(a.lastMs, ms),
                nEvents = a.nEvents + 1, total = a.total + e.value))
            case Some(a) => // gap >= gapMs: close and restart
              out += toSession(userId, a)
              Some(SessionAcc(ms, ms, 1L, e.value))
            case None =>
              Some(SessionAcc(ms, ms, 1L, e.value))
          }
        }
        acc.foreach { a =>
          state.update(a)
          state.setTimeoutTimestamp(a.lastMs + gapMs)
        }
        out.iterator
      }
    }

    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark).as(events.encoder)
      else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
