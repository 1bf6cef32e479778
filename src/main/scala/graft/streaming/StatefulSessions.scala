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

/** One not-yet-final session fragment (times in MICROseconds — Spark
  * timestamps are µs-resolution and the driver data has sub-ms components,
  * so ms-granularity state would corrupt session bounds).
  */
case class SessionAcc(startUs: Long, lastUs: Long, nEvents: Long, total: Double)

/** GroupState payload: every session of the user that the watermark has not
  * yet sealed, disjoint and kept sorted by start.
  */
case class SessionBuf(sessions: Seq[SessionAcc])

/** A closed user session (end = last event + gap, mirroring session_window). */
case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Custom session logic via `flatMapGroupsWithState` — the "hard streaming
  * item" from SURVEY.md §7.4. Unlike the declarative `session_window`, this
  * keeps arbitrary per-user state and evicts it deterministically — the
  * pattern to extend when session logic outgrows SQL (e.g. value caps,
  * max-duration splits).
  *
  * Correctness under late/out-of-order data (`session_window` parity): a
  * session is only EMITTED once the event-time watermark has passed its
  * close (lastMs + gap) — never inline the moment a later in-batch event
  * opens a gap. Until then every still-mergeable session stays buffered in
  * state, so a late event landing in a gap MERGES its neighbours (both
  * sides: `session_start` is pulled back with min, the end pushed with max)
  * instead of producing a spurious split. Events strictly below the
  * watermark are dropped (at-watermark events are kept), exactly as the
  * built-in stateful operators do.
  *
  * State size: the watermark seals sessions as it advances, so state holds
  * only sessions within one watermark-delay of the stream head per user —
  * bounded by watermark, not by history, so it holds at 100 TB/day.
  */
// Serializable: the update closure calls tsToUs/usToTs on this object, so
// the object itself ships inside the task closure (it is stateless).
object StatefulSessions extends Serializable {

  /** java.sql.Timestamp → epoch micros (getTime already includes whole ms;
    * only the sub-ms tail of nanos is added back).
    */
  private[streaming] def tsToUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  private[streaming] def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "30 minutes"): Dataset[UserSession] = {
    implicit val bufEnc = Encoders.product[SessionBuf]
    implicit val outEnc = Encoders.product[UserSession]
    implicit val longEnc = Encoders.scalaLong

    val gapUs = gapMs * 1000L

    // In batch there is no watermark and timeouts never fire: every session
    // is final after the single pass, so treat the watermark as +inf and
    // emit everything inline (= session_window batch semantics).
    val streaming = events.isStreaming

    def toSession(userId: Long, a: SessionAcc): UserSession =
      UserSession(userId, usToTs(a.startUs), usToTs(a.lastUs + gapUs),
        a.nEvents, a.total)

    // GroupState timeouts are ms-granular; ceil so a timeout never fires
    // before its session's µs close has actually passed the watermark
    def timeoutMsFor(live: Seq[SessionAcc]): Long =
      Math.floorDiv(live.map(_.lastUs + gapUs).min + 999L, 1000L)

    def update(userId: Long, it: Iterator[Event],
        state: GroupState[SessionBuf]): Iterator[UserSession] = {
      val wmUs =
        if (!streaming) Long.MaxValue
        else state.getCurrentWatermarkMs() * 1000L
      if (state.hasTimedOut) {
        // watermark passed at least one session's close: seal exactly those
        val (ripe, live) = state.get.sessions.partition(_.lastUs + gapUs <= wmUs)
        if (live.isEmpty) state.remove()
        else {
          state.update(SessionBuf(live))
          state.setTimeoutTimestamp(timeoutMsFor(live))
        }
        ripe.sortBy(_.startUs).map(toSession(userId, _)).iterator
      } else {
        var ss = state.getOption.map(_.sessions.toList).getOrElse(Nil)
        val fresh = it.filter(e => !streaming || tsToUs(e.ts) >= wmUs).toSeq
        for (e <- fresh.sortBy(e => tsToUs(e.ts))) {
          val us = tsToUs(e.ts)
          // the event's own window [us, us+gap) may bridge SEVERAL buffered
          // sessions — merge every overlapping one (end-exclusive, matching
          // session_window), min-ing the start and max-ing the end
          val (near, far) = ss.partition(a =>
            us < a.lastUs + gapUs && a.startUs < us + gapUs)
          val merged = near.foldLeft(SessionAcc(us, us, 1L, e.value)) { (m, a) =>
            SessionAcc(math.min(m.startUs, a.startUs), math.max(m.lastUs, a.lastUs),
              m.nEvents + a.nEvents, m.total + a.total)
          }
          ss = merged :: far
        }
        // a session already behind the watermark can receive no further
        // merge (those events would be late-dropped) — emit it now; its
        // timeout could not be registered anyway (must be > watermark)
        val (ripe, live) = ss.partition(_.lastUs + gapUs <= wmUs)
        if (live.nonEmpty) {
          state.update(SessionBuf(live.sortBy(_.startUs)))
          state.setTimeoutTimestamp(timeoutMsFor(live))
        } else if (state.exists) state.remove()
        ripe.sortBy(_.startUs).map(toSession(userId, _)).iterator
      }
    }

    val withWm =
      if (streaming) events.withWatermark("ts", watermark).as(events.encoder)
      else events
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
