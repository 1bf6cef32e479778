package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-mode coverage for the event transforms: windows emit on
  * watermark advance, late events are dropped, duplicate ids are dropped
  * within the watermark, and the custom stateful sessionizer closes
  * sessions via event-time timeout.
  */
class EventStreamSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String, user: Long = 1L,
      typ: String = "click", value: Double = 1.0): Event =
    Event(id, ts(t), user, typ, value)

  private def drain(q: StreamingQuery): Unit = q.processAllAvailable()

  test("tumbling windows emit on watermark advance and drop late events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.tumbling(ms.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "10:05"), ev(2, "10:50", value = 2.0))
      drain(q)
      // watermark still at 10:20 — the 10:00 window is open, nothing emitted
      assert(spark.table("tumbling_out").count() === 0)

      ms.addData(ev(3, "12:00"))
      drain(q)
      // watermark 11:30 closes [10:00,11:00)
      val closed = spark.table("tumbling_out")
        .where("window_start = timestamp'2024-01-01 10:00:00'").collect()
      assert(closed.length === 1)
      assert(closed.head.getAs[Long]("n") === 2)
      assert(closed.head.getAs[Double]("total_value") === 3.0)

      // a late event for the closed window must be dropped
      ms.addData(ev(4, "10:10", value = 99.0))
      ms.addData(ev(5, "14:00"))
      drain(q)
      val after = spark.table("tumbling_out")
        .where("window_start = timestamp'2024-01-01 10:00:00'").collect()
      assert(after.length === 1 && after.head.getAs[Double]("total_value") === 3.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops cross-batch duplicate ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.dedupWithinWatermark(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "10:00"))
      drain(q)
      ms.addData(ev(1, "10:05", value = 42.0)) // same id, later batch
      ms.addData(ev(2, "10:06"))
      drain(q)
      val rows = spark.table("dedup_out").collect()
      assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(1L, 2L))
      // the first occurrence won
      assert(rows.find(_.getAs[Long]("event_id") == 1L).get.getAs[Double]("value") === 1.0)
    } finally q.stop()
  }

  test("stateful sessionizer emits only once the watermark seals a session") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      ms.toDS(), gapMs = 30 * 60 * 1000, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then 11:30 (gap 80min)
      ms.addData(ev(1, "10:00"), ev(2, "10:10"), ev(3, "11:30"))
      drain(q)
      // NOTHING emits yet: the watermark (11:30 − 1h = 10:30) has not
      // passed the first session's close (10:40), so even the gapped-out
      // first session must wait — a late event could still merge into it
      assert(spark.table("sessions_out").count() === 0)

      // watermark 11:50 − 1h = 10:50 > 10:40 → timeout seals session 1 only
      ms.addData(ev(9, "11:50", user = 2))
      drain(q)
      val s1 = spark.table("sessions_out").where("user_id = 1").collect()
      assert(s1.length === 1)
      assert(s1.head.getAs[Long]("n_events") === 2)
      assert(s1.head.getAs[Timestamp]("session_start") === ts("10:00"))
      assert(s1.head.getAs[Timestamp]("session_end") === ts("10:40"))

      // watermark 13:30 − 1h = 12:30 > 12:00 → timeout seals session 2
      ms.addData(ev(10, "13:30", user = 2))
      drain(q)
      val all = spark.table("sessions_out")
        .where("user_id = 1").orderBy("session_start").collect()
      assert(all.length === 2)
      assert(all(1).getAs[Long]("n_events") === 1)
      assert(all(1).getAs[Timestamp]("session_start") === ts("11:30"))
      assert(all(1).getAs[Timestamp]("session_end") === ts("12:00"))
    } finally q.stop()
  }

  test("sessionizer merges late in-watermark events instead of splitting") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val sessions = StatefulSessions.sessionize(
      ms.toDS(), gapMs = 30 * 60 * 1000, watermark = "2 hours")
    val q = sessions.writeStream.format("memory").queryName("merge_out")
      .outputMode("append").start()
    try {
      // 10:00 and 10:50 are 50 min apart: two provisional sessions
      ms.addData(ev(1, "10:00"), ev(2, "10:50"))
      drain(q)
      assert(spark.table("merge_out").count() === 0)

      // both arrive late but inside the 2h watermark: 10:25 BRIDGES the two
      // provisional sessions; 09:45 pulls session_start back before 10:00
      ms.addData(ev(3, "10:25"), ev(4, "09:45"))
      drain(q)

      // advance the watermark past 11:20 to seal the merged session
      ms.addData(ev(5, "14:00", user = 2))
      drain(q)
      ms.addData(ev(6, "16:30", user = 2))
      drain(q)
      val rows = spark.table("merge_out").where("user_id = 1").collect()
      assert(rows.length === 1, "late bridging event must merge, not split")
      assert(rows.head.getAs[Long]("n_events") === 4)
      assert(rows.head.getAs[Timestamp]("session_start") === ts("09:45"))
      assert(rows.head.getAs[Timestamp]("session_end") === ts("11:20"))
    } finally q.stop()
  }

  test("sessionizer streaming matches batch on real driver events, up to the final watermark") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val gapMs = 30 * 60 * 1000L
    val typed = graft.ops.Q.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[Event]
    val events = typed.collect().toSeq
    val batch = StatefulSessions.sessionize(typed, gapMs).collect()

    val ms = MemoryStream[Event]
    val q = StatefulSessions.sessionize(ms.toDS(), gapMs, watermark = "0 seconds")
      .writeStream.format("memory").queryName("parity_sessions")
      .outputMode("append").start()
    try {
      ms.addData(events: _*)
      drain(q)
      val streamed = spark.table("parity_sessions").as[UserSession].collect()
      // the stream can only have sealed sessions whose close is at or below
      // the final watermark (= max event time in ms, delay 0); batch seals
      // everything — restrict batch to the same horizon and compare exactly
      val wmUs = events.map(e => StatefulSessions.tsToUs(e.ts)).max / 1000L * 1000L
      val sealedUpToWm = batch.filter(s => StatefulSessions.tsToUs(s.session_end) <= wmUs)
      assert(streamed.nonEmpty && streamed.length < batch.length)
      assert(streamed.map(s => (s.user_id, s.session_start, s.session_end,
        s.n_events, s.total_value)).toSet ===
        sealedUpToWm.map(s => (s.user_id, s.session_start, s.session_end,
          s.n_events, s.total_value)).toSet)
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to in-window clicks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.clickToPurchase(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      ms.addData(
        ev(1, "10:00", user = 1, typ = "click"),
        ev(2, "10:10", user = 1, typ = "purchase"), // within 30m of click 1
        ev(3, "09:00", user = 2, typ = "click"),
        ev(4, "10:10", user = 2, typ = "purchase"), // 70m later: out of window
        ev(5, "10:05", user = 3, typ = "purchase")) // no click at all
      drain(q)
      val rows = spark.table("attrib_out")
        .select("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 1L, 2L)))
    } finally q.stop()
  }

  test("left-outer stream join: conversions emit matched, non-conversions " +
      "emit with nulls only after the watermark proves them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.clickConversionOuter(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("conv_out")
      .outputMode("append").start()
    try {
      ms.addData(
        ev(1, "10:00", user = 1, typ = "click"),
        ev(2, "10:10", user = 1, typ = "purchase"), // converts click 1
        ev(3, "10:00", user = 2, typ = "click"))    // never converts
      drain(q)
      // the matched row may emit now; the outer row for click 3 MUST NOT
      // exist yet — only watermark progress can prove a non-conversion
      val early = spark.table("conv_out")
        .filter($"click_id" === 3L).count()
      assert(early === 0L)
      // push both watermarks far past 10:30 so click 3's window is closed
      ms.addData(
        ev(10, "13:00", user = 9, typ = "click"),
        ev(11, "13:00", user = 9, typ = "purchase"))
      drain(q)
      ms.addData(
        ev(12, "14:00", user = 9, typ = "click"),
        ev(13, "14:00", user = 9, typ = "purchase"))
      drain(q)
      val rows = spark.table("conv_out")
        .select($"click_id", $"purchase_id", $"converted")
        .collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2)))
        .toMap
      assert(rows(1L) === ((2L, true)))   // converted, with its purchase
      assert(rows(3L) === ((-1L, false))) // proven non-conversion, nulls
    } finally q.stop()
  }

  test("full-outer stream join: orphan purchases and non-conversions both " +
      "emit, each only after the watermark proves them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.clickConversionFull(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("convfull_out")
      .outputMode("append").start()
    try {
      ms.addData(
        ev(1, "10:00", user = 1, typ = "click"),
        ev(2, "10:10", user = 1, typ = "purchase"), // converts click 1
        ev(3, "10:00", user = 2, typ = "click"),    // never converts
        ev(4, "10:05", user = 5, typ = "purchase")) // orphan: no click
      drain(q)
      // only the watermark can prove either outer side — neither click 3's
      // null-purchase row nor purchase 4's null-click row may exist yet
      val early = spark.table("convfull_out")
        .filter($"click_id" === 3L || $"purchase_id" === 4L).count()
      assert(early === 0L)
      // push both watermarks far past 10:35 so both outer windows close
      ms.addData(
        ev(10, "13:00", user = 9, typ = "click"),
        ev(11, "13:00", user = 9, typ = "purchase"))
      drain(q)
      ms.addData(
        ev(12, "14:00", user = 9, typ = "click"),
        ev(13, "14:00", user = 9, typ = "purchase"))
      drain(q)
      val rows = spark.table("convfull_out")
        .select($"click_id", $"purchase_id", $"status")
        .collect()
        .map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)),
          (if (r.isNullAt(1)) -1L else r.getLong(1))) -> r.getString(2))
        .toMap
      assert(rows((1L, 2L)) === "converted")
      assert(rows((3L, -1L)) === "no_conversion")   // click-side outer row
      assert(rows((-1L, 4L)) === "orphan_purchase") // purchase-side outer row
    } finally q.stop()
  }

  test("batch and streaming tumbling agree on the same data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = Seq(ev(1, "10:05"), ev(2, "10:50", value = 2.0), ev(3, "12:00"))
    val batch = EventTransforms.tumbling(events.toDF(), "1 hour", "30 minutes")
      .orderBy("window_start")
    val ms = MemoryStream[Event]
    val q = EventTransforms.tumbling(ms.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("parity_out")
      .outputMode("complete").start()
    try {
      ms.addData(events: _*)
      drain(q)
      val streamRows = spark.table("parity_out").orderBy("window_start").collect()
      assert(streamRows.toSeq === batch.collect().toSeq)
    } finally q.stop()
  }

  test("stream-static enrich joins every batch against the dim, left-open") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq(("click", 2.0), ("view", 0.5)).toDF("event_type", "weight")
    val ms = MemoryStream[Event]
    val q = EventTransforms.enrichWithDim(ms.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "10:05", typ = "click"),
        ev(2, "10:06", typ = "purchase")) // no dim row — must survive as null
      drain(q)
      val rows = spark.table("enrich_out").orderBy("event_id").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Double]("weight") === 2.0)
      assert(rows(1).isNullAt(rows(1).fieldIndex("weight")))
    } finally q.stop()
  }

  test("late-data drops are OBSERVABLE via progress metrics, not silent") {
    // the ops contract behind watermarking: a pipeline must be able to
    // ALERT on dropped-late volume — StreamingQueryProgress exposes it as
    // stateOperators.numRowsDroppedByWatermark
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTransforms.tumbling(ms.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("late_obs_out")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "10:05"))
      drain(q)
      ms.addData(ev(2, "14:00")) // watermark leaps to 13:30
      drain(q)
      ms.addData(ev(3, "10:10"), ev(4, "09:00")) // both far below watermark
      drain(q)
      ms.addData(ev(5, "14:30"))
      drain(q)
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 2L,
        s"expected the two late events in the drop counter, saw $dropped")
    } finally q.stop()
  }
}
