package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState running stats: state carries across micro-batches,
  * multiple in-batch rows fold in event-time order, and the ListState
  * rolling tail stays capped at RecentN.
  */
class TransformWithStateSpec extends SparkSpec {

  private def ev(id: Long, mm: Int, user: Long, value: Double): Event =
    Event(id, Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 10, 0).plusMinutes(mm)),
      user, "click", value)

  test("running stats accumulate across batches with a capped rolling tail") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = TransformWithStateOps.runningStats(ms.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        ms.addData(ev(1, 1, 1L, 1.0), ev(2, 2, 1L, 2.0), ev(3, 1, 2L, 10.0))
        q.processAllAvailable()
        val b1 = spark.table("tws_out").collect()
          .map(r => r.getAs[Long]("user_id") ->
            (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
              r.getAs[Double]("recent_avg"))).toMap
        assert(b1(1L) === ((2L, 3.0, 1.5)))
        assert(b1(2L) === ((1L, 10.0, 10.0)))

        // batch 2: user 1 gains one event (tail 1,2,3); user 2 gains three
        // (tail caps to the LAST three: 20,30,40)
        ms.addData(ev(4, 3, 1L, 3.0),
          ev(5, 4, 2L, 20.0), ev(6, 5, 2L, 30.0), ev(7, 6, 2L, 40.0))
        q.processAllAvailable()
        val b2 = spark.table("tws_out").collect()
          .groupBy(_.getAs[Long]("user_id"))
          .map { case (u, rows) =>
            u -> rows.maxBy(_.getAs[Long]("n_events")) }
          .map { case (u, r) =>
            u -> ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
              r.getAs[Double]("recent_avg"))) }
        assert(b2(1L) === ((3L, 6.0, 2.0)))
        assert(b2(2L) === ((4L, 100.0, 30.0)))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("inactivity timer fires once the watermark passes last_seen + gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      // gap 30 min, watermark delay 10 min
      val q = TransformWithStateOps.inactivityAlerts(ms.toDS(), 30 * 60 * 1000L)
        .writeStream.format("memory").queryName("tws_alerts")
        .outputMode("append").start()
      try {
        ms.addData(ev(1, 0, 1L, 1.0), ev(2, 5, 1L, 1.0))
        q.processAllAvailable()
        // watermark is 09:55 — no alert yet
        assert(spark.table("tws_alerts").count() === 0)

        // user 2 keeps the stream moving; wm = 10:50 < 10:05+30min
        ms.addData(ev(3, 30, 2L, 1.0))
        q.processAllAvailable()
        assert(spark.table("tws_alerts").count() === 0)

        // event at 11:30 → wm 11:20 ≥ 10:35 → user 1's timer fires (user
        // 2's deadline 12:00 is still ahead)
        ms.addData(ev(4, 90, 2L, 1.0))
        q.processAllAvailable()
        val alerts = spark.table("tws_alerts").collect()
        assert(alerts.length === 1)
        assert(alerts.head.getAs[Long]("user_id") === 1L)
        assert(alerts.head.getAs[Timestamp]("last_seen") ===
          Timestamp.valueOf("2024-01-01 10:05:00"))
        assert(alerts.head.getAs[Long]("n_events") === 2L)

        // a re-appearing user re-arms cleanly after its alert
        ms.addData(ev(5, 95, 1L, 1.0))
        q.processAllAvailable()
        assert(spark.table("tws_alerts").count() === 1)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("anomaly gate: warm-up holds, a spike alerts once, batching is neutral") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = TransformWithStateOps.anomalyAlerts(ms.toDS())
        .writeStream.format("memory").queryName("tws_anom")
        .outputMode("append").start()
      try {
        // 5 alternating baseline points (mean 10.5, std 0.5) — the 5th
        // would be "anomalous vs 2 points" under a naive gate; warm-up
        // must hold every one of them back
        ms.addData(ev(1, 1, 1L, 10.0), ev(2, 2, 1L, 11.0),
          ev(3, 3, 1L, 10.0), ev(4, 4, 1L, 11.0), ev(5, 5, 1L, 10.0))
        q.processAllAvailable()
        assert(spark.table("tws_anom").count() === 0)

        // batch 2: one normal point, then a spike — state crossed batches
        ms.addData(ev(6, 6, 1L, 11.0), ev(7, 7, 1L, 50.0))
        q.processAllAvailable()
        val alerts = spark.table("tws_anom").collect()
        assert(alerts.length === 1)
        val a = alerts.head
        assert(a.getAs[Long]("event_id") === 7L)
        assert(a.getAs[Double]("value") === 50.0)
        assert(a.getAs[Long]("n_baseline") === 6L)
        assert(a.getAs[Double]("mean_before") === 10.5)
        assert(a.getAs[Double]("std_before") === 0.5)

        // the spike joined the baseline; a normal point after it stays
        // quiet (variance inflated by the spike — tested against moments
        // BEFORE itself, not after)
        ms.addData(ev(8, 8, 1L, 11.0))
        q.processAllAvailable()
        assert(spark.table("tws_anom").count() === 1)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("anomaly gate: one big batch alerts identically to split batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = TransformWithStateOps.anomalyAlerts(ms.toDS())
        .writeStream.format("memory").queryName("tws_anom2")
        .outputMode("append").start()
      try {
        // the whole stream of the previous test in ONE batch — in-batch
        // event-time ordering must produce the same single alert
        ms.addData(ev(1, 1, 1L, 10.0), ev(2, 2, 1L, 11.0),
          ev(3, 3, 1L, 10.0), ev(4, 4, 1L, 11.0), ev(5, 5, 1L, 10.0),
          ev(6, 6, 1L, 11.0), ev(7, 7, 1L, 50.0), ev(8, 8, 1L, 11.0))
        q.processAllAvailable()
        val alerts = spark.table("tws_anom2").collect()
        assert(alerts.length === 1)
        assert(alerts.head.getAs[Long]("event_id") === 7L)
        assert(alerts.head.getAs[Long]("n_baseline") === 6L)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
