package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Planted-lag scenario for the streaming metrics listener: a windowed
  * stateful query processes batches whose newest events race ahead of
  * the watermark, and the captured table must show the input counts,
  * live state, watermark advance, and the positive lag.
  */
class StreamMonitorSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String): Event =
    Event(id, ts(t), 1L, "click", 1.0)

  test("listener captures per-batch rows, state, watermark and lag") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mon = new StreamMonitor()
    spark.streams.addListener(mon)
    val ms = MemoryStream[Event]
    val q = ms.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("monitored_agg")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "10:00"), ev(2, "10:10"), ev(3, "11:00"))
      q.processAllAvailable()
      ms.addData(ev(4, "13:00"))
      q.processAllAvailable()
      ms.addData(ev(5, "13:10"), ev(6, "13:20"))
      q.processAllAvailable()
      // listener events are posted asynchronously after the batch commits
      var tries = 0
      while (mon.snapshot.count(_.input_rows > 0) < 3 && tries < 100) {
        Thread.sleep(100); tries += 1
      }

      val rows = mon.snapshot.filter(_.query_name == "monitored_agg")
      val fed = rows.filter(_.input_rows > 0)
      assert(fed.size >= 3, s"expected >=3 data batches, got $rows")
      assert(fed.map(_.input_rows).sum == 6, "every fed row accounted for")
      // the windowed aggregate holds live state
      assert(fed.exists(_.state_rows > 0))
      assert(fed.forall(m => m.state_updated >= 0 && m.state_rows >= 0))
      // watermark only ever advances
      val wms = rows.map(_.watermark_ms).filter(_ >= 0)
      assert(wms == wms.sorted, s"watermark regressed: $wms")
      assert(wms.last > wms.head, "watermark advanced across batches")
      // planted lag: batch 1's newest event (11:00) is processed while
      // the watermark is still at epoch/early — max_event - watermark > 0
      assert(fed.exists(m => m.lag_ms > 0), s"no positive lag in $fed")
      // and the metrics surface as a real table
      val tbl = mon.metricsTable(spark)
        .filter(col("query_name") === "monitored_agg")
        .filter(col("input_rows") > 0)
      assert(tbl.agg(sum(col("input_rows"))).collect()(0).getLong(0) == 6L)
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
    }
  }
}
