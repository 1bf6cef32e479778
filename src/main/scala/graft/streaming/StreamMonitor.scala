package graft.streaming

import java.time.Instant

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch record captured from a StreamingQueryProgress event: the
  * numbers an on-call engineer actually pages on — throughput, state
  * size, and how far the watermark trails the newest event seen
  * (`lag_ms`, the "is this pipeline keeping up" signal; -1 when the
  * query has no event-time axis).
  */
final case class BatchMetric(
    query_name: String,
    batch_id: Long,
    ts_ms: Long,
    input_rows: Long,
    state_rows: Long,
    state_updated: Long,
    watermark_ms: Long,
    max_event_ms: Long,
    lag_ms: Long)

/** Streaming OBSERVABILITY: a [[StreamingQueryListener]] that turns the
  * engine's per-batch progress events into a queryable metrics TABLE —
  * you can run a stream (the streaming packs), and now you can watch
  * one: rows/batch, state-store growth, watermark position, and
  * watermark lag land in a bounded in-memory ring that
  * [[StreamMonitor.metricsTable]] exposes as a DataFrame for the same
  * relational treatment as any other table (alerting joins, q99-style
  * changepoint scans over throughput, …).
  *
  * The listener is driver-side and event-driven (Spark pushes progress
  * after each batch — nothing polls), so its cost is independent of data
  * volume: exactly the shape that still works when the monitored query
  * shuffles terabytes. The ring bound caps memory on long-running
  * queries; production would periodically flush [[metricsTable]] to a
  * versioned sink instead of growing the ring.
  */
final class StreamMonitor(maxBatches: Int = 4096) extends StreamingQueryListener {

  private val ring = new java.util.concurrent.ConcurrentLinkedDeque[BatchMetric]()

  private def isoMs(s: String): Long =
    try Instant.parse(s).toEpochMilli catch { case _: Exception => -1L }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val et = p.eventTime.asScala
    val wm = et.get("watermark").map(isoMs).getOrElse(-1L)
    val mx = et.get("max").map(isoMs).getOrElse(-1L)
    val states = p.stateOperators.toSeq
    ring.addLast(BatchMetric(
      query_name = Option(p.name).getOrElse(p.id.toString),
      batch_id = p.batchId,
      ts_ms = isoMs(p.timestamp),
      input_rows = p.numInputRows,
      state_rows = states.map(_.numRowsTotal).sum,
      state_updated = states.map(_.numRowsUpdated).sum,
      watermark_ms = wm,
      max_event_ms = mx,
      lag_ms = if (wm >= 0 && mx >= 0) mx - wm else -1L))
    while (ring.size() > maxBatches) ring.pollFirst()
  }

  /** Everything captured so far, oldest batch first. */
  def snapshot: Seq[BatchMetric] = ring.iterator().asScala.toSeq

  /** The captured metrics as a relational table. */
  def metricsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}
