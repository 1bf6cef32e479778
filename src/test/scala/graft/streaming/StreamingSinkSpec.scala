package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once file sink: a streaming query writing parquet under a
  * checkpoint can be stopped and restarted without duplicating or losing
  * rows — the property the reference's copy-then-delete loop lacks
  * (SURVEY.md §7.4 "exactly-once archival").
  */
class StreamingSinkSpec extends SparkSpec {

  private def ev(id: Long, mm: Int): Event =
    Event(id, Timestamp.valueOf(f"2024-01-01 10:$mm%02d:00"), 1L, "click", 1.0)

  test("parquet sink + checkpoint survives a restart exactly-once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("graft-sink").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val ms = MemoryStream[Event]

    def start() = ms.toDF().writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    ms.addData(ev(1, 1), ev(2, 2))
    q1.processAllAvailable()
    q1.stop()

    // restart against the same checkpoint; feed more data
    val q2 = start()
    ms.addData(ev(3, 3), ev(4, 4))
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L)) // every row exactly once
  }
}
