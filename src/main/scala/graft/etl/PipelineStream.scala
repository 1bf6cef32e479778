package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming entry for the playlist ETL: the Spark-native equivalent of the
  * reference's blob-trigger + move-to-processed loop
  * (`spotifytransform.py:67-75,138-155`).
  *
  * - File source over the inbox dir = the blob trigger (one micro-batch per
  *   discovered file; `Trigger.AvailableNow` drains what exists then stops —
  *   the serverless-invocation shape).
  * - `cleanSource=archive` = the copy-then-delete move, but driven off the
  *   streaming checkpoint, so a crash between "processed" and "archived"
  *   cannot double-process — strictly better than the reference, which can
  *   (`spotifytransform.py:150-153`).
  * - Cross-file dim duplicates are still emitted per-batch (faithful to the
  *   reference, which dedups only within one file); bounded cross-batch dedup
  *   is available separately via `graft.streaming.EventTransforms.dedupWithinWatermark`.
  */
object PipelineStream {

  def start(
      spark: SparkSession,
      inboxDir: String,
      outDir: String,
      archiveDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {

    val raw = spark.readStream
      .schema(Schemas.PlaylistSchema)
      .option("multiLine", value = true)
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .option("maxFilesPerTrigger", 1) // one micro-batch per file, like the blob trigger
      .json(inboxDir)

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val (songs, artists, albums) = SpotifyTransform(batch)
        def write(df: org.apache.spark.sql.DataFrame, table: String): Unit =
          df.write.mode("overwrite").option("header", value = true)
            .csv(s"$outDir/${table}_data/run=$batchId")
        write(songs, "song"); write(artists, "artist"); write(albums, "album")
      }
      .start()
  }
}
