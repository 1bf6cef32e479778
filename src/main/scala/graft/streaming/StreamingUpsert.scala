package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply: merge each micro-batch of keyed changes into a
  * parquet-backed table with LAST-WRITE-WINS semantics — the streaming
  * form of the batch `q45_upsert_apply` MERGE (same reduction, applied
  * incrementally via `foreachBatch`).
  *
  * Merge rule per key: the row with the greatest (ts, change_id) across
  * {current table row} ∪ {batch rows} survives. Re-delivered micro-batches
  * (foreachBatch is at-least-once after a restart) are therefore
  * IDEMPOTENT: replaying a batch reapplies winners that already won.
  *
  * Plain parquet has no transactional overwrite, so each merge
  * materializes the merged state (localCheckpoint — the read must complete
  * before the overwrite truncates the directory) and rewrites the table;
  * a lakehouse table format would make that rewrite transactional and
  * partition-local, and this is exactly the dataflow its MERGE executes.
  * State scales as O(table) per batch here — the demo trade; with a
  * key-partitioned table layout only the partitions containing batch keys
  * need rewriting.
  */
object StreamingUpsert {

  /** Schema: (key long, ts timestamp, change_id long, value double). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tablePath: String): Unit = {
    val existing =
      try spark.read.parquet(tablePath)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        batch.limit(0) // first batch: empty table with the batch schema
      }
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("change_id").desc)
    val merged = existing.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint(true) // materialize BEFORE overwriting the source dir
    merged.write.mode("overwrite").parquet(tablePath)
  }

  def start(changes: DataFrame, tablePath: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, tablePath)
      }
      .outputMode("update")
      .start()
}
