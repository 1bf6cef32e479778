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
  * Plain parquet has no transactional overwrite, so each merge writes the
  * merged state to a TEMP directory, swaps the previous generation aside,
  * and renames the temp into place — a crash at any point leaves either
  * the table or its `__old` generation on disk (the read path recovers
  * from `__old` when the table dir is missing), never a truncated half
  * table. A lakehouse table format would make the swap transactional and
  * partition-local, and this is exactly the dataflow its MERGE executes.
  * State scales as O(table) per batch here — the demo trade; with a
  * key-partitioned table layout only the partitions containing batch keys
  * need rewriting.
  */
object StreamingUpsert {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Schema: (key long, ts timestamp, change_id long, value double). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tablePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val hfs = fs(spark, tablePath)
    val tbl = new Path(tablePath)
    val old = new Path(tablePath + "__old")
    val tmp = new Path(tablePath + "__tmp")
    // Hadoop FileSystem signals failure by RETURNING false, not throwing —
    // an unchecked rename would silently nest one generation inside the
    // other and double every key on the next read
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(s"StreamingUpsert: $what failed")
    // recover from a crash that swapped the table aside but never renamed
    // the (possibly incomplete, so discarded) temp into place
    if (!hfs.exists(tbl) && hfs.exists(old))
      must(hfs.rename(old, tbl), s"recovery rename $old -> $tbl")
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
    // write reads `tbl` while producing `tmp` — distinct dirs, so no
    // materialization barrier is needed before the swap below
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (hfs.exists(old)) must(hfs.delete(old, true), s"delete stale $old")
    if (hfs.exists(tbl)) must(hfs.rename(tbl, old), s"swap-aside $tbl -> $old")
    // the commit point: table now IS the new generation
    must(hfs.rename(tmp, tbl), s"commit rename $tmp -> $tbl")
    hfs.delete(old, true) // best-effort: a leftover __old is reclaimed next merge
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
