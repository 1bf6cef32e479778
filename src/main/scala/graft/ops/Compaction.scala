package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction with optional z-order clustering — the table
  * housekeeping every file-backed warehouse runs (lakehouse `OPTIMIZE
  * [ZORDER BY]`): streaming sinks and incremental merges accumulate
  * thousands of small files whose per-file open/footer cost eventually
  * dominates scans, and whose min/max column ranges are useless for
  * pruning because every file spans everything.
  *
  * The rewrite: read the directory, size the target file count from the
  * actual on-disk bytes, range-partition by the clustering key (z-order
  * over two dimensions, or any single sort column), sort within each
  * partition, and commit atomically via [[AtomicDirSwap]] — a crash
  * leaves the previous generation readable. Range partitioning is what
  * makes the clustering matter at scale: each output file covers a
  * DISJOINT key range, so its parquet min/max stats prune scans on the
  * clustered dimensions.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Rewrite `dir` into ~`targetBytes` files clustered by the Morton
    * interleave of the two (already 16-bit-ranged) dimension columns.
    */
  def zorderCompact(spark: SparkSession, dir: String,
      xCol: String, yCol: String, targetBytes: Long): Stats =
    compact(spark, dir,
      df => df.withColumn("__z",
        ScalePatterns.mortonKey(col(xCol), col(yCol))),
      targetBytes)

  /** Rewrite `dir` into ~`targetBytes` files sorted by one column. */
  def sortCompact(spark: SparkSession, dir: String, sortCol: String,
      targetBytes: Long): Stats =
    compact(spark, dir, df => df.withColumn("__z", col(sortCol)), targetBytes)

  private def compact(spark: SparkSession, dir: String,
      withKey: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      targetBytes: Long): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    AtomicDirSwap.recover(spark, dir)
    val df = spark.read.parquet(dir)
    val files = df.inputFiles
    val hfs = AtomicDirSwap.fs(spark, dir)
    val totalBytes = files.map(f =>
      hfs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    // range partition on the clustering key → disjoint per-file key
    // ranges → parquet min/max stats prune on the clustered dimensions;
    // sortWithinPartitions tightens page-level stats inside each file.
    // The helper key column is dropped AFTER the sort — a plain project,
    // no exchange, so row order survives to the writer.
    val clustered = withKey(df)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    clustered.write.mode("overwrite")
      .parquet(AtomicDirSwap.tmpPath(dir))
    AtomicDirSwap.commit(spark, dir)
    val after = spark.read.parquet(dir)
    Stats(files.length, after.inputFiles.length, after.count())
  }
}
