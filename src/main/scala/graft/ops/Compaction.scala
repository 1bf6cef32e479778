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
  *
  * SINGLE-WRITER contract: compaction must not run concurrently with any
  * other writer of the same directory (e.g. a live [[graft.streaming
  * .StreamingUpsert]] merge) — two swap protocols racing on one path can
  * commit a compacted copy of generation N OVER a just-committed N+1,
  * losing the newer rows. The `__tmp` guard below fails fast on the
  * overlap it can detect; pausing the other writer is the caller's job,
  * exactly as with lakehouse OPTIMIZE.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Rewrite `dir` into ~`targetBytes` files clustered by the Morton
    * interleave of two dimension columns (each masked into the curve's
    * 16-bit domain here — callers pass raw columns).
    */
  def zorderCompact(spark: SparkSession, dir: String,
      xCol: String, yCol: String, targetBytes: Long): Stats =
    compact(spark, dir, key =>
      _.withColumn(key, ScalePatterns.mortonKey(
        pmod(col(xCol), lit(65536L)), pmod(col(yCol), lit(65536L)))),
      targetBytes)

  /** Rewrite `dir` into ~`targetBytes` files sorted by one column. */
  def sortCompact(spark: SparkSession, dir: String, sortCol: String,
      targetBytes: Long): Stats =
    compact(spark, dir, key => _.withColumn(key, col(sortCol)), targetBytes)

  /** The clustered rewrite layout, shared with [[VersionedTable.optimize]]:
    * range partition on the clustering key → disjoint per-file key ranges
    * → parquet min/max stats prune scans on the clustered dimensions;
    * sortWithinPartitions tightens page-level stats inside each file. The
    * helper key column (named so it cannot shadow, and then destroy, a
    * real column of the table being rewritten) is dropped AFTER the sort
    * — a plain project, no exchange, so row order survives to the writer.
    */
  private[ops] def clusterLayout(df: org.apache.spark.sql.DataFrame,
      withKey: String => org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      nFiles: Int): org.apache.spark.sql.DataFrame = {
    val key = Iterator.from(0).map("__graft_z" + _)
      .find(n => !df.columns.contains(n)).get
    withKey(key)(df)
      .repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .drop(key)
  }

  private def compact(spark: SparkSession, dir: String,
      withKey: String => org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      targetBytes: Long): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    AtomicDirSwap.recover(spark, dir)
    val hfs = AtomicDirSwap.fs(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(AtomicDirSwap.tmpPath(dir))
    require(!hfs.exists(tmp),
      s"$tmp already exists — another writer is active (or crashed " +
        "mid-write); remove it only once no writer is running")
    val df = spark.read.parquet(dir)
    val files = df.inputFiles
    val totalBytes = files.map(f =>
      hfs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val nFiles = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val clustered = clusterLayout(df, withKey, nFiles)
    // count the PRE-rewrite generation (the same rows by construction)
    // BEFORE the swap so stats never re-read the freshly written data
    val rows = df.count()
    clustered.write.mode("overwrite").parquet(tmp.toString)
    AtomicDirSwap.commit(spark, dir)
    val filesAfter = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    Stats(files.length, filesAfter, rows)
  }
}
