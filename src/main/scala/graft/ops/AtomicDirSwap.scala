package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe directory replacement for plain-file tables (no table
  * format): write the new generation to `<table>__tmp`, swap the live dir
  * to `<table>__old`, rename the temp into place, then drop `__old`. A
  * crash at any point leaves either the table or its `__old` generation
  * intact — never a truncated half table — and [[recover]] restores the
  * previous generation when the live dir is missing. Shared by the
  * streaming CDC merge ([[graft.streaming.StreamingUpsert]]) and the
  * file compactor ([[Compaction]]).
  *
  * Hadoop's FileSystem signals failure by RETURNING false, not throwing;
  * every step is checked — an unchecked rename into an existing directory
  * silently NESTS one generation inside the other and doubles every row
  * on the next read.
  */
object AtomicDirSwap {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def must(ok: Boolean, what: String): Unit =
    if (!ok) throw new java.io.IOException(s"AtomicDirSwap: $what failed")

  def tmpPath(table: String): String = table + "__tmp"

  /** If a crash swapped the table aside but never committed the temp,
    * restore the previous generation. Call before reading.
    */
  def recover(spark: SparkSession, table: String): Unit = {
    val hfs = fs(spark, table)
    val tbl = new Path(table)
    val old = new Path(table + "__old")
    if (!hfs.exists(tbl) && hfs.exists(old))
      must(hfs.rename(old, tbl), s"recovery rename $old -> $tbl")
  }

  /** Commit `<table>__tmp` (already fully written) as the live table. */
  def commit(spark: SparkSession, table: String): Unit = {
    val hfs = fs(spark, table)
    val tbl = new Path(table)
    val old = new Path(table + "__old")
    val tmp = new Path(tmpPath(table))
    if (hfs.exists(old)) must(hfs.delete(old, true), s"delete stale $old")
    if (hfs.exists(tbl)) must(hfs.rename(tbl, old), s"swap-aside $tbl -> $old")
    // the commit point: table now IS the new generation
    must(hfs.rename(tmp, tbl), s"commit rename $tmp -> $tbl")
    hfs.delete(old, true) // best-effort: a leftover __old is reclaimed next swap
  }
}
