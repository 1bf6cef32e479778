package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File compaction + z-order clustering: fewer files, identical data,
  * disjoint per-file key ranges (the property that makes parquet min/max
  * stats prune scans), and crash recovery through the atomic swap.
  */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_compact").toString + "/tbl"

  test("zorder compact: fewer files, identical rows, sorted by the curve") {
    val dir = freshDir()
    val rows = (0L until 2000L).map(i => (i, i % 97, (i * 31) % 1440))
    rows.toDF("id", "x", "y").repartition(16).write.parquet(dir)
    assert(spark.read.parquet(dir).inputFiles.length === 16)

    val stats = Compaction.zorderCompact(spark, dir, "x", "y",
      targetBytes = 1L << 30) // everything fits one file
    assert(stats.filesBefore === 16)
    assert(stats.filesAfter === 1)
    assert(stats.rows === 2000L)

    val after = spark.read.parquet(dir)
    assert(after.orderBy("id").collect().toSeq ===
      rows.toDF("id", "x", "y").orderBy("id").collect().toSeq)
  }

  test("sort compact: per-file ranges are disjoint (pruning-effective)") {
    val dir = freshDir()
    (0L until 4000L).map(i => ((i * 2654435761L) % 100000L, i))
      .toDF("k", "id").repartition(8).write.parquet(dir)

    // target ~1/4 of the on-disk bytes → ~4 range-partitioned files
    val hfs = AtomicDirSwap.fs(spark, dir)
    val total = spark.read.parquet(dir).inputFiles.map(f =>
      hfs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val stats = Compaction.sortCompact(spark, dir, "k", targetBytes = total / 4)
    assert(stats.filesAfter > 1 && stats.filesAfter < 8)
    assert(stats.rows === 4000L)

    // every output file covers a k-range disjoint from every other file
    val ranges = spark.read.parquet(dir).inputFiles.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"overlapping file ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
  }

  test("a crashed swap (live dir missing, __old present) recovers") {
    val dir = freshDir()
    (0L until 100L).map(i => (i, i % 7, i % 11)).toDF("id", "x", "y")
      .write.parquet(dir)
    // simulate a crash between swap-aside and commit
    val hfs = AtomicDirSwap.fs(spark, dir)
    assert(hfs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))

    val stats = Compaction.zorderCompact(spark, dir, "x", "y", 1L << 30)
    assert(stats.rows === 100L) // recovered generation, then compacted
  }
}
