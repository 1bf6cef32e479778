package graft.ops

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Columnar-format interchange beyond parquet: Spark bundles a native
  * vectorized ORC reader/writer, and a warehouse engine must round-trip
  * through it losslessly — ORC is what half the Hive-era estates still
  * serve — with the same scan-side economics (column pruning, predicate
  * pushdown, partition pruning) the parquet path gets.
  */
object Formats {

  def pack: Seq[Q] = Seq(q106OrcRoundtrip)

  /** Write `df` as point-lookup-optimized parquet: a BLOOM FILTER on
    * `bloomCol` (sized for `ndv` distinct values) plus small row groups
    * (`blockBytes`), so an equality scan can skip whole row groups whose
    * bloom answers "definitely absent" — the layout that makes needle
    * lookups on an UNSORTED 100 TB fact table touch kilobytes instead of
    * the full scan. Sorted layouts get the same skipping for free from
    * min/max stats (see [[Compaction]]'s clustering); blooms are the
    * complement for columns the sort key can't cover.
    * `ParquetPruningSpec` proves both effects from scan metrics.
    */
  def bloomWrite(df: org.apache.spark.sql.DataFrame, dir: String,
      bloomCol: String, ndv: Long, blockBytes: Int = 1 << 16): Unit =
    df.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol", ndv.toString)
      .option("parquet.block.size", blockBytes.toString)
      .parquet(dir)

  /** q106: ORC ROUND TRIP — project the needed lineitem columns, write
    * them as ORC partitioned by return flag, read the ORC back with a
    * flag + date filter, and aggregate. The filter on the PARTITION
    * column prunes directories (only the 'R' partition is read); the
    * date filter pushes into the ORC reader; doubles/timestamps/strings
    * survive the trip bit-exactly, so the aggregate hash-matches an
    * oracle that never saw ORC at all — which is precisely the lossless
    * claim under test.
    *
    * Scale shape: one pruned projection write (the partitioned layout is
    * the same layout a real estate would keep at rest), one
    * partition-pruned scan, one 2-group aggregate. Each invocation writes
    * into a FRESH subdirectory of one shutdown-hook-cleaned root, so
    * concurrent callers (parallel specs, a second session in this JVM, a
    * future parallel bench) can never read one run against another run's
    * overwrite; each invocation best-effort reclaims runs more than a few
    * sequence numbers behind it ([[Q.reclaimOldRuns]]), so a long-lived
    * process holds a bounded handful of staging copies, and the shutdown
    * hook sweeps the remainder at JVM exit.
    */
  private lazy val orcRoot: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_orc_rt")
    // deleteOnExit can't remove a non-empty dir and the ORC files are
    // written later — a shutdown hook deletes the whole tree instead
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(d)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case scala.util.control.NonFatal(_) => () }))
    d
  }

  private val orcRun = new java.util.concurrent.atomic.AtomicLong(0L)

  val q106OrcRoundtrip: Q = Q(
    "q106_orc_roundtrip",
    (s: SparkSession, dir: String) => {
      val seq = orcRun.incrementAndGet()
      Q.reclaimOldRuns(orcRoot, seq)
      val orcDir = orcRoot.resolve(s"run_$seq").toString
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .orc(orcDir)
      s.read.orc(orcDir)
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(Q.dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("l_linestatus"))
    },
    Some(s"""
      SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        ${Q.sumDec("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE l_returnflag = 'R'
        AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_linestatus ORDER BY l_linestatus"""))
}
