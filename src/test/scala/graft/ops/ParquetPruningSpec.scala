package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Proves row-group skipping from SCAN METRICS, not plan text: the scan's
  * numOutputRows counts rows decoded from row groups that survived
  * parquet-mr's row-group filters (stats / dictionary / bloom), so a
  * point predicate that reads a small fraction of the table IS the
  * skipped-row-group evidence.
  */
class ParquetPruningSpec extends SparkSpec {

  private val N = 200000L

  /** Rows the parquet scan DECODED (post row-group pruning, pre Spark
    * filter) for a collect of `df`.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no parquet scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  // high-cardinality scattered key: all-distinct (defeats dictionary
  // filtering, so any skipping in the bloom test is the bloom's doing),
  // order-scrambled (defeats min/max stats — every row group covers
  // nearly the full key range)
  private def scattered = spark.range(N).select(
    ((col("id") * 2654435761L) % 999999937L).as("k"), col("id").as("v"))

  test("bloom filter skips row groups a min/max range check cannot") {
    val bloomDir = Files.createTempDirectory("pq_bloom").toString + "/t"
    val plainDir = Files.createTempDirectory("pq_plain").toString + "/t"
    Formats.bloomWrite(scattered, bloomDir, "k", ndv = N)
    scattered.write.mode("overwrite")
      .option("parquet.block.size", (1 << 16).toString).parquet(plainDir)

    // an existing needle (id = 12345's key), not a boundary value
    val needle = (12345L * 2654435761L) % 999999937L
    def lookup(dir: String) =
      spark.read.parquet(dir).filter(col("k") === needle)

    // correctness first: both layouts find exactly the one row
    assert(lookup(bloomDir).collect().map(_.getLong(1)).toSeq == Seq(12345L))
    assert(lookup(plainDir).collect().map(_.getLong(1)).toSeq == Seq(12345L))

    val without = scanRows(lookup(plainDir))
    val withBloom = scanRows(lookup(bloomDir))
    // scrambled layout + no bloom: every row group's [min,max] straddles
    // the needle, nothing is skipped
    assert(without == N, s"expected full decode without bloom, got $without")
    // bloom: only the group(s) that really contain the needle decode
    assert(withBloom < N / 4,
      s"bloom should skip most row groups: decoded $withBloom of $N")
    assert(withBloom > 0)
  }

  test("bloom.<col> table property wires blooms into versioned-table writes") {
    import graft.sources.VTableCatalog
    val root = Files.createTempDirectory("vt_bloom").toString
    val t = s"$root/ns/pts"
    val plain = s"$root/ns/plainpts"
    // small row groups so a 200k-row generation has many groups to skip
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    try {
      hconf.setInt("parquet.block.size", 1 << 16)
      assert(VersionedTable.createIfAbsent(spark, t, scattered,
        Map("bloom.k" -> N.toString)))
      assert(VersionedTable.createIfAbsent(spark, plain, scattered))
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
    }

    // the written files physically CARRY the bloom (footer pin) — the
    // wiring proof independent of skip behavior
    def bloomOffsets(table: String): Seq[Long] = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val dir = VersionedTable.readAt(spark, table).inputFiles.head
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dir), hconf))
      try r.getFooter.getBlocks.asScala.toSeq.flatMap(_.getColumns.asScala
        .filter(_.getPath.toDotString == "k").map(_.getBloomFilterOffset))
      finally r.close()
    }
    assert(bloomOffsets(t).forall(_ >= 0) && bloomOffsets(t).nonEmpty,
      "declared column must carry a bloom in every row group")
    assert(bloomOffsets(plain).forall(_ < 0),
      "undeclared table must not pay for blooms")

    val needle = (12345L * 2654435761L) % 999999937L
    // correctness + result-identity through the SQL catalog path
    spark.conf.set("spark.sql.catalog.vtbloom", classOf[VTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtbloom.root", root)
    assert(spark.sql(s"SELECT v FROM vtbloom.ns.pts WHERE k = $needle")
      .collect().map(_.getLong(0)).toSeq == Seq(12345L))
    assert(spark.sql(s"SELECT v FROM vtbloom.ns.plainpts WHERE k = $needle")
      .collect().map(_.getLong(0)).toSeq == Seq(12345L))

    // decode metrics on the engine scan every catalog read routes
    // through: bloom table decodes a fraction, plain table decodes all
    val withBloom = scanRows(
      VersionedTable.readAt(spark, t).filter(col("k") === needle))
    val without = scanRows(
      VersionedTable.readAt(spark, plain).filter(col("k") === needle))
    assert(without == N, s"expected full decode without bloom, got $without")
    assert(withBloom < N / 4,
      s"bloom should skip most row groups: decoded $withBloom of $N")

    // maintenance keeps the contract: a compaction rewrite re-carries
    // the bloom into the files it writes
    try {
      hconf.setInt("parquet.block.size", 1 << 16)
      VersionedTable.commit(spark, t,
        scattered.withColumn("k", col("k") + 1), overwrite = false)
      assert(VersionedTable.compact(spark, t).isDefined)
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
    }
    assert(bloomOffsets(t).forall(_ >= 0) && bloomOffsets(t).nonEmpty,
      "the compacted generation must carry the declared bloom")
  }

  test("sorted row groups + min/max stats skip on a point predicate") {
    val dir = Files.createTempDirectory("pq_sorted").toString + "/t"
    spark.range(N).select(col("id").as("k"), (col("id") * 7).as("v"))
      .sort(col("k")) // clustered layout: disjoint per-group [min,max]
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (1 << 16).toString).parquet(dir)
    val q = spark.read.parquet(dir).filter(col("k") === 123456L)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(123456L * 7))
    val decoded = scanRows(q)
    assert(decoded < N / 4,
      s"stats pruning should skip most sorted row groups: decoded $decoded")
  }
}
