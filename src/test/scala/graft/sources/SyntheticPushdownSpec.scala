package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Pins for the graft-synth DSv2 filter + aggregate pushdown. */
class SyntheticPushdownSpec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 8): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")

  test("doc_id range predicates prune at partition planning") {
    val df = synth(1000).filter(col("doc_id") >= 900 && col("doc_id") < 950)
    assert(scanDesc(df).contains("plannedRange=[900,950)"))
    val ids = df.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (900L until 950L))
    // the planned work shrank: partitions cover 50 ids, not 1000
    val parts = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.get
    assert(parts <= 8)
  }

  test("equality predicate plans a single-id range") {
    val df = synth(1000).filter(col("doc_id") === 7)
    assert(scanDesc(df).contains("plannedRange=[7,8)"))
    val rows = df.collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("doc_id") === 7L)
  }

  test("non-id predicates stay residual and still filter correctly") {
    val df = synth(500).filter(col("lang") === "en" && col("doc_id") < 100)
    assert(scanDesc(df).contains("plannedRange=[0,100)"))
    val got = df.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (0L until 100L)
      .filter(id => SyntheticSource.langFor(42L, id) == "en").toSet
    assert(got === expected)
  }

  test("COUNT(*) is answered arithmetically — a trillion rows in O(1)") {
    val t0 = System.nanoTime()
    val n = synth(1000000000000L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 1000000000000L)
    assert(secs < 10.0, s"count-star pushdown must not generate rows ($secs s)")
  }

  test("COUNT(*) under a pushed range counts hi-lo without generation") {
    val df = synth(1000000000000L).filter(col("doc_id") >= 5)
    assert(df.count() === 999999999995L)
    // and a contradictory range counts zero
    assert(synth(100).filter(col("doc_id") > 200).count() === 0L)
  }

  test("pushdown leaves full-scan semantics untouched") {
    // same rows with and without the pushdown path in play
    val all = synth(200, parts = 4).collect()
    assert(all.length === 200)
    val viaFilter = synth(200, parts = 4)
      .filter(col("doc_id") >= 0).collect()
    assert(viaFilter.map(_.getLong(0)).sorted.toSeq ===
      all.map(_.getLong(0)).sorted.toSeq)
  }
}
