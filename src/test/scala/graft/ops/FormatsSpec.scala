package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the ORC interchange query: losslessness of the round trip and
  * the scan-side economics (partition pruning on the directory column).
  */
class FormatsSpec extends SparkSpec {

  test("q106: ORC round trip matches the aggregate computed without ORC") {
    val viaOrc = graft.SparkEntry.queries("q106_orc_roundtrip")(spark, sf0001)
      .collect()
    val direct = Q.t(spark, sf0001, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(Q.dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy(col("l_linestatus"))
      .collect()
    assert(viaOrc.length === direct.length && viaOrc.length >= 1)
    viaOrc.zip(direct).foreach { case (a, b) =>
      assert(a.getAs[String]("l_linestatus") === b.getAs[String]("l_linestatus"))
      assert(a.getAs[Long]("n_lines") === b.getAs[Long]("n_lines"))
      assert(a.getAs[Long]("sum_qty") === b.getAs[Long]("sum_qty"))
      // bit-exact: the decimal-staged sum is order-independent and ORC
      // stores the doubles losslessly
      assert(a.getAs[Double]("sum_price") === b.getAs[Double]("sum_price"))
    }
  }

  test("q106: the return-flag filter prunes ORC partitions at planning time") {
    // AQE off for the probe: the adaptive wrapper hides the scan from
    // collect() until execution (the audit-spec convention)
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val plan = graft.SparkEntry.queries("q106_orc_roundtrip")(spark, sf0001)
      .queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan over the ORC dir")
    val orcScan = scans.find(_.relation.fileFormat.toString.toLowerCase
      .contains("orc")).getOrElse(fail("no ORC scan in the plan"))
    // partition pruning: only the l_returnflag=R directory survives
    assert(orcScan.partitionFilters.nonEmpty,
      "l_returnflag must be a partition filter, not a data filter")
    // column pruning reaches the ORC reader too: 4 data columns needed
    assert(orcScan.requiredSchema.size <= 4,
      s"ORC scan reads ${orcScan.requiredSchema.size} columns")
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
        case None => conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }
}
