package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning: writing a table partitioned by a
  * date column lets a date-filtered read skip entire directories — the
  * difference between scanning a day and scanning a year at warehouse
  * scale. Asserts the pruning is visible in the plan, not just hoped for.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write is pruned by a date filter") {
    val out = Files.createTempDirectory("graft-part").toString
    val events = Q.t(spark, sf0001, "events")
      .withColumn("event_date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val nDates = events.select("event_date").distinct().count()
    val oneDay = spark.read.parquet(out)
      .filter(col("event_date") === lit("2024-01-05").cast("date"))

    // the scan must carry a PartitionFilters entry on event_date and read
    // only that partition's files
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"),
      s"no partition filter in scan:\n$scan")

    val allRows = spark.read.parquet(out).count()
    val dayRows = oneDay.count()
    assert(dayRows > 0 && dayRows < allRows)
    // and the day's rows match a non-partitioned filter of the source
    val expect = events.filter(col("event_date") === lit("2024-01-05").cast("date")).count()
    assert(dayRows === expect)
    assert(nDates > 1)
  }
}
