package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime skew handling: a join whose shuffle has one pathological
  * partition must be re-planned at execution time into split sub-joins
  * (`OptimizeSkewedJoin`) — the no-code-change alternative to manual
  * salting (q30 demonstrates the salted form). The spec plants a key
  * holding ~99% of the rows, forces a sort-merge join, and asserts both
  * the result and that the final adaptive plan actually split the skewed
  * partition.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.enabled", "true")
    // no broadcast escape hatch: skew handling only applies to shuffle joins
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // test-scale thresholds — production keeps the 256 MB defaults
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    try {
      // ~99% of the left rows share k=1; the rest are multiples of 100
      val left = spark.range(0, 100000).select(
        when(col("id") % 100 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would plan separately and the
      // adaptive plan under inspection would stay isFinalPlan=false)
      val rows = joined.collect()
      // k=1 → 99000 matches; k=0 → 1; k∈{100..900 step 100} → 9
      assert(rows.length === 99010)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition, plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
