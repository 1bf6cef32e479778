package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: print the executed physical plan of named SparkEntry
  * queries (`sbt "runMain graft.PlanProbe q07_topk_per_brand ..."`) — the
  * .explain audit loop for checking pushdown/broadcast/codegen shape
  * without wiring a full bench run.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.GraftFunctions.register(spark)
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
