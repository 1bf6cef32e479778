package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the bucketed-join contract: same results as the shuffled join,
  * with zero hash exchanges in the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey")

    val joined = Bucketing
      .bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    // the join itself must be exchange-free: the only hash exchange allowed
    // in the whole plan is the one for the final tiny aggregation
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the agg exchange, plan:\n$plan")

    // and results match the plain shuffled join exactly
    val expect = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
