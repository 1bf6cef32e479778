package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the Dataset.observe instrumentation surface. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("quality metrics ride the materializing action") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "v")
    val (inst, obs) = Observability.withQualityMetrics(df, Seq("v"))
    val n = inst.filter(col("id") > 0).count() // one action, one scan
    assert(n === 4)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("v_nulls") === 2L)
  }

  test("bounds observation reports true min/max of the pass") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val (inst, obs) = Observability.withBounds(df, "l_quantity")
    inst.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val expected = df.agg(min(col("l_quantity")), max(col("l_quantity")),
      count(lit(1))).collect().head
    assert(m("l_quantity_min") === expected.getDouble(0))
    assert(m("l_quantity_max") === expected.getDouble(1))
    assert(m("n_rows") === expected.getLong(2))
  }

  test("observation adds no shuffle to the instrumented plan") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val (inst, _) = Observability.withQualityMetrics(df, Seq("l_returnflag"))
    val shuffles = inst.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "observe must piggyback on the scan pass")
  }
}
