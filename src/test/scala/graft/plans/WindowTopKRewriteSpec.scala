package graft.plans

import graft.SparkSpec
import graft.expr.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the injected window-top-k optimizer rule. */
class WindowTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def parts = spark.read.parquet(s"$sf0001/part.parquet")

  private val w = Window.partitionBy(col("p_brand"))
    .orderBy(col("p_retailprice").desc, col("p_partkey"))

  test("the drop-rank idiom rewrites to TopKPerKeyNode and stays correct") {
    val idiom = parts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val nodes = idiom.queryExecution.optimizedPlan.collect {
      case n: TopKPerKeyNode => n
    }
    assert(nodes.length === 1, "eligible idiom must reroute")
    assert(nodes.head.k === 3)
    // equivalence against the un-rewritten spelling (rank kept → no match)
    val reference = parts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("rn"))
      .drop("rn")
    assert(idiom.collect().toSet === reference.collect().toSet)
  }

  test("rn < k and rn = 1 comparison forms rewrite with the right k") {
    def kOf(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.optimizedPlan.collect { case n: TopKPerKeyNode => n.k }
    val lt = parts.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 4).select(col("p_partkey"))
    assert(kOf(lt) === Seq(3))
    val eq = parts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("p_partkey"))
    assert(kOf(eq) === Seq(1))
  }

  test("ineligible shapes are left alone") {
    def rewritten(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case n: TopKPerKeyNode => n
      }.nonEmpty
    // rank kept in the output — operator cannot produce it
    val keepsRank = parts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_partkey"), col("rn"))
    assert(!rewritten(keepsRank))
    // a second window expression rides the same Window node
    val twoExprs = parts
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("p_retailprice")).over(
        Window.partitionBy(col("p_brand"))))
      .filter(col("rn") <= 3)
      .select(col("p_partkey"), col("mx"))
    assert(!rewritten(twoExprs))
    // filter on something other than the rank
    val otherCond = parts.withColumn("rn", row_number().over(w))
      .filter(col("p_size") > 10)
      .select(col("p_partkey"))
    assert(!rewritten(otherCond))
  }
}
