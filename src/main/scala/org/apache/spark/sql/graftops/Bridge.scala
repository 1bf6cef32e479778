package org.apache.spark.sql.graftops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}

/** Access shims for `private[sql]` surfaces the custom-operator API needs
  * (this file lives under `org.apache.spark.sql` ONLY for Scala access
  * qualification — the standard packaging trick Spark-extension libraries
  * use; no Spark code is modified or shadowed):
  *   - `Dataset.ofRows` — wrap a custom LogicalPlan as a DataFrame,
  *   - `ExpressionUtils.expression` — Column → Catalyst Expression
  *     (Spark 4 removed the public `Column.expr`).
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Column → fully converted Catalyst expression via the SESSION's
    * converter ([[ExpressionUtils.expression]] alone wraps the column in a
    * lazy `ColumnNodeExpression` that generic analyzer rules do not unwrap
    * inside a custom logical node — "No plan for" at planning time).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[CSparkSession].expression(c)
}
