package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftops.Bridge

/** A WHOLE-OPERATOR Catalyst extension: per-key top-k as a first-class
  * physical operator with MAP-SIDE PARTIAL PRUNING — the (c)-tier custom
  * surface (LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions)
  * that the built-ins genuinely cannot express.
  *
  * The built-in spelling of per-group top-k — `row_number` over a keyed
  * window — shuffles EVERY input row to its key's partition and sorts
  * there: at 100 TB the shuffle carries the whole fact table to keep, per
  * key, only k rows. This operator plans TWO pipelined stages instead:
  *
  *   - PARTIAL (before the exchange): each input partition keeps at most
  *     k rows per key in a bounded heap — shuffle volume drops from
  *     O(rows) to O(distinct keys per partition · k), the same partial/
  *     final contract hash aggregation uses;
  *   - FINAL (after a ClusteredDistribution-induced hash exchange): the
  *     identical heap pass over co-located survivors yields the exact
  *     answer.
  *
  * The ordering must be TOTAL (add a tiebreak column) for the result set
  * to be deterministic — same contract as every rank window in this repo.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

/** One bounded-heap pass; `partial` selects the distribution contract. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // the partial stage's numOutputRows IS the pruning evidence: it bounds
  // what crosses the exchange at keys-per-partition × k
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val limit = k
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortExprs, childOutput)
      // max-heap per key: head = the WORST kept row; a new row enters only
      // if it beats the head, so each partition holds <= k rows per key
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](
              (a: InternalRow, b: InternalRow) => ord.compare(a, b))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator).map { r =>
        outRows += 1
        r
      }
    }
  }
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. Injected with `e.injectPlannerStrategy(TopKPerKeyStrategy)`.
  */
case class TopKPerKeyStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Per-key top-k of `df`: the k first rows of each key under `order`
    * (which must be a total order for determinism). Returns the rows
    * unchanged — callers project/rank afterwards if needed.
    */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    // the strategy travels with the API — idempotent self-install covers
    // sessions built without spark.sql.extensions
    if (!spark.experimental.extraStrategies
        .exists(_.isInstanceOf[TopKPerKeyStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy(spark)
    val sortOrders = order.map(c => Bridge.expression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    Bridge.ofRows(spark,
      TopKPerKeyNode(keys.map(c => Bridge.expression(spark, c)), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
