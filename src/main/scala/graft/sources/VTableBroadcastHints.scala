package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V1ScanWrapper}

import graft.ops.VersionedTable

/** MANIFEST-SIZED BROADCAST DECISIONS for versioned-table joins.
  *
  * The catalog scan reports honest byte statistics
  * ([[VTableV1ScanImpl.estimateStatistics]] → [[VersionedTable
  * .scanSizeBytes]]), but Spark's V1Scan bridge wraps the scan in
  * `V1ScanWrapper`, which does NOT forward `SupportsReportStatistics`
  * (verified against the shipped 4.1 planner) — so a V1-bridged scan is
  * sized at `defaultSizeInBytes` (effectively infinite) and a
  * versioned-table dimension can never win a broadcast join on its own.
  * This rule closes that gap at the JOIN: for each join side whose leaf
  * (through Project/Filter) is a versioned-table scan, it measures the
  * scan's manifest bytes — the SAME pruned-size estimate the scan
  * itself reports, so plan-time size and runtime files agree — and
  * attaches a broadcast `JoinHint` when the measured bytes clear the
  * session's `autoBroadcastJoinThreshold`. JoinSelection then plans a
  * broadcast hash join exactly as if the statistics had flowed
  * natively; sides it cannot legally broadcast (outer-side builds,
  * stream-stream joins) ignore the hint, and estimate failures degrade
  * to "no hint" — never a broken query.
  *
  * Registered by [[graft.expr.GraftFunctions.register]] into the last
  * optimizer batch (after scan pushdown, so the V1ScanWrapper shape is
  * visible) and by the `spark.sql.extensions` path; matching both the
  * pre- and post-pushdown relation shapes keeps the rule correct
  * wherever the injection point lands. At 100 TB this is the difference
  * between shipping a megabyte dim to every executor and shuffling the
  * fact table across the cluster.
  */
object VTableBroadcastHints extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) plan // broadcasting disabled for the session
    else plan.transform {
      case j @ Join(l, r, _, _, hint)
          if hint.leftHint.isEmpty || hint.rightHint.isEmpty =>
        val nl = hint.leftHint.orElse(sideHint(l, threshold))
        val nr = hint.rightHint.orElse(sideHint(r, threshold))
        if (nl == hint.leftHint && nr == hint.rightHint) j
        else j.copy(hint = JoinHint(nl, nr))
    }
  }

  private def sideHint(side: LogicalPlan, threshold: Long): Option[HintInfo] =
    measuredBytes(side).collect {
      case b if b <= threshold => HintInfo(strategy = Some(BROADCAST))
    }

  // walk to the side's leaf through size-preserving unary nodes only:
  // Filter only shrinks, and a Project keeps row count — but ONLY an
  // attribute-(or trivial-alias-)only projection is provably no wider
  // than the on-disk bytes this estimate measures. A projectList with
  // computed expressions (concat, array_repeat, …) can be arbitrarily
  // LARGER in memory than the compressed source bytes, and a forced
  // broadcast JoinHint cannot be demoted by AQE — an under-estimate
  // there risks an executor OOM on the broadcast build, so expression
  // projections stand down (no hint, never a broken query).
  private def measuredBytes(p: LogicalPlan): Option[Long] = p match {
    case Project(pl, child) if pl.forall {
      case _: org.apache.spark.sql.catalyst.expressions.Attribute => true
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        a.child.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Attribute]
      case _ => false
    } => measuredBytes(child)
    case Filter(_, child) => measuredBytes(child)
    case s: DataSourceV2ScanRelation => scanBytes(s)
    case rel: DataSourceV2Relation => tableBytes(rel)
    case _ => None
  }

  // post-pushdown shape: the scan carries its own pruned-size estimate
  private def scanBytes(s: DataSourceV2ScanRelation): Option[Long] = {
    val v1 = s.scan match {
      case w: V1ScanWrapper => Some(w.v1Scan)
      case other => Some(other)
    }
    v1.collect { case impl: VTableV1ScanImpl =>
      val est = impl.estimateStatistics().sizeInBytes()
      if (est.isPresent) Some(est.getAsLong) else None
    }.flatten
  }

  // pre-pushdown shape (extensions injected mid-optimization): whole
  // snapshot size — no pushed filters yet, so no pruning to honor.
  // Memoized per (path, resolved version): the injection point sits in
  // a FIXED-POINT optimizer batch, so an un-hinted (big) side would
  // otherwise re-measure on every iteration of every join query; a
  // committed snapshot's size is immutable, making the memo sound.
  private val sizeMemo =
    new java.util.LinkedHashMap[(String, Long), java.lang.Long](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), java.lang.Long]): Boolean =
        size() > 512
    }

  private def tableBytes(rel: DataSourceV2Relation): Option[Long] =
    rel.table match {
      case t: VTableV2Table =>
        try {
          val spark = SparkSession.active
          val ver = t.tableVersion.getOrElse(
            VersionedTable.versions(spark, t.tablePath).last)
          val key = (t.tablePath, ver)
          sizeMemo.synchronized(Option(sizeMemo.get(key)))
            .map(_.longValue)
            .orElse {
              val (bytes, _, _) = VersionedTable.scanSizeBytes(
                spark, t.tablePath, Some(ver), Nil, Nil)
              sizeMemo.synchronized {
                sizeMemo.put(key, java.lang.Long.valueOf(bytes))
              }
              Some(bytes)
            }
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
}
