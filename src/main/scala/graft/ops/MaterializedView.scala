package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** MATERIALIZED VIEWS over the versioned table, refreshed INCREMENTALLY
  * from the change feed — the lakehouse pattern that turns an hourly
  * 100 TB re-aggregation into an O(changes-since-last-refresh) fold
  * (Databricks/Snowflake MV economics; the reference's pipeline
  * recomputes its CSV extracts from scratch every run —
  * `spotifytransform.py:96-143` — which is exactly the cost shape this
  * removes at scale).
  *
  * An MV is itself a [[VersionedTable]] whose TBLPROPERTIES carry the
  * maintenance contract:
  *
  *  - `mview.source` — root path of the source versioned table
  *  - `mview.group`  — comma-joined GROUP BY columns
  *  - `mview.aggs`   — the aggregate list, `name:count` / `name:sum(col)`
  *  - `mview.where`  — optional SQL row predicate applied before the agg
  *  - `mview.source_version` — the source version the content folds up to
  *
  * so the definition travels with the data, the MV content time-travels
  * like any table, and the refresh marker commits ATOMICALLY with the
  * refreshed content (one manifest publish carries both — a crash can
  * never leave content that double-folds the same delta window on the
  * next refresh).
  *
  * Refresh algebra (classic retractable IVM, restricted to the
  * decomposable aggregates it is sound for):
  *
  *  - every change row carries a sign: +1 for insert/update_postimage,
  *    -1 for delete/update_preimage ([[VersionedTable.tableChanges]]
  *    emits exact multiset pre/post images);
  *  - `count` folds as sum(sign); `sum(x)` folds as
  *    sum(coalesce(x,0)*sign) — NULL addends contribute 0, so a group
  *    whose every x is NULL reports 0 (declared semantics: the
  *    IVM-sound reading of SUM; mirror oracles with
  *    `sum(coalesce(x,0))`);
  *  - groups whose folded count reaches 0 are REMOVED (the count agg is
  *    mandatory for exactly this liveness decision — min/max are
  *    refused: they are not retractable without per-group history);
  *  - the fold output is cast back to the MV's STORED schema, so
  *    decimal-widening `+` can never drift the column types across
  *    refreshes.
  *
  * Sums should be staged in DECIMAL ([[Q.dec2]]) when exactness
  * matters: decimal addition is associative, so an incremental fold is
  * bit-identical to a full recompute; double sums are order-dependent
  * and only reproducible approximately.
  *
  * When the delta window crosses a commit the change feed cannot
  * express row-level (RESTORE; feeds refuse with "not expressible"),
  * refresh falls back to a FULL recompute from the source snapshot —
  * same result, table-sized cost, reported as `mode = "full"` so
  * operators see the economics they got.
  */
object MaterializedView {

  /** One aggregate of the MV definition. */
  sealed trait AggDef { def name: String }
  final case class CountAgg(name: String) extends AggDef
  final case class SumAgg(name: String, col: String) extends AggDef

  /** Parse `"cnt:count, rev:sum(price)"`. Exactly one `count` is
    * required (group liveness); anything but count/sum refuses loudly
    * (min/max are not retractable; avg derives as sum/count at read).
    */
  def parseAggs(spec: String): Seq[AggDef] = {
    val SumRe = """(?i)sum\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val parsed = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { a =>
      a.split(':') match {
        case Array(n, f) if f.trim.equalsIgnoreCase("count") =>
          CountAgg(n.trim)
        case Array(n, SumRe(c)) => SumAgg(n.trim, c)
        case _ => throw new IllegalArgumentException(
          s"mview: unsupported aggregate '$a' — the retractable surface " +
            "is 'name:count' and 'name:sum(col)' (avg = sum/count at " +
            "read; min/max need per-group history and are refused)")
      }
    }
    require(parsed.nonEmpty, "mview: empty aggregate list")
    require(parsed.count(_.isInstanceOf[CountAgg]) == 1,
      "mview: exactly one 'name:count' aggregate is required — it " +
        "decides group liveness on retraction")
    val dup = parsed.groupBy(_.name.toLowerCase).collect {
      case (_, g) if g.size > 1 => g.head.name }
    require(dup.isEmpty, s"mview: duplicate aggregate name ${dup.mkString(",")}")
    parsed
  }

  private def fullAggregate(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggDef], where: Option[String]): DataFrame = {
    val filtered = where.map(w => src.filter(expr(w))).getOrElse(src)
    val exprs = aggs.map {
      case CountAgg(n) => count(lit(1)).as(n)
      case SumAgg(n, c) => sum(coalesce(col(c), lit(0))).as(n)
    }
    filtered.groupBy(groupCols.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Create the MV: full initial aggregate of the source tip, committed
    * with the definition + freshness marker as creation properties.
    * Returns false if a table already exists at `mvRoot` (the
    * createIfAbsent contract).
    */
  def create(spark: SparkSession, mvRoot: String, sourceRoot: String,
      groupCols: Seq[String], aggSpec: String,
      where: Option[String] = None): Boolean = {
    require(groupCols.nonEmpty, "mview: need at least one GROUP BY column")
    val aggs = parseAggs(aggSpec)
    val clash = aggs.map(_.name.toLowerCase)
      .intersect(groupCols.map(_.toLowerCase))
    require(clash.isEmpty,
      s"mview: aggregate name ${clash.mkString(",")} collides with a " +
        "group column")
    val srcVs = VersionedTable.versions(spark, sourceRoot)
    require(srcVs.nonEmpty, s"mview: no source table at $sourceRoot")
    val srcTip = srcVs.last
    val src = VersionedTable.readAt(spark, sourceRoot, Some(srcTip))
    val missing = (groupCols ++ aggs.collect { case SumAgg(_, c) => c })
      .filterNot(c => src.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"mview: source has no column ${missing.mkString(",")}")
    // the WHERE text must analyze against the source NOW — a typo'd
    // predicate must refuse at create, not at the first refresh
    where.foreach(w => src.filter(expr(w)).queryExecution.analyzed)
    VersionedTable.createIfAbsent(spark, mvRoot,
      fullAggregate(src, groupCols, aggs, where),
      Map(
        "mview.source" -> sourceRoot,
        "mview.group" -> groupCols.mkString(","),
        "mview.aggs" -> aggSpec,
        "mview.source_version" -> srcTip.toString) ++
        where.map("mview.where" -> _))
  }

  /** Refresh result: the MV's new version, the source version the
    * content now folds up to, the number of groups the refresh touched,
    * and the mode — `noop` (already fresh), `incremental` (folded the
    * change feed), or `full` (feed inexpressible across the window;
    * recomputed from the snapshot).
    */
  final case class Refresh(mvVersion: Long, sourceVersion: Long,
      changedGroups: Long, mode: String)

  private def definitionOf(props: Map[String, String],
      mvRoot: String): (String, Seq[String], Seq[AggDef], Option[String], Long) = {
    def need(k: String) = props.getOrElse(k, throw new IllegalArgumentException(
      s"mview: $mvRoot is not a materialized view — missing property $k"))
    (need("mview.source"),
      need("mview.group").split(',').toSeq.map(_.trim),
      parseAggs(need("mview.aggs")),
      props.get("mview.where"),
      need("mview.source_version").toLong)
  }

  /** Incremental refresh: fold `tableChanges(source, folded, tip)` into
    * the stored content and publish content + marker in ONE commit.
    * Cost is O(changes) + O(|MV|) — never O(source).
    */
  def refresh(spark: SparkSession, mvRoot: String): Refresh = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val (srcRoot, groupCols, aggs, where, folded) = definitionOf(props, mvRoot)
    val srcVs = VersionedTable.versions(spark, srcRoot)
    require(srcVs.nonEmpty, s"mview: source table vanished at $srcRoot")
    val tip = srcVs.last
    if (tip == folded)
      return Refresh(VersionedTable.versions(spark, mvRoot).last, tip, 0L, "noop")
    require(tip > folded,
      s"mview: source tip $tip is BEHIND the folded version $folded — " +
        "the source history was rewritten; drop and recreate the view")

    val cntName = aggs.collect { case CountAgg(n) => n }.head
    val cur = VersionedTable.readAt(spark, mvRoot)
    val mvSchema = cur.schema

    def publish(content: DataFrame, changedGroups: Long, mode: String): Refresh = {
      // cast back to the STORED schema: decimal `+` widens precision, and
      // without this pin each refresh would widen the column types again
      val fitted = content.select(mvSchema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      val v = VersionedTable.commit(spark, mvRoot, fitted, overwrite = true,
        meta = Map("prop:mview.source_version" -> tip.toString))
      Refresh(v, tip, changedGroups, mode)
    }

    val changes =
      try VersionedTable.tableChanges(spark, srcRoot, folded, tip)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("not expressible") =>
          // the window crosses a commit the feed cannot express
          // row-level: recompute from the snapshot (same result,
          // table-sized cost, honestly labeled)
          val full = fullAggregate(
            VersionedTable.readAt(spark, srcRoot, Some(tip)),
            groupCols, aggs, where)
          return publish(full, full.count(), "full")
      }

    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val signed = where.map(w => changes.filter(expr(w))).getOrElse(changes)
      .withColumn("__sign", sign)
    val deltaExprs = aggs.map {
      case CountAgg(n) => sum(col("__sign")).as(n)
      case SumAgg(n, c) =>
        sum(coalesce(col(c), lit(0)) * col("__sign")).as(n)
    }
    val deltas = signed.groupBy(groupCols.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)
      // an update that nets to zero inside the window still surfaces as
      // a pre/post pair; groups whose every agg nets to 0 fold as no-ops
      // and are dropped here so `changedGroups` reports real work
      .filter(aggs.map(a => col(a.name) =!= lit(0)).reduce(_ || _))
      .localCheckpoint(true) // bounded (touched groups); read 2× below
    val changed = deltas.count()
    if (changed == 0L) {
      // content unchanged — still publish, to move the marker atomically
      // with (identical) content; a marker-only setProperties would be a
      // second non-content commit shape readers must understand
      return publish(cur, 0L, "incremental")
    }

    // null-safe group equality: GROUP BY treats NULL as one group, so
    // the fold must too (a plain `===` would never match NULL keys and
    // duplicate their groups)
    val d = deltas.select(groupCols.map(c => col(c).as(s"__d_$c")) ++
      aggs.map(a => col(a.name).as(s"__d_${a.name}")): _*)
    val joinCond = groupCols.map(c => cur(c) <=> d(s"__d_$c")).reduce(_ && _)
    val folded2 = cur.join(d, joinCond, "full_outer")
      .select(
        groupCols.map(c => coalesce(cur(c), d(s"__d_$c")).as(c)) ++
          aggs.map { a =>
            (coalesce(cur(a.name), lit(0)) +
              coalesce(d(s"__d_${a.name}"), lit(0))).as(a.name)
          }: _*)
      .filter(col(cntName).cast(LongType) > 0L)
    publish(folded2, changed, "incremental")
  }

  /** Freshness ledger: (folded source version, source tip, stale?). */
  def status(spark: SparkSession, mvRoot: String): (Long, Long, Boolean) = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val (srcRoot, _, _, _, folded) = definitionOf(props, mvRoot)
    val tip = VersionedTable.versions(spark, srcRoot).last
    (folded, tip, tip != folded)
  }
}
