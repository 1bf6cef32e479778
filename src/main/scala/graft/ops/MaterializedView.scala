package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

/** MATERIALIZED VIEWS over versioned tables, refreshed INCREMENTALLY
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
  *  - `mview.source2` — (join MVs) root path of the second source
  *  - `mview.join`   — (join MVs) equi-join keys, `lcol=rcol` comma list
  *  - `mview.group`  — comma-joined GROUP BY columns
  *  - `mview.aggs`   — the aggregate list: `name:count` / `name:sum(col)`
  *                     / `name:min(col)` / `name:max(col)`
  *  - `mview.where`  — optional SQL row predicate applied before the agg
  *  - `mview.source_version` (+ `mview.source2_version` for join MVs) —
  *    the source version(s) the content folds up to
  *
  * so the definition travels with the data, the MV content time-travels
  * like any table, and the refresh marker(s) commit ATOMICALLY with the
  * refreshed content (one manifest publish carries both — a crash can
  * never leave content that double-folds the same delta window on the
  * next refresh).
  *
  * Refresh algebra (classic retractable IVM):
  *
  *  - every change row carries a sign: +1 for insert/update_postimage,
  *    -1 for delete/update_preimage ([[VersionedTable.tableChanges]]
  *    emits exact multiset pre/post images);
  *  - `count` folds as sum(sign); `sum(x)` folds as
  *    sum(coalesce(x,0)*sign) — NULL addends contribute 0, so a group
  *    whose every x is NULL reports 0 (declared semantics: the
  *    IVM-sound reading of SUM; mirror oracles with
  *    `sum(coalesce(x,0))`);
  *  - `min(x)` / `max(x)` fold HYBRID: a group whose window is
  *    insert-only folds as least/greatest(current, min/max of inserted
  *    values) — no rescan ever; a group touched by ANY retraction
  *    recomputes its min/max from the (tip) source restricted to
  *    exactly the retracted groups (a retraction can remove the extreme
  *    value, which no per-group scalar can undo) — O(affected groups),
  *    honestly reported via `Refresh.recomputedGroups`;
  *  - groups whose folded count reaches 0 are REMOVED (the count agg is
  *    mandatory for exactly this liveness decision);
  *  - the fold output is cast back to the MV's STORED schema, so
  *    decimal-widening `+` can never drift the column types across
  *    refreshes.
  *
  * JOIN MVs (`fact ⋈ dim GROUP BY …` — the first MV a real dashboard
  * needs) use the classic bilinear delta identity (the same algebra
  * q71/`ops/Relational5.scala` proves for incremental join
  * maintenance):
  *
  * {{{ Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB }}}
  *
  * with the sign of a joined row the PRODUCT of its inputs' signs.
  * Versioned sources make this free: `A_old`/`B_old` are time-travel
  * reads at the folded markers, the deltas are each side's change feed
  * — so one refresh costs O(ΔA ⋈ B) + O(A ⋈ ΔB), never a recompute of
  * the whole join. Each side's freshness marker commits atomically with
  * the content in the ONE manifest publish.
  *
  * Sums should be staged in DECIMAL ([[Q.dec2]]) when exactness
  * matters: decimal addition is associative, so an incremental fold is
  * bit-identical to a full recompute; double sums are order-dependent
  * and only reproducible approximately.
  *
  * When a delta window crosses a commit the change feed cannot express
  * row-level (RESTORE; feeds refuse with "not expressible"), refresh
  * falls back to a FULL recompute from the source snapshot(s) — same
  * result, table-sized cost, reported as `mode = "full"` so operators
  * see the economics they got.
  */
object MaterializedView {

  /** One aggregate of the MV definition. */
  sealed trait AggDef { def name: String }
  final case class CountAgg(name: String) extends AggDef
  final case class SumAgg(name: String, col: String) extends AggDef
  final case class MinAgg(name: String, col: String) extends AggDef
  final case class MaxAgg(name: String, col: String) extends AggDef

  /** Parse `"cnt:count, rev:sum(price), lo:min(price)"`. Exactly one
    * `count` is required (group liveness); anything else refuses loudly
    * (avg derives as sum/count at read).
    */
  def parseAggs(spec: String): Seq[AggDef] = {
    val SumRe = """(?i)sum\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val MinRe = """(?i)min\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val MaxRe = """(?i)max\(([A-Za-z_][A-Za-z0-9_]*)\)""".r
    val parsed = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { a =>
      a.split(':') match {
        case Array(n, f) if f.trim.equalsIgnoreCase("count") =>
          CountAgg(n.trim)
        case Array(n, SumRe(c)) => SumAgg(n.trim, c)
        case Array(n, MinRe(c)) => MinAgg(n.trim, c)
        case Array(n, MaxRe(c)) => MaxAgg(n.trim, c)
        case _ => throw new IllegalArgumentException(
          s"mview: unsupported aggregate '$a' — the maintainable surface " +
            "is 'name:count', 'name:sum(col)', 'name:min(col)' and " +
            "'name:max(col)' (avg = sum/count at read)")
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

  private def aggInputCols(aggs: Seq[AggDef]): Seq[String] = aggs.collect {
    case SumAgg(_, c) => c
    case MinAgg(_, c) => c
    case MaxAgg(_, c) => c
  }

  private def fullAggregate(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggDef], where: Option[String]): DataFrame = {
    val filtered = where.map(w => src.filter(expr(w))).getOrElse(src)
    val exprs = aggs.map {
      case CountAgg(n) => count(lit(1)).as(n)
      case SumAgg(n, c) => sum(coalesce(col(c), lit(0))).as(n)
      case MinAgg(n, c) => min(col(c)).as(n)
      case MaxAgg(n, c) => max(col(c)).as(n)
    }
    filtered.groupBy(groupCols.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  // the complete MV definition as read back from TBLPROPERTIES
  private final case class MvDef(source: String, source2: Option[String],
      joinKeys: Seq[(String, String)], groupCols: Seq[String],
      aggs: Seq[AggDef], where: Option[String],
      folded: Long, folded2: Option[Long])

  private def parseJoinKeys(spec: String): Seq[(String, String)] = {
    val ks = spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
      p.split('=') match {
        case Array(l, r) if l.trim.nonEmpty && r.trim.nonEmpty =>
          (l.trim, r.trim)
        case _ => throw new IllegalArgumentException(
          s"mview: bad join key '$p' — expected 'leftCol=rightCol'")
      }
    }
    require(ks.nonEmpty, "mview: empty join key list")
    ks
  }

  // the MV's semantic source frame at the given version(s): the single
  // table, or the inner equi-join of the two — WHERE is applied by the
  // aggregate, not here (it may reference both sides' columns)
  private def sourceFrame(spark: SparkSession, d: MvDef,
      vA: Option[Long], vB: Option[Long]): DataFrame = {
    val a = VersionedTable.readAt(spark, d.source, vA)
    d.source2 match {
      case None => a
      case Some(s2) =>
        val b = VersionedTable.readAt(spark, s2, vB)
        joinFrames(a, b, d.joinKeys)
    }
  }

  // plain inner equi-join (SQL semantics: NULL keys never match) — the
  // full recompute and every delta term use the SAME join shape, so the
  // bilinear identity holds exactly
  private def joinFrames(a: DataFrame, b: DataFrame,
      keys: Seq[(String, String)]): DataFrame =
    a.join(b, keys.map { case (l, r) => a(l) === b(r) }.reduce(_ && _),
      "inner")

  private def validateDefinition(src: DataFrame, groupCols: Seq[String],
      aggs: Seq[AggDef], where: Option[String]): Unit = {
    val missing = (groupCols ++ aggInputCols(aggs))
      .filterNot(c => src.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"mview: source has no column ${missing.mkString(",")}")
    // the WHERE text must analyze against the source NOW — a typo'd
    // predicate must refuse at create, not at the first refresh
    where.foreach(w => src.filter(expr(w)).queryExecution.analyzed)
  }

  /** Create a single-table MV: full initial aggregate of the source tip,
    * committed with the definition + freshness marker as creation
    * properties. Returns false if a table already exists at `mvRoot`
    * (the createIfAbsent contract).
    */
  def create(spark: SparkSession, mvRoot: String, sourceRoot: String,
      groupCols: Seq[String], aggSpec: String,
      where: Option[String] = None): Boolean = {
    require(groupCols.nonEmpty, "mview: need at least one GROUP BY column")
    val aggs = parseAggs(aggSpec)
    requireNoClash(aggs, groupCols)
    val srcVs = VersionedTable.versions(spark, sourceRoot)
    require(srcVs.nonEmpty, s"mview: no source table at $sourceRoot")
    val srcTip = srcVs.last
    val src = VersionedTable.readAt(spark, sourceRoot, Some(srcTip))
    validateDefinition(src, groupCols, aggs, where)
    VersionedTable.createIfAbsent(spark, mvRoot,
      fullAggregate(src, groupCols, aggs, where),
      Map(
        "mview.source" -> sourceRoot,
        "mview.group" -> groupCols.mkString(","),
        "mview.aggs" -> aggSpec,
        "mview.source_version" -> srcTip.toString) ++
        where.map("mview.where" -> _))
  }

  /** Create a JOIN MV — a grouped aggregate over the inner equi-join of
    * two versioned tables (`fact ⋈ dim GROUP BY …`), maintained
    * incrementally from BOTH sources' change feeds via the bilinear
    * delta identity (see the object doc). The two schemas must be
    * column-disjoint (so the joined frame is unambiguous); `joinOn`
    * pairs are `(leftCol, rightCol)`. Returns false if a table already
    * exists at `mvRoot`.
    */
  def createJoin(spark: SparkSession, mvRoot: String, leftRoot: String,
      rightRoot: String, joinOn: Seq[(String, String)],
      groupCols: Seq[String], aggSpec: String,
      where: Option[String] = None): Boolean = {
    require(groupCols.nonEmpty, "mview: need at least one GROUP BY column")
    require(joinOn.nonEmpty, "mview: need at least one join key pair")
    val aggs = parseAggs(aggSpec)
    requireNoClash(aggs, groupCols)
    val lVs = VersionedTable.versions(spark, leftRoot)
    val rVs = VersionedTable.versions(spark, rightRoot)
    require(lVs.nonEmpty, s"mview: no source table at $leftRoot")
    require(rVs.nonEmpty, s"mview: no source table at $rightRoot")
    val (tipL, tipR) = (lVs.last, rVs.last)
    val a = VersionedTable.readAt(spark, leftRoot, Some(tipL))
    val b = VersionedTable.readAt(spark, rightRoot, Some(tipR))
    val overlap = a.columns.map(_.toLowerCase).toSet
      .intersect(b.columns.map(_.toLowerCase).toSet)
    require(overlap.isEmpty,
      s"mview: join sources share column name(s) ${overlap.mkString(",")}" +
        " — the joined frame would be ambiguous; rename one side first")
    joinOn.foreach { case (l, r) =>
      require(a.columns.exists(_.equalsIgnoreCase(l)),
        s"mview: left source has no join column $l")
      require(b.columns.exists(_.equalsIgnoreCase(r)),
        s"mview: right source has no join column $r")
    }
    val joined = joinFrames(a, b, joinOn)
    validateDefinition(joined, groupCols, aggs, where)
    VersionedTable.createIfAbsent(spark, mvRoot,
      fullAggregate(joined, groupCols, aggs, where),
      Map(
        "mview.source" -> leftRoot,
        "mview.source2" -> rightRoot,
        "mview.join" -> joinOn.map { case (l, r) => s"$l=$r" }.mkString(","),
        "mview.group" -> groupCols.mkString(","),
        "mview.aggs" -> aggSpec,
        "mview.source_version" -> tipL.toString,
        "mview.source2_version" -> tipR.toString) ++
        where.map("mview.where" -> _))
  }

  private def requireNoClash(aggs: Seq[AggDef], groupCols: Seq[String]): Unit = {
    val clash = aggs.map(_.name.toLowerCase)
      .intersect(groupCols.map(_.toLowerCase))
    require(clash.isEmpty,
      s"mview: aggregate name ${clash.mkString(",")} collides with a " +
        "group column")
  }

  /** Refresh result: the MV's new version, the source version(s) the
    * content now folds up to, the number of groups the refresh touched,
    * the mode — `noop` (already fresh), `incremental` (folded the change
    * feed), or `full` (feed inexpressible across the window; recomputed
    * from the snapshot) — and how many groups needed a min/max
    * recompute (0 for append-only windows and count/sum-only MVs).
    */
  final case class Refresh(mvVersion: Long, sourceVersion: Long,
      changedGroups: Long, mode: String, recomputedGroups: Long = 0L,
      source2Version: Option[Long] = None)

  private def definitionOf(props: Map[String, String],
      mvRoot: String): MvDef = {
    def need(k: String) = props.getOrElse(k, throw new IllegalArgumentException(
      s"mview: $mvRoot is not a materialized view — missing property $k"))
    val source2 = props.get("mview.source2")
    MvDef(need("mview.source"), source2,
      source2.map(_ => parseJoinKeys(need("mview.join"))).getOrElse(Nil),
      need("mview.group").split(',').toSeq.map(_.trim),
      parseAggs(need("mview.aggs")),
      props.get("mview.where"),
      need("mview.source_version").toLong,
      source2.map(_ => need("mview.source2_version").toLong))
  }

  // a signed change frame: +1 insert/update_postimage, -1 delete/
  // update_preimage, CDF meta columns dropped
  private def signed(changes: DataFrame, signCol: String): DataFrame =
    changes.withColumn(signCol,
      when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L)))
      .drop("_change_type", "_commit_version")

  /** Incremental refresh: fold the source change feed(s) since the
    * folded marker(s) into the stored content and publish content +
    * marker(s) in ONE commit. Cost: single-table MVs O(changes) +
    * O(|MV|); join MVs O(ΔA⋈B) + O(A⋈ΔB) + O(|MV|) — never a recompute
    * of the source join. Min/max retraction groups add one scan
    * restricted to exactly those groups.
    */
  def refresh(spark: SparkSession, mvRoot: String): Refresh = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val d = definitionOf(props, mvRoot)
    val vsA = VersionedTable.versions(spark, d.source)
    require(vsA.nonEmpty, s"mview: source table vanished at ${d.source}")
    val tipA = vsA.last
    val tipB = d.source2.map { s2 =>
      val vs = VersionedTable.versions(spark, s2)
      require(vs.nonEmpty, s"mview: source table vanished at $s2")
      vs.last
    }
    if (tipA == d.folded && tipB == d.folded2)
      return Refresh(VersionedTable.versions(spark, mvRoot).last, tipA, 0L,
        "noop", 0L, tipB)
    require(tipA >= d.folded && tipB.zip(d.folded2).forall(t => t._1 >= t._2),
      s"mview: a source tip is BEHIND its folded marker " +
        s"(source $tipA vs ${d.folded}" +
        tipB.map(t => s", source2 $t vs ${d.folded2.get}").getOrElse("") +
        ") — the source history was rewritten; drop and recreate the view")

    val cur = VersionedTable.readAt(spark, mvRoot)
    val mvSchema = cur.schema

    def publish(content: DataFrame, changedGroups: Long, mode: String,
        recomputed: Long): Refresh = {
      // cast back to the STORED schema: decimal `+` widens precision, and
      // without this pin each refresh would widen the column types again
      val fitted = content.select(mvSchema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      val markers = Map("prop:mview.source_version" -> tipA.toString) ++
        tipB.map(t => "prop:mview.source2_version" -> t.toString)
      val v = VersionedTable.commit(spark, mvRoot, fitted, overwrite = true,
        meta = markers)
      Refresh(v, tipA, changedGroups, mode, recomputed, tipB)
    }

    def fullRecompute(): Refresh = {
      val full = fullAggregate(sourceFrame(spark, d, Some(tipA), tipB),
        d.groupCols, d.aggs, d.where)
      publish(full, full.count(), "full", 0L)
    }

    def changesOf(root: String, from: Long, to: Long): DataFrame =
      VersionedTable.tableChanges(spark, root, from, to)

    // the signed delta of the MV's SOURCE FRAME across the window —
    // single table: the change feed; join: the bilinear identity
    val signedDelta: DataFrame =
      try {
        d.source2 match {
          case None =>
            signed(changesOf(d.source, d.folded, tipA), "__sign")
          case Some(s2) =>
            val keys = d.joinKeys
            val dA =
              if (tipA == d.folded) None
              else Some(signed(changesOf(d.source, d.folded, tipA), "__sa")
                .localCheckpoint(true)) // window-sized; joined twice below
            val dB =
              if (tipB.get == d.folded2.get) None
              else Some(signed(changesOf(s2, d.folded2.get, tipB.get), "__sb")
                .localCheckpoint(true))
            val aOld = VersionedTable.readAt(spark, d.source, Some(d.folded))
            val bOld = VersionedTable.readAt(spark, s2, d.folded2)
            val outCols = (d.groupCols ++ aggInputCols(d.aggs)).distinct
            def term(df: DataFrame, sign: Column): DataFrame =
              df.select(outCols.map(col) :+ sign.as("__sign"): _*)
            val terms = Seq(
              dA.map(a => term(joinFrames(a, bOld, keys), col("__sa"))),
              dB.map(b => term(joinFrames(aOld, b, keys), col("__sb"))),
              dA.zip(dB).map { case (a, b) =>
                term(joinFrames(a, b, keys), col("__sa") * col("__sb")) }
            ).flatten
            terms.reduce(_ unionByName _)
        }
      } catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("not expressible") =>
          // a window crosses a commit the feed cannot express row-level
          // (RESTORE): recompute from the snapshots (same result,
          // table-sized cost, honestly labeled)
          return fullRecompute()
      }

    val filtered = d.where.map(w => signedDelta.filter(expr(w)))
      .getOrElse(signedDelta)
    val hasMinMax = d.aggs.exists(a =>
      a.isInstanceOf[MinAgg] || a.isInstanceOf[MaxAgg])
    val deltaExprs = d.aggs.map {
      case CountAgg(n) => sum(col("__sign")).as(n)
      case SumAgg(n, c) =>
        sum(coalesce(col(c), lit(0)) * col("__sign")).as(n)
      // min/max deltas consider INSERTED values only; retractions set
      // the per-group flag below and route to the recompute path
      case MinAgg(n, c) => min(when(col("__sign") > 0, col(c))).as(n)
      case MaxAgg(n, c) => max(when(col("__sign") > 0, col(c))).as(n)
    } ++ (if (hasMinMax)
      Seq(max(when(col("__sign") < 0, lit(1)).otherwise(lit(0)))
        .as("__retract"))
    else Nil)
    val changedCond = {
      val addFold = d.aggs.collect {
        case CountAgg(n) => col(n) =!= lit(0)
        case SumAgg(n, _) => col(n) =!= lit(0)
      }
      val mm = d.aggs.collect {
        case MinAgg(n, _) => col(n).isNotNull
        case MaxAgg(n, _) => col(n).isNotNull
      }
      val rt = if (hasMinMax) Seq(col("__retract") === 1) else Nil
      (addFold ++ mm ++ rt).reduce(_ || _)
    }
    val deltas = filtered.groupBy(d.groupCols.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)
      // an update that nets to zero inside the window still surfaces as
      // a pre/post pair; groups whose every agg nets to 0 (and, with
      // min/max declared, saw no retraction and no inserted value) fold
      // as no-ops and are dropped here so `changedGroups` reports real
      // work
      .filter(changedCond)
      .localCheckpoint(true) // bounded (touched groups); read below
    val changed = deltas.count()
    if (changed == 0L) {
      // content unchanged — still publish, to move the marker atomically
      // with (identical) content; a marker-only setProperties would be a
      // second non-content commit shape readers must understand
      return publish(cur, 0L, "incremental", 0L)
    }

    // min/max HYBRID: groups touched by a retraction recompute their
    // min/max from the tip source restricted to exactly those groups —
    // bounded by the delta's group count, never a table scan
    val cntName = d.aggs.collect { case CountAgg(n) => n }.head
    val recGroups =
      if (hasMinMax) deltas.filter(col("__retract") === 1) else null
    val recCount = if (hasMinMax) recGroups.count() else 0L
    val rec: Option[DataFrame] =
      if (recCount == 0L) None
      else {
        val g = recGroups.select(d.groupCols.map(c =>
          col(c).as(s"__g_$c")): _*)
        val srcNew = {
          val f = sourceFrame(spark, d, Some(tipA), tipB)
          d.where.map(w => f.filter(expr(w))).getOrElse(f)
        }
        // null-safe: GROUP BY treats NULL as one group
        val cond = d.groupCols.map(c => srcNew(c) <=> g(s"__g_$c"))
          .reduce(_ && _)
        val mmExprs = d.aggs.collect {
          case MinAgg(n, c) => min(col(c)).as(s"__r_$n")
          case MaxAgg(n, c) => max(col(c)).as(s"__r_$n")
        }
        Some(srcNew.join(broadcast(g), cond, "inner")
          .groupBy(d.groupCols.map(col): _*)
          .agg(mmExprs.head, mmExprs.tail: _*))
      }

    // null-safe group equality throughout: GROUP BY treats NULL as one
    // group, so the fold must too (a plain `===` would never match NULL
    // keys and duplicate their groups)
    val dcols = deltas.select(d.groupCols.map(c => col(c).as(s"__d_$c")) ++
      d.aggs.map(a => col(a.name).as(s"__d_${a.name}")) ++
      (if (hasMinMax) Seq(col("__retract").as("__d_retract")) else Nil): _*)
    val joinCond = d.groupCols.map(c => cur(c) <=> dcols(s"__d_$c"))
      .reduce(_ && _)
    val merged = cur.join(dcols, joinCond, "full_outer")
    val withRec = rec match {
      case None => merged
      case Some(r) =>
        val rr = r.select(d.groupCols.map(c => col(c).as(s"__rg_$c")) ++
          d.aggs.collect {
            case MinAgg(n, _) => col(s"__r_$n")
            case MaxAgg(n, _) => col(s"__r_$n")
          }: _*)
        val rc = d.groupCols.map(c =>
          coalesce(cur(c), dcols(s"__d_$c")) <=> rr(s"__rg_$c"))
          .reduce(_ && _)
        merged.join(rr, rc, "left_outer")
    }
    val foldedContent = withRec.select(
      d.groupCols.map(c => coalesce(cur(c), dcols(s"__d_$c")).as(c)) ++
        d.aggs.map {
          case CountAgg(n) =>
            (coalesce(cur(n), lit(0)) +
              coalesce(dcols(s"__d_$n"), lit(0))).as(n)
          case SumAgg(n, _) =>
            (coalesce(cur(n), lit(0)) +
              coalesce(dcols(s"__d_$n"), lit(0))).as(n)
          case MinAgg(n, _) =>
            val ins = least(cur(n), dcols(s"__d_$n")) // least skips NULLs
            (if (rec.isDefined)
              when(dcols("__d_retract") === 1, withRec(s"__r_$n"))
                .otherwise(ins)
            else ins).as(n)
          case MaxAgg(n, _) =>
            val ins = greatest(cur(n), dcols(s"__d_$n"))
            (if (rec.isDefined)
              when(dcols("__d_retract") === 1, withRec(s"__r_$n"))
                .otherwise(ins)
            else ins).as(n)
        }: _*)
      .filter(col(cntName).cast(LongType) > 0L)
    publish(foldedContent, changed, "incremental", recCount)
  }

  /** Freshness ledger: (folded source version, source tip, stale?). For
    * join MVs the pair reports the FIRST source; `stale` accounts for
    * both sides (either tip moving makes the view stale).
    */
  def status(spark: SparkSession, mvRoot: String): (Long, Long, Boolean) = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val d = definitionOf(props, mvRoot)
    val tip = VersionedTable.versions(spark, d.source).last
    val stale2 = d.source2.exists(s2 =>
      VersionedTable.versions(spark, s2).last != d.folded2.get)
    (d.folded, tip, tip != d.folded || stale2)
  }

  /** STREAMING-DRIVEN AUTO-REFRESH: the source's native CDC tail
    * ([[graft.sources.VTableSource]] with `readChangeFeed` — row-level
    * commits FLOW instead of failing the stream) drives one
    * [[refresh]] per micro-batch, so the MV follows the source at the
    * trigger cadence with no operator in the loop. Replay safety needs
    * no extra bookkeeping: a restarted query re-delivers its last batch,
    * `refresh` consults the marker and answers `noop` without
    * committing — the marker IS the idempotence stamp, carried
    * atomically with content. Batches where the source did not move
    * never fire (the source reports no new offsets), so an idle table
    * costs nothing. For join MVs the tail follows the FIRST source;
    * every triggered refresh still folds BOTH sides to their tips (a
    * dim-only change is picked up by the next fact-side trigger — the
    * fact side is the high-traffic side by construction). The batch
    * frame itself is never read: the tail is the TRIGGER, the refresh
    * reads the feed through its own windowed `tableChanges` (which also
    * keeps the fallback-to-full path for feed-inexpressible commits).
    */
  def autoRefresh(spark: SparkSession, mvRoot: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val d = definitionOf(props, mvRoot)
    // explicit function value: the (DataFrame, Long) foreachBatch
    // overload is ambiguous against the Java VoidFunction2 one for
    // inline lambdas under Scala 2.13
    val perBatch: (DataFrame, Long) => Unit =
      (_, _) => { refresh(spark, mvRoot); () }
    spark.readStream.format("graft-vtable")
      .option("readChangeFeed", "true")
      .load(d.source)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(perBatch)
      .trigger(trigger)
      .start()
  }
}
