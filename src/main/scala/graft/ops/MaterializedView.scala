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

  // one source of the MV's join chain: its table root, the equi-join
  // keys attaching it to the ACCUMULATED join of all earlier sources
  // (empty for the first source), and the folded freshness marker
  private final case class MvSource(root: String,
      joinKeys: Seq[(String, String)], folded: Long)

  // the complete MV definition as read back from TBLPROPERTIES
  private final case class MvDef(sources: Seq[MvSource],
      groupCols: Seq[String], aggs: Seq[AggDef], where: Option[String]) {
    def source: String = sources.head.root
    def folded: Long = sources.head.folded
  }

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

  // the MV's semantic source frame at the given per-source versions:
  // the single table, or the LEFT-DEEP chain of inner equi-joins —
  // WHERE is applied by the aggregate, not here (it may reference any
  // side's columns)
  private def sourceFrame(spark: SparkSession, d: MvDef,
      vs: Seq[Option[Long]]): DataFrame =
    d.sources.zip(vs).map { case (s, v) =>
      (VersionedTable.readAt(spark, s.root, v), s.joinKeys)
    }.reduceLeft[(DataFrame, Seq[(String, String)])] {
      case ((acc, _), (next, keys)) => (joinFrames(acc, next, keys), Nil)
    }._1

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
      fullAggregate(src, groupCols, aggs, where).hint("rebalance"),
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
      where: Option[String] = None): Boolean =
    createJoinChain(spark, mvRoot, leftRoot, Seq((rightRoot, joinOn)),
      groupCols, aggSpec, where)

  /** Create an N-TABLE join MV — a grouped aggregate over a LEFT-DEEP
    * chain of inner equi-joins (`fact ⋈ dim1 ⋈ dim2 ⋈ …` — the q03
    * star as a view), maintained incrementally from EVERY source's
    * change feed by folding the bilinear delta identity pairwise over
    * the chain: with X = A⋈B already maintained, Δ(X⋈C) = ΔX⋈C_old ∪
    * X_old⋈ΔC ∪ ΔX⋈ΔC, signs multiplying through. `chain` lists the
    * sources joined onto `firstRoot` in order; each entry's key pairs
    * are `(leftCol, rightCol)` where leftCol may come from ANY earlier
    * source (the accumulated join) and rightCol from the entry's own
    * table. All schemas must be pairwise column-disjoint. Returns false
    * if a table already exists at `mvRoot`.
    */
  def createJoinChain(spark: SparkSession, mvRoot: String,
      firstRoot: String, chain: Seq[(String, Seq[(String, String)])],
      groupCols: Seq[String], aggSpec: String,
      where: Option[String] = None): Boolean = {
    require(groupCols.nonEmpty, "mview: need at least one GROUP BY column")
    require(chain.nonEmpty, "mview: a join MV needs at least two sources")
    chain.foreach { case (r, ks) =>
      require(ks.nonEmpty, s"mview: no join keys attaching $r") }
    val aggs = parseAggs(aggSpec)
    requireNoClash(aggs, groupCols)
    val roots = firstRoot +: chain.map(_._1)
    val tips = roots.map { r =>
      val vs = VersionedTable.versions(spark, r)
      require(vs.nonEmpty, s"mview: no source table at $r")
      vs.last
    }
    val frames = roots.zip(tips).map { case (r, t) =>
      VersionedTable.readAt(spark, r, Some(t)) }
    // pairwise column-disjoint, so the chained frame is unambiguous
    frames.zip(roots).combinations(2).foreach {
      case Seq((fa, ra), (fb, rb)) =>
        val overlap = fa.columns.map(_.toLowerCase).toSet
          .intersect(fb.columns.map(_.toLowerCase).toSet)
        require(overlap.isEmpty,
          s"mview: join sources $ra and $rb share column name(s) " +
            s"${overlap.mkString(",")} — the joined frame would be " +
            "ambiguous; rename one side first")
      case _ => ()
    }
    // each step's left key must resolve in the ACCUMULATED columns,
    // the right key in the step's own source
    val joined = chain.zipWithIndex.foldLeft(frames.head) {
      case (acc, ((_, keys), i)) =>
        val b = frames(i + 1)
        keys.foreach { case (l, r) =>
          require(acc.columns.exists(_.equalsIgnoreCase(l)),
            s"mview: no earlier source has join column $l")
          require(b.columns.exists(_.equalsIgnoreCase(r)),
            s"mview: source ${roots(i + 1)} has no join column $r")
        }
        joinFrames(acc, b, keys)
    }
    validateDefinition(joined, groupCols, aggs, where)
    // property layout: the 2-table names stay as r17 wrote them
    // (source2/join/source2_version — existing MVs read back unchanged);
    // sources 3+ ride mview.source<i>/mview.join<i>/mview.source<i>_version
    val srcProps = chain.zipWithIndex.flatMap { case ((r, ks), i) =>
      val n = i + 2
      val (srcKey, joinKey) =
        if (n == 2) ("mview.source2", "mview.join")
        else (s"mview.source$n", s"mview.join$n")
      Seq(srcKey -> r,
        joinKey -> ks.map { case (l, rc) => s"$l=$rc" }.mkString(","),
        s"mview.source${n}_version" -> tips(i + 1).toString)
    }
    VersionedTable.createIfAbsent(spark, mvRoot,
      fullAggregate(joined, groupCols, aggs, where).hint("rebalance"),
      Map(
        "mview.source" -> firstRoot,
        "mview.group" -> groupCols.mkString(","),
        "mview.aggs" -> aggSpec,
        "mview.source_version" -> tips.head.toString) ++
        srcProps ++ where.map("mview.where" -> _))
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
    val first = MvSource(need("mview.source"), Nil,
      need("mview.source_version").toLong)
    // source 2 keeps the r17 property names; 3+ are numbered throughout
    val rest = Iterator.from(2).map { n =>
      val (srcKey, joinKey) =
        if (n == 2) ("mview.source2", "mview.join")
        else (s"mview.source$n", s"mview.join$n")
      props.get(srcKey).map(r => MvSource(r, parseJoinKeys(need(joinKey)),
        need(s"mview.source${n}_version").toLong))
    }.takeWhile(_.isDefined).flatten.toSeq
    MvDef(first +: rest,
      need("mview.group").split(',').toSeq.map(_.trim),
      parseAggs(need("mview.aggs")),
      props.get("mview.where"))
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
    val tips = d.sources.map { s =>
      val vs = VersionedTable.versions(spark, s.root)
      require(vs.nonEmpty, s"mview: source table vanished at ${s.root}")
      vs.last
    }
    val tipA = tips.head
    val tipB = if (d.sources.size > 1) Some(tips(1)) else None
    if (d.sources.map(_.folded) == tips)
      return Refresh(VersionedTable.versions(spark, mvRoot).last, tipA, 0L,
        "noop", 0L, tipB)
    d.sources.zip(tips).foreach { case (s, t) =>
      require(t >= s.folded,
        s"mview: source ${s.root} tip $t is BEHIND its folded marker " +
          s"${s.folded} — the source history was rewritten; drop and " +
          "recreate the view")
    }

    val cur = VersionedTable.readAt(spark, mvRoot)
    val mvSchema = cur.schema

    // CASCADING REFRESH: publish carries the refresh's own row-level
    // delta as the commit's RECORDED CDF (old row → update_preimage /
    // delete, new row → update_postimage / insert, per changed group),
    // so an MV sourcing THIS MV — the bronze→silver→gold medallion
    // chain — folds O(changed groups) from `tableChanges` instead of
    // refusing on the overwrite shape and recomputing in full. The
    // caller supplies the delta (the incremental fold derives it from
    // the SAME join it already pays — no second pass; full mode diffs
    // old-vs-new content); None = provably no row changes (`cdf_none`).
    def publish(content: DataFrame, changedGroups: Long, mode: String,
        recomputed: Long, delta: Option[DataFrame]): Refresh = {
      // cast back to the STORED schema: decimal `+` widens precision, and
      // without this pin each refresh would widen the column types again.
      // REBALANCE before the write (AQE-adaptive file sizing): the folded
      // content inherits the full_outer join's shuffle partitioning — at
      // local[32] that is 32 near-empty parquet files per refresh, each a
      // footer the commit harvest and every later read of the MV pays
      // for; a grouped aggregate has no deliberate clustering to
      // preserve, so the rebalance costs one bounded shuffle of the MV
      // (O(groups)) and lands advisory-sized files at any scale.
      val fitted = content.select(mvSchema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*).hint("rebalance")
      val markers = d.sources.indices.map { i =>
        val key = if (i == 0) "prop:mview.source_version"
          else s"prop:mview.source${i + 1}_version"
        key -> tips(i).toString
      }.toMap
      val v = delta match {
        case Some(df) if !df.isEmpty =>
          VersionedTable.commit(spark, mvRoot, fitted, overwrite = true,
            meta = markers, cdf = Some(df))
        case _ =>
          VersionedTable.commit(spark, mvRoot, fitted, overwrite = true,
            meta = markers + ("cdf_none" -> "true"))
      }
      Refresh(v, tipA, changedGroups, mode, recomputed, tipB)
    }

    def fullRecompute(): Refresh = {
      // materialized once: consumed by the content write, the count AND
      // the old-vs-new diff that keeps the DOWNSTREAM tier incremental
      // even though this tier recomputed
      val full = fullAggregate(sourceFrame(spark, d, tips.map(Some(_))),
          d.groupCols, d.aggs, d.where)
        .select(mvSchema.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        .localCheckpoint(true)
      val delta = refreshDelta(cur, full, d.groupCols, d.aggs.map(_.name))
        .hint("rebalance")
        .localCheckpoint(true)
      publish(full, full.count(), "full", 0L, Some(delta))
    }

    def changesOf(root: String, from: Long, to: Long): DataFrame =
      VersionedTable.tableChanges(spark, root, from, to)

    // the signed delta of the MV's SOURCE FRAME across the window —
    // single table: the change feed; joins: the bilinear identity
    // Δ(X⋈Y) = ΔX⋈Y_old ∪ X_old⋈ΔY ∪ ΔX⋈ΔY folded PAIRWISE down the
    // left-deep chain (X = the accumulated join of all earlier sources),
    // joined-row signs the product of input signs. Per level the cost is
    // O(ΔX⋈Y) + O(X_old⋈ΔY) + O(ΔX⋈ΔY) — an unchanged source
    // contributes no terms (its delta is None), so a fact-only commit on
    // an N-way star costs one Δfact⋈dims chain, never a join recompute.
    val signedDelta: DataFrame =
      try {
        val perSource: Seq[Option[DataFrame]] =
          d.sources.zip(tips).zipWithIndex.map { case ((s, t), i) =>
            if (t == s.folded) None
            // window-sized checkpoint because each side's delta is
            // JOINED TWICE by the bilinear identity below — but a
            // single-table MV consumes its one delta exactly once, so
            // the checkpoint there was a pure extra job per refresh
            else if (d.sources.size == 1)
              Some(signed(changesOf(s.root, s.folded, t), s"__s$i"))
            else Some(signed(changesOf(s.root, s.folded, t), s"__s$i")
              .localCheckpoint(true))
          }
        if (d.sources.size == 1)
          perSource.head
            .map(_.withColumnRenamed("__s0", "__sign"))
            .getOrElse(sys.error(
              "mview: no source moved yet the noop gate did not fire"))
        else {
          val olds = d.sources.map(s =>
            VersionedTable.readAt(spark, s.root, Some(s.folded)))
          // accumulated (old frame, signed delta); delta sign column is
          // ALWAYS "__sacc" after each level
          val init: (DataFrame, Option[DataFrame]) = (olds.head,
            perSource.head.map(_.withColumnRenamed("__s0", "__sacc")))
          val (_, accDelta) = d.sources.zipWithIndex.drop(1)
            .foldLeft(init) { case ((xOld, dX), (s, i)) =>
              val yOld = olds(i)
              val dY = perSource(i)
              val terms = Seq(
                dX.map(x => joinFrames(x, yOld, s.joinKeys)),
                dY.map(y => joinFrames(xOld, y, s.joinKeys)
                  .withColumnRenamed(s"__s$i", "__sacc")),
                dX.zip(dY).map { case (x, y) =>
                  joinFrames(x, y, s.joinKeys)
                    .withColumn("__sacc", col("__sacc") * col(s"__s$i"))
                    .drop(s"__s$i")
                }).flatten
              val nextDelta = terms match {
                case Nil => None
                case ts =>
                  // columns are the union of both sides; every term
                  // carries the same set, __sacc included — checkpoint
                  // per level so N-way plans don't nest exponentially
                  Some(ts.map(_.select((xOld.columns ++ yOld.columns)
                      .map(col) :+ col("__sacc"): _*))
                    .reduce(_ unionByName _).localCheckpoint(true))
              }
              (joinFrames(xOld, yOld, s.joinKeys), nextDelta)
            }
          val outCols = (d.groupCols ++ aggInputCols(d.aggs)).distinct
          accDelta
            .map(_.select(outCols.map(col) :+
              col("__sacc").as("__sign"): _*))
            .getOrElse(sys.error(
              "mview: no source moved yet the noop gate did not fire"))
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
      // second non-content commit shape readers must understand. No
      // delta by construction — downstream consumers see `cdf_none`.
      return publish(cur, 0L, "incremental", 0L, None)
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
          val f = sourceFrame(spark, d, tips.map(Some(_)))
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
    // ONE materialization serves both outputs: the folded row set
    // (new values per group, old values passed through for unchanged
    // groups via the coalesces) PLUS the old values and the two
    // presence bits the recorded-CDF classification needs — so an
    // incremental refresh derives content AND its row-level delta from
    // the single join it already pays, never a second diff pass
    val combined = withRec.select(
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
        } ++
        d.aggs.map(a => cur(a.name).as(s"__old_${a.name}")) ++
        // the count column is non-null on every real row of either
        // side, so nullness IS presence
        Seq(cur(cntName).isNotNull.as("__was"),
          dcols(s"__d_$cntName").isNotNull.as("__chg")): _*)
      .localCheckpoint(true)

    val live = col(cntName).cast(LongType) > 0L
    // new-side values in the STORED types (the same cast publish pins)
    def newSide(ct: String) = mvSchema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)) :+ lit(ct).as("_change_type")
    def oldSide(ct: String) =
      (d.groupCols.map(c => col(c)) ++
        d.aggs.map(a => col(s"__old_${a.name}").as(a.name))).zip(mvSchema)
        .map { case (c, f) => c.cast(f.dataType).as(f.name) } :+
        lit(ct).as("_change_type")
    val differ = d.aggs.zip(mvSchema.drop(d.groupCols.size)).map {
      case (a, f) =>
        !(col(s"__old_${a.name}") <=> col(a.name).cast(f.dataType))
    }.reduce(_ || _)
    val touchedRows = combined.filter(col("__chg"))
    val updated = touchedRows.filter(col("__was") && live && differ)
    // the 4-way union inherits 4× the checkpoint's partitions; rebalance
    // before the commit writes it, or a delta-sized payload lands as a
    // hundred near-empty parquet files (the recorded CDF is bounded by
    // changed groups — AQE's advisory sizing picks the file count at any
    // scale, where the previous cores/8 coalesce was a local-mode
    // constant)
    val delta = touchedRows.filter(!col("__was") && live)
        .select(newSide("insert"): _*)
      .unionByName(touchedRows.filter(col("__was") && !live)
        .select(oldSide("delete"): _*))
      .unionByName(updated.select(oldSide("update_preimage"): _*))
      .unionByName(updated.select(newSide("update_postimage"): _*))
      .hint("rebalance")
    publish(combined.filter(live), changed, "incremental", recCount,
      Some(delta))
  }

  // the refresh's OWN row-level delta for FULL recomputes: old content
  // vs new content, wholesale (null-safe group join — GROUP BY treats
  // NULL as one group, so the diff must too; the incremental fold
  // derives its delta inline from its own join instead). Emits MV rows
  // + `_change_type`: a group present only in `old` is a `delete`,
  // only in `neu` an `insert`, present in both with ANY agg value
  // changed an `update_preimage`/`update_postimage` pair. This is the
  // payload [[VersionedTable.commit]] records as the commit's CDF.
  private def refreshDelta(old: DataFrame, neu: DataFrame,
      groupCols: Seq[String], aggNames: Seq[String]): DataFrame = {
    val o = old.select(
      groupCols.map(c => col(c).as(s"__o_$c")) ++
        aggNames.map(n => col(n).as(s"__o_$n")) :+
        lit(1).as("__op"): _*)
    val n = neu.select(
      groupCols.map(c => col(c).as(s"__n_$c")) ++
        aggNames.map(a => col(a).as(s"__n_$a")) :+
        lit(1).as("__np"): _*)
    val j = o.join(n,
      groupCols.map(c => o(s"__o_$c") <=> n(s"__n_$c")).reduce(_ && _),
      "full_outer")
    val differ = aggNames.map(a =>
      !(col(s"__o_$a") <=> col(s"__n_$a"))).reduce(_ || _)
    def side(prefix: String, ct: String)(sel: DataFrame) =
      sel.select(groupCols.map(c => col(s"${prefix}_$c").as(c)) ++
        aggNames.map(a => col(s"${prefix}_$a").as(a)) :+
        lit(ct).as("_change_type"): _*)
    val deletes = side("__o", "delete")(
      j.filter(col("__op") === 1 && col("__np").isNull))
    val inserts = side("__n", "insert")(
      j.filter(col("__np") === 1 && col("__op").isNull))
    val changedBoth =
      j.filter(col("__op") === 1 && col("__np") === 1 && differ)
    val pre = side("__o", "update_preimage")(changedBoth)
    val post = side("__n", "update_postimage")(changedBoth)
    deletes.unionByName(inserts).unionByName(pre).unionByName(post)
  }

  /** Freshness ledger: (folded source version, source tip, stale?). For
    * join MVs the pair reports the FIRST source; `stale` accounts for
    * both sides (either tip moving makes the view stale).
    */
  def status(spark: SparkSession, mvRoot: String): (Long, Long, Boolean) = {
    val props = VersionedTable.tableProperties(spark, mvRoot)
    val d = definitionOf(props, mvRoot)
    val tip = VersionedTable.versions(spark, d.source).last
    val staleRest = d.sources.drop(1).exists(s =>
      VersionedTable.versions(spark, s.root).last != s.folded)
    (d.folded, tip, tip != d.folded || staleRest)
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
