package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{MaterializedView, VersionedTable}

/** SQL `CALL` surface for the versioned table's MAINTENANCE operations —
  * the statements every lakehouse ships as stored procedures because no
  * standard SQL verb exists for them:
  *
  * {{{
  *   CALL cat.system.compact(table => 'main.orders_v')
  *   CALL cat.system.optimize('main.orders_v', 'o_custkey', 16)
  *   CALL cat.system.restore('main.orders_v', 3)
  *   CALL cat.system.vacuum('main.orders_v', keep_versions => 1, force => true)
  *   CALL cat.system.history('main.orders_v')
  * }}}
  *
  * Wired through Spark 4's DSv2 `ProcedureCatalog` contract: the catalog
  * resolves `system.<name>`, Spark type-checks and coerces the arguments
  * against the declared [[ProcedureParameter]]s (named or positional,
  * with defaults), and each call returns its result rows through a
  * [[LocalScan]] — maintenance results are bytes-sized ledgers (versions,
  * file counts), never data. The procedures delegate to the same
  * [[VersionedTable]] operations the API exposes, so SQL-only users get
  * the full maintenance story: compaction/clustering as first-class
  * `#rewrite=true` commits that change feeds skip, restore as a
  * bytes-sized manifest commit, vacuum as the only data/ listing in the
  * format. A maintenance race (concurrent writer won the publish) throws
  * with a re-run instruction — losing maintenance is always safe.
  */
object VTableProcedures {

  private def spark = SparkSession.active

  /** `'ns.tbl'` (dots) relative to the catalog root → table root path,
    * with the catalog's own traversal validation.
    */
  private def tableRoot(root: String, table: String): String = {
    val parts = table.split('.').toSeq
    require(parts.nonEmpty && parts.forall(s =>
        s.nonEmpty && !s.contains("/") && !s.contains("..")),
      s"graft-vtable procedure: illegal table identifier '$table'")
    val p = parts.foldLeft(new Path(root))((acc, s) => new Path(acc, s)).toString
    require(VersionedTable.versions(spark, p).nonEmpty,
      s"graft-vtable procedure: no table at '$table'")
    p
  }

  private def utf8(s: String): AnyRef =
    if (s == null) null else UTF8String.fromString(s)

  // identifier → path under the catalog root, WITHOUT requiring a table
  // (views and namespaces use this)
  private def identPath(root: String, ident: String): String = {
    val parts = ident.split('.').toSeq
    require(parts.nonEmpty && parts.forall(s =>
        s.nonEmpty && !s.contains("/") && !s.contains("..")),
      s"graft-vtable procedure: illegal identifier '$ident'")
    parts.foldLeft(new Path(root))((acc, s) => new Path(acc, s)).toString
  }

  private case class ResultScan(out: Array[InternalRow],
      schema: StructType) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
    override def description(): String = "graft-vtable procedure result"
  }

  private def raceLost(what: String): Nothing =
    throw new java.io.IOException(
      s"graft-vtable: $what lost the publish race to a concurrent " +
        "writer — maintenance losing is always safe; re-run the CALL")

  /** One procedure: declared parameters, output schema, and a body from
    * the coerced argument row to result rows.
    */
  private final case class Proc(name: String, description: String,
      params: Seq[ProcedureParameter], out: StructType,
      body: (String, InternalRow) => Seq[InternalRow]) {

    def unbound(root: String): UnboundProcedure = new UnboundProcedure {
      override def name(): String = Proc.this.name
      override def description(): String = Proc.this.description
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = Proc.this.name
          override def description(): String = Proc.this.description
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            java.util.List.of[Scan](
              ResultScan(body(root, input).toArray, out)).iterator()
        }
    }
  }

  private def in(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType, dflt: String) =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private val procs: Seq[Proc] = Seq(
    Proc("compact",
      "rewrite the latest snapshot as one generation (materializes " +
        "outstanding deletion vectors); small_mb > 0 switches to " +
        "INCREMENTAL mode — coalesce only generations under that size, " +
        "carrying the bulk verbatim; a #rewrite=true commit change " +
        "feeds skip",
      Seq(in("table", StringType),
        inDefault("small_mb", LongType, "0")),
      StructType(Seq(StructField("version", LongType),
        StructField("compacted", BooleanType, nullable = false))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val smallMb = args.getLong(1)
        if (smallMb > 0)
          VersionedTable.compactSmall(spark, p,
              smallMb * 1024L * 1024L) match {
            case Some((v, rewritten, _)) =>
              Seq(new GenericInternalRow(Array[Any](v, rewritten > 0)))
            case None => raceLost("compact")
          }
        else VersionedTable.compact(spark, p) match {
          case Some(v) =>
            Seq(new GenericInternalRow(Array[Any](v, true)))
          case None =>
            // compact() returns None both when already compact (one
            // generation, no DVs) and on a publish loss — disambiguate
            // by re-checking the precondition at the (new) tip
            val tip = VersionedTable.history(spark, p)
              .collect().maxBy(_.getLong(0))
            if (tip.getInt(2) <= 1 && tip.getInt(3) == 0)
              Seq(new GenericInternalRow(
                Array[Any](tip.getLong(0), false)))
            else raceLost("compact")
        }
      }),
    Proc("optimize",
      "cluster the latest snapshot (1 sort column or 2 z-order columns) " +
        "into ~target_mb files as a #rewrite=true commit; with " +
        "partition => 'field=token' only that partition's leaves " +
        "rewrite (O(partition), never O(table) — the nightly cadence)",
      Seq(in("table", StringType), in("cluster_by", StringType),
        inDefault("target_mb", LongType, "128"),
        inDefault("partition", StringType, "NULL")),
      StructType(Seq(StructField("version", LongType),
        StructField("files_before", IntegerType),
        StructField("files_after", IntegerType),
        StructField("rows_rewritten", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val cols = args.getUTF8String(1).toString.split(',').map(_.trim).toSeq
        val bytes = args.getLong(2) * 1024L * 1024L
        if (args.isNullAt(3))
          VersionedTable.optimize(spark, p, cols, bytes) match {
            case Some((v, st)) => Seq(new GenericInternalRow(
              Array[Any](v, st.filesBefore, st.filesAfter, st.rows)))
            case None => raceLost("optimize")
          }
        else
          VersionedTable.optimizePartition(spark, p,
              args.getUTF8String(3).toString, cols, bytes) match {
            case Some((v, _, _, st)) => Seq(new GenericInternalRow(
              Array[Any](v, st.filesBefore, st.filesAfter, st.rows)))
            case None => raceLost("optimize")
          }
      }),
    Proc("restore",
      "make an old snapshot the table tip as a new bytes-sized commit; " +
        "history is preserved and the restore is itself auditable",
      Seq(in("table", StringType), in("version", LongType)),
      StructType(Seq(StructField("restored_to", LongType),
        StructField("committed_version", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val toV = args.getLong(1)
        VersionedTable.restore(spark, p, toV) match {
          case Some(v) => Seq(new GenericInternalRow(Array[Any](toV, v)))
          case None => raceLost("restore")
        }
      }),
    Proc("vacuum",
      "reclaim generations no retained snapshot references (trims time " +
        "travel to keep_versions AND, when older_than is given, to " +
        "snapshots published after that timestamp — the tip always " +
        "survives); force also reclaims unreferenced dirs younger than " +
        "the newest manifest; dry_run reports what WOULD be reclaimed " +
        "without deleting anything",
      Seq(in("table", StringType),
        inDefault("keep_versions", IntegerType, "2147483647"),
        inDefault("force", BooleanType, "false"),
        inDefault("dry_run", BooleanType, "false"),
        inDefault("older_than", TimestampType, "NULL")),
      StructType(Seq(StructField("generations_deleted", IntegerType),
        StructField("manifests_deleted", IntegerType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val cutoff =
          if (args.isNullAt(4)) None else Some(args.getLong(4))
        val (gens, manifests) = VersionedTable.vacuum(spark, p,
          args.getInt(1), args.getBoolean(2), args.getBoolean(3),
          olderThanMicros = cutoff)
        Seq(new GenericInternalRow(Array[Any](gens, manifests)))
      }),
    Proc("remove_orphans",
      "reclaim generation dirs under data/ that NO manifest references " +
        "(main log, branches, dv: key lists, cdf: recorded CDF) and " +
        "older than the cutoff — the crashed-pre-publish-writer debris " +
        "vacuum can never touch (it only reclaims what a dropped " +
        "manifest owned); older_than is the in-flight-writer safety " +
        "cutoff (pick days, not minutes); dry_run lists without deleting",
      Seq(in("table", StringType), in("older_than", TimestampType),
        inDefault("dry_run", BooleanType, "false")),
      StructType(Seq(StructField("path", StringType),
        StructField("bytes", LongType),
        StructField("deleted", BooleanType, nullable = false))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        VersionedTable.removeOrphans(spark, p, args.getLong(1),
            args.getBoolean(2)).map { case (g, bytes, deleted) =>
          new GenericInternalRow(Array[Any](utf8(g), bytes, deleted))
        }
      }),
    Proc("partitions",
      "SHOW PARTITIONS: one row per partition tuple in the snapshot " +
        "(latest when version is omitted) — rendered field=token path, " +
        "manifest entry count, on-disk bytes; tuple-less entries " +
        "(pre-partitioning history, schema carriers) report under ''",
      Seq(in("table", StringType),
        inDefault("version", LongType, "NULL")),
      StructType(Seq(StructField("partition", StringType),
        StructField("n_entries", IntegerType),
        StructField("bytes", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val v = if (args.isNullAt(1)) None else Some(args.getLong(1))
        VersionedTable.partitionSummary(spark, p, v).map {
          case (tok, n, bytes) =>
            new GenericInternalRow(Array[Any](utf8(tok), n, bytes))
        }
      }),
    Proc("create_view",
      "persist a SQL view definition beside the table roots (resolved " +
        "at read: SELECT ... FROM <cat>.<ns>.<view> is native SQL); the " +
        "SQL is analyzed at create, so typos refuse here; replace => " +
        "true re-defines (OSS Spark has no v2 CREATE VIEW execution, " +
        "so the DDL rides this procedure)",
      Seq(in("view", StringType), in("sql", StringType),
        inDefault("replace", BooleanType, "false")),
      StructType(Seq(StructField("view", StringType),
        StructField("created", BooleanType, nullable = false))),
      (root, args) => {
        val ident = args.getUTF8String(0).toString
        val p = identPath(root, ident)
        require(VersionedTable.versions(spark, p).isEmpty,
          s"graft-vtable: a TABLE named '$ident' exists — views and " +
            "tables share the namespace")
        VTableViews.create(spark, s"$p.view",
          args.getUTF8String(1).toString, args.getBoolean(2))
        Seq(new GenericInternalRow(Array[Any](utf8(ident), true)))
      }),
    Proc("drop_view",
      "remove a persisted view definition",
      Seq(in("view", StringType)),
      StructType(Seq(StructField("view", StringType),
        StructField("dropped", BooleanType, nullable = false))),
      (root, args) => {
        val ident = args.getUTF8String(0).toString
        require(VTableViews.drop(spark,
            s"${identPath(root, ident)}.view"),
          s"graft-vtable: no view '$ident'")
        Seq(new GenericInternalRow(Array[Any](utf8(ident), true)))
      }),
    Proc("show_views",
      "list the persisted views of a namespace with their definitions",
      Seq(in("namespace", StringType)),
      StructType(Seq(StructField("view", StringType),
        StructField("sql", StringType))),
      (root, args) => {
        val ns = args.getUTF8String(0).toString
        val nsPath = new Path(identPath(root, ns))
        val hfs = nsPath.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!hfs.exists(nsPath)) Seq.empty
        else hfs.listStatus(nsPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".view"))
          .sortBy(_.getPath.getName)
          .map { st =>
            val name = st.getPath.getName.stripSuffix(".view")
            val sql = VTableViews.readDefinition(spark,
              st.getPath.toString).getOrElse("")
            new GenericInternalRow(Array[Any](utf8(s"$ns.$name"), utf8(sql)))
          }
      }),
    Proc("tag",
      "name a committed version durably (metadata-only commit; VERSION " +
        "AS OF '<name>' reads it, vacuum keeps it); version defaults to " +
        "the tip; a negative version DELETES the tag",
      Seq(in("table", StringType), in("name", StringType),
        inDefault("version", LongType, "NULL")),
      StructType(Seq(StructField("tag", StringType),
        StructField("tagged_version", LongType),
        StructField("committed_version", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val name = args.getUTF8String(1).toString
        val v = if (args.isNullAt(2)) None else Some(args.getLong(2))
        if (v.exists(_ < 0)) {
          val cv = VersionedTable.deleteTag(spark, p, name)
          Seq(new GenericInternalRow(Array[Any](utf8(name), null, cv)))
        } else {
          val cv = VersionedTable.tagVersion(spark, p, name, v)
          val tagged = VersionedTable.resolveRef(spark, p, name).get
          Seq(new GenericInternalRow(Array[Any](utf8(name), tagged, cv)))
        }
      }),
    Proc("branch",
      "fork a branch from a main version (default: the tip) — staged " +
        "commits land on the branch, invisible to main readers, until " +
        "fast_forward publishes them (write-audit-publish)",
      Seq(in("table", StringType), in("name", StringType),
        inDefault("from_version", LongType, "NULL")),
      StructType(Seq(StructField("branch", StringType),
        StructField("base_version", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val name = args.getUTF8String(1).toString
        val from = if (args.isNullAt(2)) None else Some(args.getLong(2))
        val base = VersionedTable.createBranch(spark, p, name, from)
        Seq(new GenericInternalRow(Array[Any](utf8(name), base)))
      }),
    Proc("fast_forward",
      "publish a branch's staged commits to main as ONE atomic commit " +
        "(kind wap_publish) — rebases over intervening appends, aborts " +
        "loudly on a logical conflict (overwrite/merge/delete/DV change)",
      Seq(in("table", StringType), in("branch", StringType),
        inDefault("drop_branch", BooleanType, "true")),
      StructType(Seq(StructField("published_version", LongType),
        StructField("branch", StringType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val name = args.getUTF8String(1).toString
        VersionedTable.fastForward(spark, p, name) match {
          case Some(v) =>
            if (args.getBoolean(2)) VersionedTable.dropBranch(spark, p, name)
            Seq(new GenericInternalRow(Array[Any](v, utf8(name))))
          case None => throw new java.io.IOException(
            s"graft-vtable: fast_forward('$name') conflicts with commits " +
              "published since the fork point (non-append or DV-changing)" +
              " — re-validate the staged work against the new tip " +
              "(re-branch, re-stage or re-audit), then publish again")
        }
      }),
    Proc("evolve_partition_spec",
      "ALTER the table's partition layout (Iceberg ADD/DROP/REPLACE " +
        "PARTITION FIELD) as a metadata-only commit: future writes " +
        "route under the new spec, committed generations keep their " +
        "era's layout AND its pruning; spec is a comma list of " +
        "transforms (identity col, years/months/days(ts), " +
        "truncate(n,col), bucket(n,col)) or '' to drop partitioning",
      Seq(in("table", StringType), in("spec", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("partition", StringType),
        StructField("history", StringType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val v = VersionedTable.evolvePartitionSpec(spark, p,
          args.getUTF8String(1).toString)
        val props = VersionedTable.tableProperties(spark, p, Some(v))
        Seq(new GenericInternalRow(Array[Any](v,
          utf8(props.getOrElse("partition", "")),
          utf8(props.getOrElse("partition.history", "")))))
      }),
    Proc("history",
      "DESCRIBE HISTORY: one row per commit (kind, generation/DV " +
        "counts, txn stamp, publish time) from bytes-sized manifest " +
        "reads alone",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("kind", StringType),
        StructField("n_generations", IntegerType),
        StructField("n_dvs", IntegerType),
        StructField("txn_app", StringType),
        StructField("txn_batch", LongType),
        StructField("committed_at", TimestampType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        VersionedTable.history(spark, p).collect().toSeq.map { r =>
          new GenericInternalRow(Array[Any](
            r.getLong(0), utf8(r.getString(1)), r.getInt(2), r.getInt(3),
            utf8(if (r.isNullAt(4)) null else r.getString(4)),
            if (r.isNullAt(5)) null else r.getLong(5),
            // java.sql.Timestamp → epoch micros (catalyst TimestampType)
            r.getTimestamp(6).getTime * 1000L +
              (r.getTimestamp(6).getNanos / 1000L) % 1000L))
        }
      }),
    Proc("create_mview",
      "CREATE MATERIALIZED VIEW: materialize a grouped aggregate of a " +
        "versioned table — or of a fact-join-dim over TWO versioned " +
        "tables (source2 + join_on => 'leftCol=rightCol,…') — as its " +
        "OWN versioned table, refreshed incrementally from the change " +
        "feed(s) (refresh_mview); aggs grammar 'name:count, " +
        "name:sum(col), name:min(col), name:max(col)' (exactly one " +
        "count — it decides group liveness on retraction; sums fold " +
        "over coalesce(col,0); min/max fold on inserts and recompute " +
        "only retraction-touched groups); where is an optional row " +
        "predicate",
      Seq(in("mview", StringType), in("source", StringType),
        in("group_by", StringType), in("aggs", StringType),
        inDefault("where", StringType, "NULL"),
        inDefault("source2", StringType, "NULL"),
        inDefault("join_on", StringType, "NULL")),
      StructType(Seq(StructField("mview", StringType),
        StructField("created", BooleanType, nullable = false),
        StructField("source_version", LongType))),
      (root, args) => {
        val ident = args.getUTF8String(0).toString
        val mvRoot = identPath(root, ident)
        require(!new Path(s"$mvRoot.view").getFileSystem(
            spark.sparkContext.hadoopConfiguration)
            .exists(new Path(s"$mvRoot.view")),
          s"graft-vtable: a VIEW named '$ident' exists — views, tables " +
            "and mviews share the namespace")
        val srcRoot = tableRoot(root, args.getUTF8String(1).toString)
        val groupCols = args.getUTF8String(2).toString.split(',').toSeq
          .map(_.trim).filter(_.nonEmpty)
        val aggs = args.getUTF8String(3).toString
        val where = if (args.isNullAt(4)) None
          else Some(args.getUTF8String(4).toString)
        val created = (args.isNullAt(5), args.isNullAt(6)) match {
          case (true, true) =>
            MaterializedView.create(spark, mvRoot, srcRoot, groupCols,
              aggs, where)
          case (false, false) =>
            val src2 = tableRoot(root, args.getUTF8String(5).toString)
            val joinOn = args.getUTF8String(6).toString.split(',').toSeq
              .map(_.trim).filter(_.nonEmpty).map { p =>
                p.split('=') match {
                  case Array(l, r) => (l.trim, r.trim)
                  case _ => throw new IllegalArgumentException(
                    s"graft-vtable: bad join_on entry '$p' — expected " +
                      "'leftCol=rightCol'")
                }
              }
            MaterializedView.createJoin(spark, mvRoot, srcRoot, src2,
              joinOn, groupCols, aggs, where)
          case _ => throw new IllegalArgumentException(
            "graft-vtable: source2 and join_on come together — a join " +
              "MV needs both, a single-table MV neither")
        }
        require(created,
          s"graft-vtable: a table named '$ident' already exists")
        val sv = VersionedTable.tableProperties(spark, mvRoot)(
          "mview.source_version").toLong
        Seq(new GenericInternalRow(Array[Any](utf8(ident), true, sv)))
      }),
    Proc("refresh_mview",
      "fold the source change feed(s) since the last refresh into the " +
        "materialized view — O(changes), one atomic commit carries " +
        "content + freshness marker(s); mode: noop (already fresh), " +
        "incremental, or full (feed inexpressible across the window, " +
        "e.g. RESTORE — recomputed from the snapshot); " +
        "recomputed_groups counts the min/max retraction recomputes " +
        "(0 for append-only windows)",
      Seq(in("mview", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("source_version", LongType),
        StructField("changed_groups", LongType),
        StructField("mode", StringType),
        StructField("recomputed_groups", LongType))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val r = MaterializedView.refresh(spark, p)
        Seq(new GenericInternalRow(Array[Any](
          r.mvVersion, r.sourceVersion, r.changedGroups, utf8(r.mode),
          r.recomputedGroups)))
      }),
    Proc("mview_status",
      "freshness ledger: the source version the content folds up to, " +
        "the source tip, and whether a refresh is due",
      Seq(in("mview", StringType)),
      StructType(Seq(StructField("folded_source_version", LongType),
        StructField("source_tip", LongType),
        StructField("stale", BooleanType, nullable = false))),
      (root, args) => {
        val p = tableRoot(root, args.getUTF8String(0).toString)
        val (folded, tip, stale) = MaterializedView.status(spark, p)
        Seq(new GenericInternalRow(Array[Any](folded, tip, stale)))
      }))

  def names: Seq[String] = procs.map(_.name)

  def load(name: String, root: String): Option[UnboundProcedure] =
    procs.find(_.name == name).map(_.unbound(root))
}
