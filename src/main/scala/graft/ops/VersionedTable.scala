package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** A minimal commit-log table format — numbered snapshots over plain
  * parquet data files, giving the three lakehouse behaviors the sink
  * family was still missing: ACID commits, snapshot-isolated reads, and
  * time travel (`read @ version N`).
  *
  * Layout under one table root:
  * {{{
  *   <table>/data/v<N>-<uuid>/...parquet   // immutable data generations
  *   <table>/_log/<N>.commit               // snapshot manifests
  * }}}
  *
  * Each manifest lists the data directories (relative paths, one per
  * line) that constitute snapshot N — append commits carry the previous
  * list plus the new generation, overwrite commits carry only the new
  * one. The COMMIT POINT is the atomic rename of a hidden temp file to
  * `_log/<N>.commit`: data files are written first and are invisible
  * until the manifest appears, so a crash anywhere before the rename
  * leaves only orphaned (unreferenced, reclaimable) data and the prior
  * snapshot intact — the same only-the-driver-publishes atomicity the
  * `graft-audit` DSv2 sink demonstrates, applied to a table. Concurrent
  * writers are safe by OPTIMISTIC CONCURRENCY: rename onto an existing
  * manifest fails (Hadoop semantics — returns false rather than
  * overwriting), the loser re-reads the log and retries at N+1, so
  * version history is linear.
  *
  * Readers never list `data/` (at scale a blob listing is slow and,
  * worse, sees half-written generations): they read the manifest and
  * load exactly its files. That makes reads snapshot-isolated for free
  * and makes `readAt(v)` trivial — time travel is just reading an older
  * manifest. Scale shape: a manifest holds directory names, not file
  * names, so it stays bytes-sized; data generations are immutable parquet
  * dirs that [[Compaction]] could rewrite into a new overwrite commit.
  */
object VersionedTable {

  def pack: Seq[Q] = Seq(q108TimeTravel, q110CdcFeed, q111CompactedFeed,
    q112VersionedMerge)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CommitRe = """(\d+)\.commit""".r

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val hfs = fs(spark, root)
    val log = new Path(root, "_log")
    if (!hfs.exists(log)) Seq.empty
    else hfs.listStatus(log).toSeq
      .flatMap(_.getPath.getName match {
        case CommitRe(n) => Some(n.toLong)
        case _ => None // temp files mid-publish, foreign junk
      }).sorted
  }

  private def manifestLines(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val hfs = fs(spark, root)
    val in = hfs.open(new Path(root, s"_log/$v.commit"))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  // a manifest is optional `#key=value` metadata headers, then one data
  // directory per line (headerless pre-metadata manifests parse the same)
  private[ops] def manifestDirs(spark: SparkSession, root: String, v: Long): Seq[String] =
    manifestLines(spark, root, v).filterNot(_.startsWith("#"))

  /** Commit metadata: the `#key=value` manifest headers (commit kind,
    * streaming transaction stamps). Empty for plain commits.
    */
  def manifestMeta(spark: SparkSession, root: String, v: Long): Map[String, String] =
    manifestLines(spark, root, v).filter(_.startsWith("#"))
      .map(_.drop(1).split("=", 2))
      .collect { case Array(k, value) => k -> value }.toMap

  /** True when commit `v` rewrote physical layout without changing logical
    * content (compaction) — the dataChange=false commits a change feed
    * must skip.
    */
  def isRewrite(spark: SparkSession, root: String, v: Long): Boolean =
    manifestMeta(spark, root, v).get("rewrite").contains("true")

  // write df as a new immutable generation dir; invisible until published
  private def writeGeneration(spark: SparkSession, root: String, df: DataFrame): String = {
    val gen = s"data/v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists").parquet(new Path(root, gen).toString)
    gen
  }

  // THE commit point: atomic publish of version v; false means another
  // writer took v (optimistic-concurrency loss) and the temp was discarded
  private def tryPublish(spark: SparkSession, root: String, v: Long,
      dirs: Seq[String], meta: Map[String, String]): Boolean = {
    val hfs = fs(spark, root)
    val tmp = new Path(root, s"_log/.tmp-$v-${java.util.UUID.randomUUID().toString.take(8)}")
    val lines = meta.toSeq.sortBy(_._1).map { case (k, value) => s"#$k=$value" } ++ dirs
    val out = hfs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (hfs.rename(tmp, new Path(root, s"_log/$v.commit"))) true
    else { hfs.delete(tmp, false); false }
  }

  /** One commit: write `df` as a new immutable generation, then publish a
    * manifest for version max+1 via atomic rename; on a concurrency loss
    * the publish retries at the next version. `overwrite=false` keeps the
    * prior snapshot's directories in the new manifest (append semantics).
    * Returns the committed version.
    */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      overwrite: Boolean, meta: Map[String, String] = Map.empty): Long = {
    val gen = writeGeneration(spark, root, df)
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > 20)
        throw new java.io.IOException(s"VersionedTable: publish contention at $root")
      val vs = versions(spark, root)
      val next = vs.lastOption.getOrElse(0L) + 1
      val dirs =
        if (overwrite || vs.isEmpty) Seq(gen)
        else manifestDirs(spark, root, vs.last) :+ gen
      // a publish loss means another writer took this version — retry on a
      // fresh read of the log (optimistic concurrency)
      if (tryPublish(spark, root, next, dirs, meta)) return next
    }
    -1L // unreachable
  }

  /** COMPACTION as a commit: rewrite the latest snapshot's generations
    * into ONE new generation and publish it as a REWRITE commit
    * (`#rewrite=true` — the dataChange=false idea): logical content
    * identical, physical layout compacted, and [[readChanges]] skips it so
    * downstream incremental consumers see no phantom changes. Conflict
    * safety differs from [[commit]] ON PURPOSE: the manifest is published
    * ONLY at base+1 — retrying at a later version would silently drop a
    * concurrent writer's rows, so on a publish loss compaction ABORTS and
    * reclaims its orphan generation. Compaction is maintenance; losing is
    * always safe, the caller just runs it again. Returns the new version,
    * or None when already compact / lost the race.
    */
  def compact(spark: SparkSession, root: String): Option[Long] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"VersionedTable: nothing to compact at $root")
    val baseV = vs.last
    val baseDirs = manifestDirs(spark, root, baseV)
    if (baseDirs.size <= 1) return None // one generation — already compact
    val df = spark.read.parquet(baseDirs.map(d => new Path(root, d).toString): _*)
    val gen = writeGeneration(spark, root, df)
    if (tryPublish(spark, root, baseV + 1, Seq(gen), Map("rewrite" -> "true")))
      Some(baseV + 1)
    else {
      fs(spark, root).delete(new Path(root, gen), true)
      None
    }
  }

  /** EXACTLY-ONCE streaming commit: `foreachBatch` is at-least-once after
    * a restart, so a sink that blindly appends double-writes the replayed
    * micro-batch. Stamping every commit with its (application, batchId)
    * transaction and refusing any batch the log has already absorbed makes
    * the append idempotent — the Delta `txn` contract. Batch ids from one
    * app are monotone, so "already absorbed" is `batchId <= the app's max
    * stamped id`. The check re-runs after every optimistic-concurrency
    * loss, so two racing replays of the same batch cannot both land: the
    * loser re-reads a log that now contains the winner's stamp and skips.
    * Returns (visible version, whether this call committed).
    */
  def idempotentCommit(spark: SparkSession, root: String, df: DataFrame,
      appId: String, batchId: Long): (Long, Boolean) = {
    def absorbed(vs: Seq[Long]): Boolean = vs.exists { v =>
      val m = manifestMeta(spark, root, v)
      m.get("txnApp").contains(appId) &&
        m.get("txnBatch").exists(_.toLong >= batchId)
    }
    val vs0 = versions(spark, root)
    if (absorbed(vs0)) return (vs0.last, false)
    val gen = writeGeneration(spark, root, df)
    val meta = Map("txnApp" -> appId, "txnBatch" -> batchId.toString)
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > 20)
        throw new java.io.IOException(s"VersionedTable: publish contention at $root")
      val vs = versions(spark, root)
      if (absorbed(vs)) { // a racing replay won — this copy must not land
        fs(spark, root).delete(new Path(root, gen), true)
        return (vs.last, false)
      }
      val next = vs.lastOption.getOrElse(0L) + 1
      val dirs =
        if (vs.isEmpty) Seq(gen)
        else manifestDirs(spark, root, vs.last) :+ gen
      if (tryPublish(spark, root, next, dirs, meta)) return (next, true)
    }
    (-1L, false) // unreachable
  }

  /** Reclaim storage: delete data generations no RETAINED snapshot
    * references (crash orphans, and — when `keepVersions` trims history —
    * generations only old snapshots used), plus the trimmed manifests
    * and any stale in-flight temp files. Keeping the newest
    * `keepVersions` manifests intact preserves that much time travel;
    * the one data/ listing this format ever does happens here, offline,
    * not on any read path. Returns (generations deleted, manifests
    * deleted).
    *
    * Safe against concurrent WRITERS by the commit order: a writer's
    * generation only becomes referenced when its manifest publishes, so
    * vacuum treats unreferenced dirs younger than the newest manifest as
    * possibly-in-flight and skips them unless `force` (a production
    * vacuum would use an age threshold; this keeps the demo
    * deterministic).
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = Int.MaxValue,
      force: Boolean = false): (Int, Int) = {
    val hfs = fs(spark, root)
    val vs = versions(spark, root)
    val keep = vs.takeRight(math.max(1, keepVersions))
    val dropVs = vs.filterNot(keep.contains)
    val referenced = keep.flatMap(v => manifestDirs(spark, root, v)).toSet
    val dataRoot = new Path(root, "data")
    val deadDirs =
      if (!hfs.exists(dataRoot)) Seq.empty
      else hfs.listStatus(dataRoot).toSeq
        .map(st => s"data/${st.getPath.getName}")
        .filterNot(referenced.contains)
    // in-flight protection (see Scaladoc): without force, only reclaim a
    // dir that a DROPPED manifest provably owned; never-referenced dirs
    // might be a concurrent writer's not-yet-published generation
    val droppedRefs = dropVs.flatMap(v => manifestDirs(spark, root, v)).toSet
    val deletable = deadDirs.filter(d => force || droppedRefs.contains(d))
    deletable.foreach(d => hfs.delete(new Path(root, d), true))
    dropVs.foreach(v => hfs.delete(new Path(root, s"_log/$v.commit"), false))
    if (force && hfs.exists(new Path(root, "_log")))
      hfs.listStatus(new Path(root, "_log")).toSeq
        .filter(_.getPath.getName.startsWith(".tmp-"))
        .foreach(st => hfs.delete(st.getPath, false))
    (deletable.size, dropVs.size)
  }

  /** Snapshot-isolated read of version `v` (latest when None): loads
    * exactly the manifest's directories — never a data/ listing.
    */
  def readAt(spark: SparkSession, root: String, v: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"VersionedTable: no committed snapshot at $root")
    val ver = v.getOrElse(vs.last)
    require(vs.contains(ver), s"VersionedTable: version $ver not in $vs")
    val dirs = manifestDirs(spark, root, ver)
      .map(d => new Path(root, d).toString)
    spark.read.parquet(dirs: _*)
  }

  /** CDC / incremental consumption: the rows ADDED between two committed
    * versions, read as exactly the data generations the intervening
    * commits appended — for append-only histories the change feed is
    * O(delta) with NO diffing and no snapshot scan (the point of keeping a
    * commit log). The walk is COMMIT-BY-COMMIT so REWRITE commits
    * (compaction, `#rewrite=true`) contribute nothing: they change layout,
    * not content, and a feed that surfaced their generations would
    * double-deliver every compacted row to downstream consumers. An
    * OVERWRITE commit genuinely breaks the append contract — its manifest
    * drops directories without the rewrite stamp — and a generation-level
    * feed would misreport it, so this refuses loudly and callers fall back
    * to the snapshot diff (q108's v2→v3 row, the q65 shape).
    */
  def readChanges(spark: SparkSession, root: String,
      vFrom: Long, vTo: Long): DataFrame = {
    val vs = versions(spark, root)
    require(vs.contains(vFrom) && vs.contains(vTo) && vFrom < vTo,
      s"readChanges: need committed vFrom < vTo, got $vFrom, $vTo in $vs")
    val steps = vs.filter(v => v > vFrom && v <= vTo)
    val added = steps.flatMap { v =>
      if (isRewrite(spark, root, v)) Seq.empty // layout-only: no data change
      else {
        val prev = vs.filter(_ < v).last
        val before = manifestDirs(spark, root, prev)
        val after = manifestDirs(spark, root, v)
        require(before.forall(after.contains),
          s"readChanges: commit v$v is an overwrite (dropped generations) " +
            "— use snapshot diff for non-append histories")
        after.filterNot(before.contains)
      }
    }.map(d => new Path(root, d).toString)
    require(added.nonEmpty, s"readChanges: no new generations v$vFrom..v$vTo")
    spark.read.parquet(added: _*)
  }

  // per-invocation fresh root under one shutdown-hook-cleaned temp tree
  // (the q106 convention)
  private lazy val tmpRoot: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_vtable")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(d)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case scala.util.control.NonFatal(_) => () }))
    d
  }
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** q108: TIME TRAVEL — three commits build a version history over the
    * orders table (v1 = 1995 orders, v2 = append 1996, v3 = overwrite
    * with 1996–1997), then every snapshot is read BACK through its
    * manifest and summarized, plus a v2→v3 reconciliation (the q65 diff
    * shape) computed entirely from time-travel reads. The oracle replays
    * the same change log as filters over the base table and never sees
    * the format — so the hash match proves each manifest read returns
    * exactly its committed snapshot, append really unions, overwrite
    * really replaces, and old versions stay readable after later commits.
    */
  val q108TimeTravel: Q = Q(
    "q108_time_travel",
    (s, dir) => {
      val root = tmpRoot.resolve(s"run_${runSeq.incrementAndGet()}").toString
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("yr"))
      def slice(yrs: Seq[Int]) = orders.filter(col("yr").isin(yrs.map(Integer.valueOf): _*))
      val v1 = commit(s, root, slice(Seq(1995)), overwrite = true)
      val v2 = commit(s, root, slice(Seq(1996)), overwrite = false)
      val v3 = commit(s, root, slice(Seq(1996, 1997)), overwrite = true)
      def summary(v: Long) = readAt(s, root, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(Q.dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .select(lit(s"v$v").as("snapshot"), col("n_rows"), col("n_cust"),
          col("revenue"))
      val diff = readAt(s, root, Some(v2)).select(col("o_orderkey"))
        .withColumn("in_old", lit(1))
        .join(readAt(s, root, Some(v3)).select(col("o_orderkey"))
          .withColumn("in_new", lit(1)), Seq("o_orderkey"), "full")
        .agg(
          sum(when(col("in_old").isNull, 1L).otherwise(0L)).as("n_rows"),
          sum(when(col("in_new").isNull, 1L).otherwise(0L)).as("n_cust"))
        .select(lit("diff_v2_v3").as("snapshot"),
          col("n_rows"), // keys added by the v3 overwrite
          col("n_cust"), // keys removed by the v3 overwrite
          lit(null).cast("double").as("revenue"))
      summary(v1).unionByName(summary(v2)).unionByName(summary(v3))
        .unionByName(diff)
        .orderBy(col("snapshot"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          year(o_orderdate) AS yr
        FROM orders),
      v1 AS (SELECT * FROM o WHERE yr IN (1995)),
      v2 AS (SELECT * FROM o WHERE yr IN (1995, 1996)),
      v3 AS (SELECT * FROM o WHERE yr IN (1996, 1997))
      SELECT 'v1' AS snapshot, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM v1
      UNION ALL
      SELECT 'v2', CAST(count(*) AS BIGINT),
        CAST(count(DISTINCT o_custkey) AS BIGINT),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM v2
      UNION ALL
      SELECT 'v3', CAST(count(*) AS BIGINT),
        CAST(count(DISTINCT o_custkey) AS BIGINT),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM v3
      UNION ALL
      SELECT 'diff_v2_v3',
        CAST((SELECT count(*) FROM v3 WHERE o_orderkey NOT IN
          (SELECT o_orderkey FROM v2)) AS BIGINT),
        CAST((SELECT count(*) FROM v2 WHERE o_orderkey NOT IN
          (SELECT o_orderkey FROM v3)) AS BIGINT),
        CAST(NULL AS DOUBLE)
      ORDER BY snapshot"""))

  /** q110: CDC CHANGE FEED — an append-only version history (base 1995,
    * append 1996, append 1997) consumed INCREMENTALLY: each
    * [[readChanges]] step reads only the generations its target manifest
    * added (O(delta), no diffing, no snapshot scan), and the final
    * snapshot read proves feed + base reconstructs the table. The oracle
    * replays the same change log as year filters and never sees the
    * format, so the hash match proves each feed step returned exactly the
    * rows its commit appended — the downstream-materialized-view refresh
    * pattern every lakehouse consumer runs.
    */
  val q110CdcFeed: Q = Q(
    "q110_cdc_feed",
    (s, dir) => {
      val root = tmpRoot.resolve(s"run_${runSeq.incrementAndGet()}").toString
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("yr"))
      def slice(yr: Int) = orders.filter(col("yr") === yr)
      val v1 = commit(s, root, slice(1995), overwrite = true)
      val v2 = commit(s, root, slice(1996), overwrite = false)
      val v3 = commit(s, root, slice(1997), overwrite = false)
      def summary(step: String, df: DataFrame) = df
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(Q.dec2(col("o_totalprice"))).cast("double").as("revenue"))
        .select(lit(step).as("step"), col("n_rows"), col("n_cust"),
          col("revenue"))
      summary("changes_v1_v2", readChanges(s, root, v1, v2))
        .unionByName(summary("changes_v2_v3", readChanges(s, root, v2, v3)))
        .unionByName(summary("snapshot_v3", readAt(s, root, Some(v3))))
        .orderBy(col("step"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          year(o_orderdate) AS yr
        FROM orders)
      SELECT 'changes_v1_v2' AS step, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM o WHERE yr = 1996
      UNION ALL
      SELECT 'changes_v2_v3', CAST(count(*) AS BIGINT),
        CAST(count(DISTINCT o_custkey) AS BIGINT),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM o WHERE yr = 1997
      UNION ALL
      SELECT 'snapshot_v3', CAST(count(*) AS BIGINT),
        CAST(count(DISTINCT o_custkey) AS BIGINT),
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM o WHERE yr IN (1995, 1996, 1997)
      ORDER BY step"""))
}
