package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Scale REHEARSAL for the versioned-table (lakehouse) surface — the
  * r14 sf1 rehearsal covered the query families; this drives the TABLE
  * FORMAT itself at derived-sf1 volume (SCALING.md "lakehouse
  * rehearsal" section records the ratios):
  *
  *  1. a `days(o_orderdate)`-partitioned table — ~2,400 day leaves
  *     (the 365+-leaf layout a year-partitioned production table
  *     carries), loaded in ONE routed optimized-write commit;
  *  2. a month-window pruned read (hidden partitioning: the predicate
  *     names the base column, kept/total proves the manifest decision);
  *  3. a one-day dynamic partition overwrite (the nightly re-load);
  *  4. a ~10% merge-on-read delete — a deliberately LARGE tombstone
  *     set — read back twice: once under the default broadcast
  *     threshold, once with the threshold floored so the DV anti-join
  *     exercises the shuffled degrade path on real volume;
  *  5. a fold-merge ([[VersionedTable.mergeInto]] over the outstanding
  *     tombstones — the O(DV bytes) fold-in path);
  *  6. a full compact (materializes the remaining tombstones).
  *
  * r16 steps between (3) and (4), the round's surface at leaf scale:
  * partition-subscribed batch reads (one day's snapshot + a feed
  * subscribed to a day disjoint from the replace — silent pass),
  * METADATA-ONLY AGGREGATES (COUNT/MIN/MAX from footers across every
  * leaf, checked against a real count), PARTITION-SCOPED OPTIMIZE (one
  * day re-clusters, ~2,400 entries carry), RENAME under load (metadata
  * publish + a full mixed-name aggregate through the alias chain), SPEC
  * EVOLUTION days→months (metadata publish, a whole-month replace
  * dropping ~30 pre-evolution day leaves by token REFINEMENT, and a
  * cross-era pruned read where both eras prune under their own
  * transforms).
  *
  * Reads the derived fixture [[ScaleRehearsal]] builds (pass its
  * outDir); falls back to any sf dir. Prints one `step=seconds` line
  * per step plus the invariants it checked — run at sf0.1 and the
  * derived sf1 to get the ratio column.
  *
  * Usage: `sbt "runMain graft.tools.LakehouseRehearsal [srcDir] [tableDir]"`
  */
object LakehouseRehearsal {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/sfx1")
    val table = args.drop(1).headOption.getOrElse("/tmp/lakehouse_rehearsal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hfs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(table), true)

    def timed[T](step: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[lakehouse-rehearsal] $step%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val orders = spark.read.parquet(s"$src/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderdate").cast("date").as("o_orderdate"))

    // 1. one routed optimized-write commit into ~2,400 day leaves
    timed("load_day_partitioned") {
      require(VersionedTable.createIfAbsent(spark, table, orders,
        Map("partition" -> "days(o_orderdate)", "key" -> "o_orderkey")))
    }
    val leaves = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(table, "_log", "1.commit")), "UTF-8")
      .split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    println(s"[lakehouse-rehearsal] day leaves: ${leaves.size}")
    require(leaves.size > 365, s"expected 365+ leaves, got ${leaves.size}")
    // optimized write: one task per leaf → leaf file counts stay flat
    val filesPerLeaf = leaves.take(20).map(l =>
      hfs.listStatus(new org.apache.hadoop.fs.Path(table, l))
        .count(st => st.isFile && st.getPath.getName.startsWith("part-")))
    require(filesPerLeaf.forall(_ <= 2),
      s"small-file explosion: $filesPerLeaf files in sampled leaves")

    val d0 = orders.agg(min(col("o_orderdate"))).head()
      .getDate(0).toLocalDate.withDayOfMonth(1)
    val lo = java.sql.Date.valueOf(d0.plusMonths(12))
    val hi = java.sql.Date.valueOf(d0.plusMonths(13).minusDays(1))

    // 2. hidden-partition pruned month read
    val windowRows = timed("pruned_month_read") {
      val fields = VersionedTable.partitionFieldsOf(
        VersionedTable.tableProperties(spark, table))
      val (df, kept, total) = VersionedTable.readAtPrunedPreds(spark,
        table, None, Nil, graft.ops.PartFields.prunePredicates(fields, Seq(
          org.apache.spark.sql.sources.GreaterThanOrEqual("o_orderdate", lo),
          org.apache.spark.sql.sources.LessThanOrEqual("o_orderdate", hi))))
      val n = df.filter(col("o_orderdate").between(lo, hi)).count()
      println(s"[lakehouse-rehearsal] pruned read kept $kept of $total leaves, $n rows")
      require(kept < total / 10, "month window must prune >90% of leaves")
      n
    }
    require(windowRows > 0)

    // 3. one-day dynamic overwrite (the nightly re-load)
    timed("one_day_replace") {
      val reload = orders.filter(col("o_orderdate") === lo)
        .withColumn("price", (col("price") + lit(1))
          .cast("decimal(18,2)"))
      val (_, replaced, carried) =
        VersionedTable.overwritePartitions(spark, table, reload).get
      require(replaced == 1, s"replaced $replaced")
      println(s"[lakehouse-rehearsal] replaced 1 day, carried $carried entries")
    }

    // 3b. partition-subscribed batch twins at 2,400-leaf scale: one
    // day's snapshot (leaf-pruned at the manifest) and the change feed
    // subscribed to a DISJOINT day across the replace commit — which
    // must pass silently, not fail the feed
    timed("subscribed_day_read") {
      val other = java.sql.Date.valueOf(d0.plusMonths(6)).toString
      val n = VersionedTable.readAtPartition(spark, table, None,
        s"o_orderdate_day=$other").count()
      require(n > 0, s"subscribed day $other served no rows")
      val vs = VersionedTable.versions(spark, table)
      val delta = VersionedTable.readChangesPartition(spark, table,
        vs.head, vs.last, s"o_orderdate_day=$other").count()
      require(delta == 0,
        s"disjoint replace must deliver nothing to the subscription, got $delta")
    }

    // 3b'. METADATA-ONLY AGGREGATES at 2,400-leaf scale: COUNT/MIN/MAX
    // served from parquet footers across every leaf — the cost is ONE
    // distributed footer job over the file list, compared against a
    // real count of the same snapshot
    timed("footer_metadata_agg") {
      import graft.ops.FooterStats
      val vals = FooterStats.aggregate(spark, table, None, Seq(
        FooterStats.RowCount,
        FooterStats.MinOf("o_custkey", org.apache.spark.sql.types.LongType),
        FooterStats.MaxOf("o_custkey", org.apache.spark.sql.types.LongType)))
      val n = vals(0).asInstanceOf[Long]
      val scanned = VersionedTable.readAt(spark, table).count()
      require(n == scanned,
        s"footer count $n != scanned $scanned")
      require(vals(1).asInstanceOf[Long] <= vals(2).asInstanceOf[Long])
      println(s"[lakehouse-rehearsal] footer agg: $n rows, custkey in " +
        s"[${vals(1)}, ${vals(2)}]")
    }

    // 3b''. PARTITION-SCOPED OPTIMIZE: re-cluster exactly one day's
    // leaves while ~2,400 others carry verbatim — the nightly cadence;
    // cost must track the slice, the carry is manifest-sized
    timed("optimize_one_day") {
      val (_, rewritten, carried, st) = VersionedTable.optimizePartition(
        spark, table, s"o_orderdate_day=$lo", Seq("o_custkey"),
        128L * 1024 * 1024).getOrElse(
        sys.error("scoped optimize lost a race on a private table"))
      require(rewritten >= 1, "the replaced day must rewrite")
      println(s"[lakehouse-rehearsal] scoped optimize: $rewritten " +
        s"leaves -> ${st.filesAfter} files, carried $carried entries")
    }

    // 3c. RENAME under load: metadata-only publish, then a full-scan
    // aggregate where every one of the ~2,400 leaves reads the old
    // physical name through the alias chain
    timed("rename_column") {
      VersionedTable.renameColumn(spark, table, "price", "amount")
    }
    timed("mixed_name_full_agg") {
      val r = VersionedTable.readAt(spark, table)
        .agg(count(lit(1)), sum(col("amount"))).head()
      require(r.getLong(0) > 0 && r.getDecimal(1) != null)
    }

    // 3d. SPEC EVOLUTION: days→months as a metadata-only commit, then a
    // whole-month dynamic overwrite where the ~30 replaced leaves are
    // PRE-EVOLUTION day leaves dropped by token refinement — O(batch),
    // never an old-era rewrite
    timed("evolve_days_to_months") {
      VersionedTable.evolvePartitionSpec(spark, table, "months(o_orderdate)")
    }
    timed("evolved_month_replace") {
      val reload = VersionedTable.readAt(spark, table)
        .filter(col("o_orderdate").between(lo, hi))
        .withColumn("amount", (col("amount") + lit(1)).cast("decimal(18,2)"))
      val (_, replaced, carried) =
        VersionedTable.overwritePartitions(spark, table, reload).get
      require(replaced >= 25 && replaced <= 32,
        s"refinement should drop the month's day leaves, replaced=$replaced")
      println(s"[lakehouse-rehearsal] evolved replace: $replaced day " +
        s"leaves -> 1 month leaf, carried $carried")
    }
    timed("cross_era_pruned_read") {
      val fields = VersionedTable.allPartitionFieldsOf(
        VersionedTable.tableProperties(spark, table))
      val (df, kept, total) = VersionedTable.readAtPrunedPreds(spark,
        table, None, Nil, graft.ops.PartFields.prunePredicates(fields, Seq(
          org.apache.spark.sql.sources.GreaterThanOrEqual("o_orderdate", lo),
          org.apache.spark.sql.sources.LessThanOrEqual("o_orderdate",
            java.sql.Date.valueOf(d0.plusMonths(14).minusDays(1))))))
      val n = df.count()
      println(s"[lakehouse-rehearsal] cross-era prune kept $kept of " +
        s"$total entries, $n rows")
      require(kept < total / 10,
        "the two-month window must prune >90% across BOTH eras")
      require(n > 0)
    }

    // 3e. MATERIALIZED VIEW over the wide table: create pays one full
    // aggregate; a one-day append then refreshes by folding ONLY that
    // day's change feed into the aggregate-sized state — the refresh
    // must cost O(day + |MV|), never a rescan of the ~2,400-leaf table
    val mvRoot = s"$table-mv"
    hfs.delete(new org.apache.hadoop.fs.Path(mvRoot), true)
    timed("mview_create_full") {
      require(graft.ops.MaterializedView.create(spark, mvRoot, table,
        Seq("o_custkey"), "cnt:count, rev:sum(amount)"),
        "mview must create on a private root")
    }
    timed("mview_one_day_append") {
      val day = java.sql.Date.valueOf(d0.plusMonths(18))
      val extra = VersionedTable.readAt(spark, table)
        .filter(col("o_orderdate") === day)
        .withColumn("o_orderkey", -col("o_orderkey")) // fresh row ids
      VersionedTable.commit(spark, table, extra, overwrite = false)
    }
    val refreshed = timed("mview_incremental_refresh") {
      graft.ops.MaterializedView.refresh(spark, mvRoot)
    }
    require(refreshed.mode == "incremental",
      s"one-day append must fold incrementally, got $refreshed")
    println(s"[lakehouse-rehearsal] mview refresh folded " +
      s"${refreshed.changedGroups} groups")
    timed("mview_noop_refresh") {
      require(graft.ops.MaterializedView.refresh(spark, mvRoot).mode
        == "noop", "second refresh must be a noop")
    }

    // 4. large MoR tombstone set (~10% of keys), then the two read paths
    timed("mor_delete_10pct") {
      val Some((_, nKeys)) = VersionedTable.deleteWhereMor(spark, table,
        pmod(col("o_orderkey"), lit(10)) === 3, "o_orderkey")
      println(s"[lakehouse-rehearsal] tombstoned $nKeys keys")
    }
    val afterDelete = timed("dv_read_broadcast") {
      VersionedTable.readAt(spark, table).count()
    }
    val shuffled = timed("dv_read_shuffled_degrade") {
      // floor the threshold: the DV byte gate must flip the anti-join
      // to the shuffled path and produce the same count
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      try VersionedTable.readAt(spark, table).count()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    require(afterDelete == shuffled,
      s"degrade path disagreed: $afterDelete vs $shuffled")

    // 5. fold-merge over the outstanding tombstones (O(DV bytes) fold-in)
    timed("fold_merge") {
      val sourceRows = orders
        .filter(pmod(col("o_orderkey"), lit(100)) === 3) // 1/10 of tombstoned
        .withColumnRenamed("price", "amount") // the post-rename logical name
        .withColumn("amount", (col("amount") + lit(2)).cast("decimal(18,2)"))
      require(VersionedTable.mergeInto(spark, table, sourceRows,
        "o_orderkey").isDefined, "fold-merge lost a race on a private table")
    }
    val afterMerge = timed("post_merge_read") {
      VersionedTable.readAt(spark, table).count()
    }
    println(s"[lakehouse-rehearsal] rows: afterDelete=$afterDelete afterMerge=$afterMerge")

    // 6. compact materializes what's left
    timed("compact_materialize") {
      require(VersionedTable.compact(spark, table).isDefined)
    }
    val finalRows = VersionedTable.readAt(spark, table).count()
    require(finalRows == afterMerge,
      s"compaction changed content: $afterMerge -> $finalRows")
    println(s"[lakehouse-rehearsal] done, final rows $finalRows")
    spark.stop()
  }
}
