package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.VersionedTable

class VTableProceduresSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("vtproc").toString
    spark.conf.set("spark.sql.catalog.vtproc", classOf[VTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtproc.root", r)
    r
  }

  private def df(ids: Int*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  private def ids(sql: String): Set[Int] =
    spark.sql(sql).collect().map(_.getInt(0)).toSet

  test("CALL compact rewrites to one generation; a second call reports already-compact") {
    VersionedTable.commit(spark, s"$root/m/t", df(1, 2), overwrite = true)
    VersionedTable.commit(spark, s"$root/m/t", df(3), overwrite = false)
    val r1 = spark.sql("CALL vtproc.system.compact(table => 'm.t')").head()
    assert(r1.getLong(0) == 3L && r1.getBoolean(1))
    assert(VersionedTable.commitKind(spark, s"$root/m/t", 3L) == "rewrite")
    assert(ids("SELECT id FROM vtproc.m.t") == Set(1, 2, 3))
    // already one generation, no DVs: reported, not re-published
    val r2 = spark.sql("CALL vtproc.system.compact('m.t')").head()
    assert(r2.getLong(0) == 3L && !r2.getBoolean(1))
    assert(VersionedTable.versions(spark, s"$root/m/t").last == 3L)
    // INCREMENTAL mode: small_mb coalesces only the micro-batch tail,
    // the bulk generation carries verbatim
    // (the CALL takes whole MB, so the bulk generation must exceed 1 MB)
    VersionedTable.commit(spark, s"$root/m/i",
      spark.range(1500000).selectExpr("CAST(id AS INT) AS id")
        .repartition(1), overwrite = true)
    VersionedTable.commit(spark, s"$root/m/i", df(-1), overwrite = false)
    VersionedTable.commit(spark, s"$root/m/i", df(-2), overwrite = false)
    val r3 = spark.sql(
      "CALL vtproc.system.compact('m.i', small_mb => 1)").head()
    assert(r3.getLong(0) == 4L && r3.getBoolean(1))
    assert(VersionedTable.history(spark, s"$root/m/i").collect()
      .find(_.getLong(0) == 4L).get.getInt(2) == 2,
      "bulk generation + one coalesced tail generation")
    assert(spark.sql("SELECT count(*) FROM vtproc.m.i").head().getLong(0)
      == 1500002L)
  }

  test("CALL optimize clusters into the requested file budget as a rewrite commit") {
    VersionedTable.commit(spark, s"$root/o/t",
      df(1 to 100: _*).repartition(8), overwrite = true)
    val r = spark.sql(
      "CALL vtproc.system.optimize('o.t', 'id', target_mb => 1)").head()
    assert(r.getLong(0) == 2L)
    assert(r.getInt(1) == 8, "files before = the 8 written partitions")
    assert(r.getInt(2) == 1, "100 small rows cluster into one file")
    assert(r.getLong(3) == 100L)
    assert(VersionedTable.commitKind(spark, s"$root/o/t", 2L) == "rewrite")
    assert(ids("SELECT id FROM vtproc.o.t") == (1 to 100).toSet)
  }

  test("CALL optimize with partition => rewrites only that partition's leaves") {
    import spark.implicits._
    VersionedTable.createIfAbsent(spark, s"$root/o/p",
      (1 to 40).map(i => (i, i % 2)).toDF("id", "g").repartition(4),
      Map("partition" -> "g"))
    VersionedTable.commit(spark, s"$root/o/p",
      (41 to 60).map(i => (i, i % 2)).toDF("id", "g").repartition(4),
      overwrite = false)
    val r = spark.sql("CALL vtproc.system.optimize('o.p', 'id', " +
      "target_mb => 1, partition => 'g=1')").head()
    assert(r.getLong(0) == 3L)
    assert(r.getInt(1) > 1 && r.getInt(2) == 1,
      "the g=1 slice clusters into one file")
    assert(r.getLong(3) == 30L, "half of 60 rows live in g=1")
    assert(VersionedTable.commitKind(spark, s"$root/o/p", 3L) == "rewrite")
    assert(ids("SELECT id FROM vtproc.o.p") == (1 to 60).toSet)
    // the no-partition form still whole-table optimizes a routed table
    val r2 = spark.sql(
      "CALL vtproc.system.optimize('o.p', 'id', target_mb => 1)").head()
    assert(r2.getLong(0) == 4L)
    assert(ids("SELECT id FROM vtproc.o.p") == (1 to 60).toSet)
  }

  test("CALL restore + vacuum: rollback as a commit, then reclaim to the retained tip") {
    VersionedTable.commit(spark, s"$root/v/t", df(1), overwrite = true)
    VersionedTable.commit(spark, s"$root/v/t", df(2), overwrite = false)
    VersionedTable.commit(spark, s"$root/v/t", df(3), overwrite = false)
    val r = spark.sql("CALL vtproc.system.restore('v.t', 1)").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(ids("SELECT id FROM vtproc.v.t") == Set(1))
    assert(ids("SELECT id FROM vtproc.v.t VERSION AS OF 3") == Set(1, 2, 3))
    // DRY RUN first: same numbers, nothing touched — old snapshots
    // still time-travel afterwards
    val dry = spark.sql("CALL vtproc.system.vacuum('v.t', " +
      "keep_versions => 1, force => true, dry_run => true)").head()
    assert(dry.getInt(0) == 2 && dry.getInt(1) == 3)
    assert(ids("SELECT id FROM vtproc.v.t VERSION AS OF 3") == Set(1, 2, 3),
      "dry run must not destroy history")
    // keep only the restored tip: the v2/v3 generations die, manifests trim
    val vac = spark.sql(
      "CALL vtproc.system.vacuum('v.t', keep_versions => 1, force => true)")
      .head()
    assert(vac.getInt(0) == 2, "the two appended generations reclaim")
    assert(vac.getInt(1) == 3, "manifests 1-3 trim")
    assert(ids("SELECT id FROM vtproc.v.t") == Set(1), "tip survives vacuum")
  }

  test("CALL history returns the classified ledger; SHOW PROCEDURES lists the surface") {
    VersionedTable.commit(spark, s"$root/h/t", df(1), overwrite = true)
    VersionedTable.commit(spark, s"$root/h/t", df(2), overwrite = false)
    val h = spark.sql("CALL vtproc.system.history('h.t')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(h == Seq((1L, "create"), (2L, "append")))
    val listed = spark.sql("SHOW PROCEDURES IN vtproc.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(listed == Set("compact", "optimize", "restore", "vacuum",
      "partitions", "history", "evolve_partition_spec", "tag", "branch",
      "fast_forward", "create_view", "drop_view", "show_views",
      "create_mview", "refresh_mview", "mview_status", "remove_orphans"))
    intercept[Exception](spark.sql("CALL vtproc.system.nope('h.t')"))
    intercept[Exception](spark.sql("CALL vtproc.system.history('no.table')"))
  }

  test("CALL vacuum older_than trims history by publish TIME; the tip always survives") {
    val p = s"$root/ts/t"
    VersionedTable.commit(spark, p, df(1), overwrite = true)
    Thread.sleep(60) // distinguishable manifest mtimes
    VersionedTable.commit(spark, p, df(2), overwrite = false)
    Thread.sleep(60)
    VersionedTable.commit(spark, p, df(3), overwrite = false)
    val t2 = VersionedTable.commitTimestamp(spark, p, 2L)
    val t3 = VersionedTable.commitTimestamp(spark, p, 3L)
    require(t3 > t2, "publish times must be distinguishable")
    val midMicros = t2 + (t3 - t2) / 2
    val mid = java.time.Instant.ofEpochSecond(midMicros / 1000000L,
      (midMicros % 1000000L) * 1000L).toString
    // dry run first: 2 manifests (v1, v2) are older than the cutoff
    val dry = spark.sql("CALL vtproc.system.vacuum('ts.t', force => true," +
      s" dry_run => true, older_than => TIMESTAMP '$mid')").head()
    assert(dry.getInt(1) == 2, s"dry run reports v1+v2: $dry")
    val r = spark.sql("CALL vtproc.system.vacuum('ts.t', force => true," +
      s" older_than => TIMESTAMP '$mid')").head()
    assert(r.getInt(1) == 2)
    assert(VersionedTable.versions(spark, p) == Seq(3L))
    assert(ids("SELECT id FROM vtproc.ts.t") == Set(1, 2, 3))
    // the tip survives ANY cutoff, even one in the future
    val far = java.time.Instant.ofEpochMilli(System.currentTimeMillis()
      + 3600000L).toString
    val r2 = spark.sql("CALL vtproc.system.vacuum('ts.t', force => true," +
      s" older_than => TIMESTAMP '$far')").head()
    assert(r2.getInt(1) == 0 && VersionedTable.versions(spark, p) == Seq(3L))
  }

  test("CALL remove_orphans reclaims pre-publish debris and nothing else") {
    import org.apache.hadoop.fs.Path
    val t = s"$root/g/t"
    val hfs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a live table with history, a branch, a MoR delete (dv: dir) and
    // an MV-style recorded-CDF commit — every reference kind present
    VersionedTable.commit(spark, t, df(1, 2, 3), overwrite = true,
      meta = Map("prop:key" -> "id"))
    VersionedTable.commit(spark, t, df(4), overwrite = false)
    VersionedTable.createBranch(spark, t, "audit")
    VersionedTable.commitToBranch(spark, t, "audit", df(9))
    VersionedTable.deleteWhereMor(spark, t,
      org.apache.spark.sql.functions.col("id") === 4, "id")
    val before = hfs.listStatus(new Path(t, "data")).length

    // the planted orphan: a writer that died BEFORE its publish loop —
    // a fully written generation no manifest will ever reference
    df(42, 43).write.parquet(s"$t/data/v-orphaned1")
    df(44).write.parquet(s"$t/data/v-orphaned2")

    // dry run lists both, deletes nothing
    val dry = spark.sql(
      "CALL vtproc.system.remove_orphans('g.t', " +
        "older_than => TIMESTAMP '2099-01-01 00:00:00', " +
        "dry_run => true)").collect()
    assert(dry.map(_.getString(0)).toSet ==
      Set("data/v-orphaned1", "data/v-orphaned2"))
    assert(dry.forall(r => !r.getBoolean(2) && r.getLong(1) > 0L))
    assert(hfs.exists(new Path(t, "data/v-orphaned1")))

    // a cutoff BEFORE every write no-ops (the in-flight protection)
    val early = spark.sql(
      "CALL vtproc.system.remove_orphans('g.t', " +
        "older_than => TIMESTAMP '2000-01-01 00:00:00')").collect()
    assert(early.isEmpty, "nothing is older than a past cutoff")
    assert(hfs.exists(new Path(t, "data/v-orphaned1")))

    // the real run deletes exactly the two orphans; every referenced
    // dir — history, branch staging, dv key lists — survives
    val real = spark.sql(
      "CALL vtproc.system.remove_orphans('g.t', " +
        "older_than => TIMESTAMP '2099-01-01 00:00:00')").collect()
    assert(real.map(_.getString(0)).toSet ==
      Set("data/v-orphaned1", "data/v-orphaned2"))
    assert(real.forall(_.getBoolean(2)))
    assert(!hfs.exists(new Path(t, "data/v-orphaned1")))
    assert(!hfs.exists(new Path(t, "data/v-orphaned2")))
    assert(hfs.listStatus(new Path(t, "data")).length == before,
      "no referenced generation was touched")
    // every read surface still answers
    assert(ids("SELECT id FROM vtproc.g.t") == Set(1, 2, 3))
    assert(VersionedTable.readBranch(spark, t, "audit")
      .collect().map(_.getInt(0)).toSet == Set(1, 2, 3, 4, 9))
    // idempotent: a second call finds nothing
    assert(spark.sql(
      "CALL vtproc.system.remove_orphans('g.t', " +
        "older_than => TIMESTAMP '2099-01-01 00:00:00')").collect().isEmpty)
  }

  test("CALL partitions lists the snapshot's tuple ledger from the manifest alone") {
    import spark.implicits._
    val p = s"$root/pp/t"
    assert(VersionedTable.createIfAbsent(spark, p,
      Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "grp"),
      Map("partition" -> "grp")))
    VersionedTable.commit(spark, p, Seq((4, "a")).toDF("id", "grp"),
      overwrite = false)
    // a plain (tuple-less) generation is part of the honest answer
    VersionedTable.commit(spark, p, Seq(9).toDF("id"), overwrite = false)
    val rows = spark.sql("CALL vtproc.system.partitions('pp.t')")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq("", "grp=a", "grp=b"),
      rows.mkString("|"))
    val byTok = rows.map(r => r._1 -> r).toMap
    assert(byTok("grp=a")._2 == 2, "two a-leaves: create + append")
    assert(byTok("grp=b")._2 == 1)
    assert(rows.forall(_._3 > 0L), "every entry reports on-disk bytes")
    // version-pinned listing: before the plain append there were only
    // the routed tuples
    val atV1 = spark.sql(
      "CALL vtproc.system.partitions('pp.t', version => 1)")
      .collect().map(_.getString(0)).toSeq
    assert(atV1 == Seq("grp=a", "grp=b"), atV1)
  }

  test("CALL evolve_partition_spec changes the layout; DESCRIBE and SQL reads follow") {
    import spark.implicits._
    val p = s"$root/ev/t"
    def day(s: String) = java.sql.Date.valueOf(s)
    assert(VersionedTable.createIfAbsent(spark, p,
      Seq((1, day("2024-01-03")), (2, day("2024-02-10")))
        .toDF("id", "d"),
      Map("partition" -> "days(d)")))
    val r = spark.sql(
      "CALL vtproc.system.evolve_partition_spec('ev.t', 'months(d)')")
      .head()
    assert(r.getLong(0) == 2L && r.getString(1) == "months(d)" &&
      r.getString(2) == "days(d)")
    // DESCRIBE's partitioning section reflects the CURRENT spec
    val desc = spark.sql("DESCRIBE TABLE EXTENDED vtproc.ev.t").collect()
      .map(x => s"${x.getString(0)}|${x.getString(1)}").mkString("\n")
    assert(desc.contains("months(d)"), desc)
    // SQL INSERT routes under the new spec; a base-column predicate
    // reads across both eras through the catalog scan
    spark.sql("INSERT INTO vtproc.ev.t VALUES (3, DATE'2024-03-15')")
    assert(ids("SELECT id FROM vtproc.ev.t WHERE d >= DATE'2024-02-01'")
      == Set(2, 3))
    val sum = VersionedTable.partitionSummary(spark, p).map(_._1)
    assert(sum.count(_.startsWith("d_day=")) == 2 &&
      sum.count(_.startsWith("d_month=")) == 1, sum.mkString(","))
    // the evolve commit is in the history ledger
    assert(spark.sql("CALL vtproc.system.history('ev.t')").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap.apply(2L)
      == "set_partition_spec")
    // a bad spec refuses through the CALL too
    intercept[Exception](spark.sql(
      "CALL vtproc.system.evolve_partition_spec('ev.t', 'days(id)')")
      .collect())
  }

  test("CALL create_mview over a JOIN; refresh reports recomputed_groups") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = Seq((1, 10, 5.0), (2, 10, 3.0), (3, 20, 7.0))
      .toDF("fk", "fdk", "famt")
      .withColumn("famt", col("famt").cast("decimal(18,2)"))
    val dim = Seq((10, "EU"), (20, "US")).toDF("dk", "region")
    VersionedTable.commit(spark, s"$root/mv/fact", fact, overwrite = true)
    VersionedTable.commit(spark, s"$root/mv/dim", dim, overwrite = true)
    val c = spark.sql(
      "CALL vtproc.system.create_mview('mv.rollup', 'mv.fact', 'region', " +
        "'cnt:count, lo:min(famt), hi:max(famt)', " +
        "source2 => 'mv.dim', join_on => 'fdk=dk')").head()
    assert(c.getBoolean(1), "join MV must create")
    assert(spark.sql("SELECT region, cnt FROM vtproc.mv.rollup").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("EU" -> 2L, "US" -> 1L))
    // append-only fact delta: incremental, no min/max recompute
    VersionedTable.commit(spark, s"$root/mv/fact",
      Seq((4, 20, 11.0)).toDF("fk", "fdk", "famt")
        .withColumn("famt", col("famt").cast("decimal(18,2)")),
      overwrite = false)
    val r1 = spark.sql("CALL vtproc.system.refresh_mview('mv.rollup')").head()
    assert(r1.getString(3) == "incremental" && r1.getLong(4) == 0L,
      "append-only window folds with recomputed_groups = 0")
    // dim-side delete retracts a region; min/max recompute that group
    VersionedTable.deleteWhere(spark, s"$root/mv/fact", col("fk") === 1)
    val r2 = spark.sql("CALL vtproc.system.refresh_mview('mv.rollup')").head()
    assert(r2.getString(3) == "incremental" && r2.getLong(4) == 1L,
      "a retraction recomputes exactly the touched group")
    assert(spark.sql(
      "SELECT region, cnt, CAST(lo AS DOUBLE), CAST(hi AS DOUBLE) " +
        "FROM vtproc.mv.rollup").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
      == Map("EU" -> ((1L, 3.0, 3.0)), "US" -> ((2L, 7.0, 11.0))))
    // source2 without join_on (and vice versa) refuses
    intercept[Exception](spark.sql(
      "CALL vtproc.system.create_mview('mv.bad', 'mv.fact', 'region', " +
        "'cnt:count', source2 => 'mv.dim')").collect())
  }
}
