package graft.sources

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.SparkSpec
import graft.ops.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata-only aggregate pushdown (`SupportsPushDownAggregates` →
  * [[VTableAggScan]] over [[graft.ops.FooterStats]]): global COUNT/
  * MIN/MAX answered from parquet footers with NO data scan, refusals
  * wherever exactness cannot be proven, and planner statistics
  * (`SupportsReportStatistics`) sizing scans from the manifest.
  */
class VTableAggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("vtagg").toString
    spark.conf.set("spark.sql.catalog.vtagg",
      classOf[VTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtagg.root", r)
    r
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // pushed = the aggregate vanished from the plan (a local one-row scan
  // replaced scan+aggregate)
  private def isPushed(df: DataFrame): Boolean = {
    val p = planOf(df)
    !p.contains("HashAggregate") && !p.contains("SortAggregate")
  }

  test("count/min/max/count(col) push to a footer scan and stay exact") {
    val t = s"$root/ns/base"
    // two generations (append era) + explicit nulls in nk
    val g1 = (1 to 50).map(i =>
      (i.toLong, i * 2, if (i % 5 == 0) None else Some(i * 10L), s"s$i"))
      .toDF("k", "v", "nk", "s")
    val g2 = (51 to 80).map(i =>
      (i.toLong, i * 2, Some(i * 10L), s"s$i")).toDF("k", "v", "nk", "s")
    VersionedTable.commit(spark, t, g1, overwrite = true)
    VersionedTable.commit(spark, t, g2, overwrite = false)

    val q = spark.sql(
      "SELECT count(*) AS n, min(k) AS mnk, max(k) AS mxk, " +
        "min(v) AS mnv, max(v) AS mxv, count(nk) AS nnk, count(s) AS ns " +
        "FROM vtagg.ns.base")
    assert(isPushed(q), s"expected metadata-agg plan, got:\n${planOf(q)}")
    val r = q.head()
    assert(r.getLong(0) == 80L)
    assert(r.getLong(1) == 1L && r.getLong(2) == 80L)
    assert(r.getInt(3) == 2 && r.getInt(4) == 160)
    assert(r.getLong(5) == 70L, "10 nulls in nk across era 1")
    assert(r.getLong(6) == 80L, "count over a string column serves too")
  }

  test("WHERE, GROUP BY, AVG and DISTINCT refuse pushdown but stay correct") {
    val t = s"$root/ns/refuse"
    VersionedTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i % 4)).toDF("k", "g"), overwrite = true)

    val filtered = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.refuse WHERE k > 10")
    assert(!isPushed(filtered), "a filtered aggregate must scan")
    assert(filtered.head().getLong(0) == 30L)

    val grouped = spark.sql(
      "SELECT g, count(*) AS n FROM vtagg.ns.refuse GROUP BY g")
    assert(!isPushed(grouped), "grouped aggregates must scan")
    assert(grouped.collect().map(_.getLong(1)).sum == 40L)

    val avg = spark.sql("SELECT avg(k) AS a FROM vtagg.ns.refuse")
    assert(!isPushed(avg), "avg has no footer answer")
    assert(avg.head().getDouble(0) == 20.5)

    val dist = spark.sql(
      "SELECT count(DISTINCT g) AS n FROM vtagg.ns.refuse")
    assert(dist.head().getLong(0) == 4L)
  }

  test("outstanding deletion vectors block pushdown; counts stay exact") {
    val t = s"$root/ns/dv"
    VersionedTable.commit(spark, t,
      (1 to 30).map(i => (i.toLong, i)).toDF("k", "v"),
      overwrite = true, meta = Map("prop:key" -> "k"))
    VersionedTable.deleteWhereMor(spark, t, col("k") <= 10, "k")
    assert(VersionedTable.hasDeletionVectors(spark, t))

    val q = spark.sql("SELECT count(*) AS n, max(v) AS m FROM vtagg.ns.dv")
    assert(!isPushed(q),
      "footer counts include DV-deleted rows — pushdown must refuse")
    val r = q.head()
    assert(r.getLong(0) == 20L && r.getInt(1) == 30)
  }

  test("renamed columns block their own min/max; count(*) still pushes") {
    val t = s"$root/ns/ren"
    VersionedTable.commit(spark, t,
      (1 to 25).map(i => (i.toLong, i)).toDF("k", "old"), overwrite = true)
    VersionedTable.renameColumn(spark, t, "old", "fresh")

    val cnt = spark.sql("SELECT count(*) AS n FROM vtagg.ns.ren")
    assert(isPushed(cnt), "row counts are rename-invariant")
    assert(cnt.head().getLong(0) == 25L)

    val mm = spark.sql("SELECT min(fresh) AS mn FROM vtagg.ns.ren")
    assert(!isPushed(mm),
      "a colmap'd column reads adapted per generation — footers can't see it")
    assert(mm.head().getInt(0) == 1)
  }

  test("date and timestamp min/max come back in the right type") {
    val t = s"$root/ns/temporal"
    val rows = (0 until 20).map { i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)),
        Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z")
          .plusSeconds(i * 3600L)))
    }.toDF("d", "ts")
    VersionedTable.commit(spark, t, rows, overwrite = true)

    val q = spark.sql(
      "SELECT min(d) AS mnd, max(d) AS mxd, min(ts) AS mnt, max(ts) AS mxt " +
        "FROM vtagg.ns.temporal")
    val r = q.head()
    assert(r.getDate(0) == Date.valueOf("2024-01-01"))
    assert(r.getDate(1) == Date.valueOf("2024-01-20"))
    assert(r.getTimestamp(2).toInstant ==
      java.time.Instant.parse("2024-06-01T00:00:00Z"))
    assert(r.getTimestamp(3).toInstant ==
      java.time.Instant.parse("2024-06-01T19:00:00Z"))
  }

  test("all-null and schema-evolved columns aggregate exactly") {
    val t = s"$root/ns/nulls"
    // era 1 lacks `extra` entirely; era 2 carries it with some nulls
    VersionedTable.commit(spark, t,
      (1 to 10).map(i => i.toLong).toDF("k"), overwrite = true)
    VersionedTable.commit(spark, t,
      (11 to 20).map(i =>
        (i.toLong, if (i % 2 == 0) Some(i) else None)).toDF("k", "extra"),
      overwrite = false)

    val q = spark.sql(
      "SELECT count(*) AS n, count(extra) AS ne, min(extra) AS mn, " +
        "max(extra) AS mx FROM vtagg.ns.nulls")
    assert(isPushed(q), s"evolved eras still serve:\n${planOf(q)}")
    val r = q.head()
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 5L, "era-1 rows are all-null for extra")
    assert(r.getInt(2) == 12 && r.getInt(3) == 20)

    val allNull = s"$root/ns/allnull"
    VersionedTable.commit(spark, allNull,
      (1 to 5).map(i => (i.toLong, None: Option[Long])).toDF("k", "e"),
      overwrite = true)
    val q2 = spark.sql(
      "SELECT min(e) AS mn, count(e) AS n FROM vtagg.ns.allnull")
    val r2 = q2.head()
    assert(r2.isNullAt(0) && r2.getLong(1) == 0L)
  }

  test("case-divergent eras serve exactly (footer matching is case-insensitive)") {
    val t = s"$root/ns/casediv"
    // era 1 writes "nk"; era 2 writes "NK" — Spark's case-insensitive
    // analysis unions them as one logical column, and the footer engine
    // must see BOTH eras' values (an exact-match lookup would treat one
    // era as all-null and silently drop its values from MIN/MAX/COUNT)
    VersionedTable.commit(spark, t,
      (1 to 10).map(i => (i.toLong, i * 10)).toDF("k", "nk"),
      overwrite = true)
    VersionedTable.commit(spark, t,
      (11 to 20).map(i => (i.toLong, i * 10)).toDF("k", "NK"),
      overwrite = false)
    val q = spark.sql(
      "SELECT count(nk) AS n, min(nk) AS mn, max(nk) AS mx " +
        "FROM vtagg.ns.casediv")
    assert(isPushed(q))
    val r = q.head()
    assert(r.getLong(0) == 20L, "both casings' eras must count")
    assert(r.getInt(1) == 10 && r.getInt(2) == 200,
      "min/max must span both casings' eras")
  }

  test("non-micros timestamp files refuse footer stats toward the exact fallback") {
    val t = s"$root/ns/millits"
    val prevConf = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      val rows = (0 until 10).map(i =>
        Tuple1(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-03-01T00:00:00Z")
            .plusSeconds(i * 60L)))).toDF("ts")
      VersionedTable.commit(spark, t, rows, overwrite = true)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevConf)
    // physical INT64 but MILLIS-annotated: decoding those stats as
    // micros would be 1000x off — the annotation gate must route this
    // through the exact scan instead
    val q = spark.sql(
      "SELECT min(ts) AS mn, max(ts) AS mx FROM vtagg.ns.millits")
    val r = q.head()
    assert(r.getTimestamp(0).toInstant ==
      java.time.Instant.parse("2024-03-01T00:00:00Z"))
    assert(r.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-03-01T00:09:00Z"))
  }

  test("count over complex-typed columns serves via the count-only fallback") {
    val t = s"$root/ns/complex"
    val rows = (1 to 12).map(i =>
      (i.toLong, if (i % 4 == 0) None else Some(Map("a" -> i))))
      .toDF("k", "m")
    VersionedTable.commit(spark, t, rows, overwrite = true)
    // maps are parquet GROUP types (no chunk stats) AND unorderable in
    // Spark — the fallback must count them without ever min/max-ing
    val q = spark.sql(
      "SELECT count(*) AS n, count(m) AS nm FROM vtagg.ns.complex")
    val r = q.head()
    assert(r.getLong(0) == 12L && r.getLong(1) == 9L)
  }

  test("time travel aggregates push against the pinned snapshot") {
    val t = s"$root/ns/tt"
    VersionedTable.commit(spark, t,
      (1 to 10).map(_.toLong).toDF("k"), overwrite = true)
    VersionedTable.commit(spark, t,
      (11 to 30).map(_.toLong).toDF("k"), overwrite = false)

    val q = spark.sql(
      "SELECT count(*) AS n, max(k) AS m FROM vtagg.ns.tt VERSION AS OF 1")
    assert(isPushed(q))
    val r = q.head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(spark.sql("SELECT count(*) FROM vtagg.ns.tt").head().getLong(0)
      == 30L)
  }

  test("GROUP BY identity partition columns pushes to a token-grouped footer scan") {
    val t = s"$root/ns/grouped"
    // createIfAbsent routes the FIRST commit (a property passed via
    // commit meta only routes from the next commit on — using commit
    // here would silently test the fallback instead of the token path)
    require(VersionedTable.createIfAbsent(spark, t,
      (1 to 60).map(i => (i.toLong, i % 3, if (i % 10 == 0) None else Some(i)))
        .toDF("k", "g", "nk"),
      Map("partition" -> "g")))
    VersionedTable.commit(spark, t,
      (61 to 90).map(i => (i.toLong, i % 3, Some(i))).toDF("k", "g", "nk"),
      overwrite = false)
    // the layout must be PROVABLE by tokens — this pins the footer
    // grouping itself, not just the (always-correct) fallback
    import org.apache.spark.sql.types.IntegerType
    assert(graft.ops.FooterStats.aggregateByPartition(spark, t, None,
      Seq(("g", IntegerType)),
      Seq(graft.ops.FooterStats.RowCount)).isDefined,
      "token grouping must serve this layout without a fallback")

    val q = spark.sql(
      "SELECT g, count(*) AS n, min(k) AS mn, max(k) AS mx, " +
        "count(nk) AS nn FROM vtagg.ns.grouped GROUP BY g")
    assert(isPushed(q), s"expected token-grouped metadata plan:\n${planOf(q)}")
    val rows = q.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rows.keySet == Set(0, 1, 2))
    // direct recompute as the oracle
    val expect = (1 to 90).groupBy(_ % 3).map { case (g, is) =>
      g -> ((is.size.toLong, is.min.toLong, is.max.toLong,
        is.count(i => i > 60 || i % 10 != 0).toLong))
    }
    assert(rows == expect)

    // grouping by a NON-partition column must refuse (plan aggregates)
    val byK = spark.sql(
      "SELECT nk, count(*) AS n FROM vtagg.ns.grouped GROUP BY nk")
    assert(!isPushed(byK), "non-partition group-by must scan")
    assert(byK.collect().map(_.getLong(1)).sum == 90L)
  }

  test("grouped pushdown falls back exactly on unprovable tokens") {
    // (a) a pre-partitioning era: entries without __p_ segments
    val mixed = s"$root/ns/grouped_mixed"
    VersionedTable.commit(spark, mixed,
      (1 to 20).map(i => (i.toLong, i % 2)).toDF("k", "g"),
      overwrite = true) // unpartitioned era
    VersionedTable.evolvePartitionSpec(spark, mixed, "g")
    VersionedTable.commit(spark, mixed,
      (21 to 40).map(i => (i.toLong, i % 2)).toDF("k", "g"),
      overwrite = false) // partitioned era
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val q = spark.sql(
      "SELECT g, count(*) AS n FROM vtagg.ns.grouped_mixed GROUP BY g")
    assert(graft.ops.FooterStats.aggregateByPartition(spark, mixed, None,
      Seq(("g", IntegerType)), Seq(graft.ops.FooterStats.RowCount)).isEmpty,
      "a file-bearing unrouted era must be unprovable by tokens")
    assert(!graft.ops.FooterStats.groupingProvable(spark, mixed,
      VersionedTable.versions(spark, mixed).last, Seq(("g", IntegerType))),
      "the plan-time gate must see the unrouted era")
    assert(!isPushed(q),
      "unprovable groupings refuse at PLAN time — the exact aggregate " +
        "runs as a normal distributed plan, never a driver-side collect")
    val m = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(0 -> 20L, 1 -> 20L),
      "mixed-era grouped aggregate must stay exact (internal fallback)")

    // (b) string partition values where Spark's hive rendering collapses
    // null and "" into one token — the two groups must stay distinct.
    // The table IS routed (createIfAbsent), so the fallback trigger is
    // specifically the null-token ambiguity, not missing segments
    val amb = s"$root/ns/grouped_amb"
    require(VersionedTable.createIfAbsent(spark, amb,
      Seq((1L, "a"), (2L, "a"), (3L, null), (4L, ""), (5L, "b"))
        .toDF("k", "g"),
      Map("partition" -> "g")))
    assert(graft.ops.FooterStats.aggregateByPartition(spark, amb, None,
      Seq(("g", StringType)), Seq(graft.ops.FooterStats.RowCount)).isEmpty,
      "the hive null token must refuse string grouping toward the fallback")
    val qa = spark.sql(
      "SELECT g, count(*) AS n FROM vtagg.ns.grouped_amb GROUP BY g")
    val ma = qa.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(ma == Map("a" -> 2L, (null: String) -> 1L, "" -> 1L, "b" -> 1L),
      "null and empty-string partitions are DIFFERENT groups")
    assert(!isPushed(qa),
      "the null-token ambiguity is manifest-visible — refuse at plan time")
  }

  test("partition-exact WHERE pushes to footers of exactly the kept entries") {
    val t = s"$root/ns/filtered"
    // identity-partitioned on g, with a NULL partition leaf (int type:
    // the hive null token is unambiguous for non-strings) and a second
    // generation so kept-entry sets span generations
    require(VersionedTable.createIfAbsent(spark, t,
      (1 to 60).map(i => (i.toLong,
        if (i % 10 == 0) None else Some(i % 3),
        if (i % 7 == 0) None else Some(i * 2L))).toDF("k", "g", "nk"),
      Map("partition" -> "g")))
    VersionedTable.commit(spark, t,
      (61 to 90).map(i => (i.toLong, Some(i % 3), Some(i * 2L)))
        .toDF("k", "g", "nk"),
      overwrite = false)
    def expect(p: Int => Boolean, nullIn: Boolean = false): (Long, Long, Long) = {
      val is = (1 to 90).filter(i =>
        if (i <= 60 && i % 10 == 0) nullIn else p(i % 3))
      (is.size.toLong, is.min.toLong, is.max.toLong)
    }

    val eq = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx " +
        "FROM vtagg.ns.filtered WHERE g = 1")
    assert(isPushed(eq), s"equality WHERE must serve from footers:\n${planOf(eq)}")
    assert(planOf(eq).contains("LocalTableScan"))
    val re = eq.head()
    assert((re.getLong(0), re.getLong(1), re.getLong(2)) == expect(_ == 1))

    val rng = spark.sql(
      "SELECT count(*) AS n, count(nk) AS nn FROM vtagg.ns.filtered " +
        "WHERE g >= 1 AND g < 3")
    assert(isPushed(rng), "range WHERE over tokens must serve")
    val rr = rng.head()
    val rngIs = (1 to 90).filter(i => !(i <= 60 && i % 10 == 0) &&
      (i % 3) >= 1)
    assert(rr.getLong(0) == rngIs.size.toLong)
    assert(rr.getLong(1) == rngIs.count(i => !(i <= 60 && i % 7 == 0)).toLong)

    val in = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered WHERE g IN (0, 2)")
    assert(isPushed(in), "IN over tokens must serve")
    assert(in.head().getLong(0) == expect(g => g == 0 || g == 2)._1)

    // the NULL leaf: IS NULL keeps exactly the hive-null entries; the
    // comparison WHEREs above excluded them (SQL three-valued logic)
    val nul = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered WHERE g IS NULL")
    assert(isPushed(nul), "IS NULL on an int partition column must serve")
    assert(nul.head().getLong(0) == 6L)

    // filtered AND grouped together: both ride the same kept-entry set
    val fg = spark.sql(
      "SELECT g, count(*) AS n FROM vtagg.ns.filtered WHERE g >= 1 GROUP BY g")
    assert(isPushed(fg), "filtered grouped aggregate must serve")
    assert(fg.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      Map(1 -> expect(_ == 1)._1, 2 -> expect(_ == 2)._1))

    // a disjunction across DIFFERENT columns is not partition-exact
    val or = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered WHERE g = 1 OR k = 5")
    assert(!isPushed(or), "cross-column OR must refuse")
    assert(or.head().getLong(0) == expect(_ == 1)._1 + 1L)
  }

  test("filtered pushdown falls back exactly on unprovable histories") {
    import org.apache.spark.sql.types.IntegerType
    import org.apache.spark.sql.sources.EqualTo
    // (a) mixed era: an unrouted file-bearing generation has no tokens
    val mixed = s"$root/ns/filtered_mixed"
    VersionedTable.commit(spark, mixed,
      (1 to 20).map(i => (i.toLong, i % 2)).toDF("k", "g"),
      overwrite = true) // pre-partitioning era
    VersionedTable.evolvePartitionSpec(spark, mixed, "g")
    VersionedTable.commit(spark, mixed,
      (21 to 40).map(i => (i.toLong, i % 2)).toDF("k", "g"),
      overwrite = false)
    assert(graft.ops.FooterStats.provableKeptEntries(spark, mixed,
      VersionedTable.versions(spark, mixed).last,
      Seq(("g", IntegerType, EqualTo("g", 1)))).isEmpty,
      "a token-less file-bearing era must be unprovable")
    val q = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered_mixed WHERE g = 1")
    assert(!isPushed(q),
      "mixed eras refuse the aggregate; the absorbed filter still " +
        "applies row-exactly in the ordinary scan")
    assert(q.head().getLong(0) == 20L)

    // (b) string partition with a hive null token: null-vs-'' ambiguity
    val amb = s"$root/ns/filtered_amb"
    require(VersionedTable.createIfAbsent(spark, amb,
      Seq((1L, "a"), (2L, "a"), (3L, null), (4L, ""), (5L, "b"))
        .toDF("k", "s"),
      Map("partition" -> "s")))
    val qa = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered_amb WHERE s = 'a'")
    assert(!isPushed(qa), "string null tokens refuse filtered pushdown")
    assert(qa.head().getLong(0) == 2L)
    // and the row-exact path keeps null ≠ '' distinct
    val qe = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered_amb WHERE s = ''")
    assert(qe.head().getLong(0) == 1L)

    // (c) a clean string-partitioned table (no null leaf) DOES serve
    val clean = s"$root/ns/filtered_str"
    require(VersionedTable.createIfAbsent(spark, clean,
      Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z=w/q"), (5L, "z=w/q"))
        .toDF("k", "s"),
      Map("partition" -> "s")))
    val qs = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered_str WHERE s = 'x'")
    assert(isPushed(qs), "clean string tokens serve filtered pushdown")
    assert(qs.head().getLong(0) == 2L)
    // hive-escaped tokens ('=', '/') compare against the UNESCAPED value
    val qesc = spark.sql(
      "SELECT count(*) AS n FROM vtagg.ns.filtered_str WHERE s = 'z=w/q'")
    assert(isPushed(qesc), "escaped tokens must unescape before compare")
    assert(qesc.head().getLong(0) == 2L)
  }

  test("pushed aggregates answer for the snapshot PINNED at plan time") {
    val t = s"$root/ns/pinned"
    VersionedTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i)).toDF("k", "v"),
      overwrite = true, meta = Map("prop:key" -> "k"))       // v1
    VersionedTable.commit(spark, t,
      (41 to 60).map(i => (i.toLong, i)).toDF("k", "v"),
      overwrite = false)                                     // v2

    val q = spark.sql(
      "SELECT count(*) AS n, max(k) AS mx FROM vtagg.ns.pinned")
    // force physical planning: the builder resolves the tip ONCE (v2),
    // validates the DV gate against it, and the scan serves exactly
    // that snapshot (the LocalTableScan rendering hides the scan
    // description, so the pin is asserted behaviorally below)
    planOf(q)
    assert(isPushed(q))

    // a merge-on-read DELETE lands AFTER planning: the PLANNED query
    // (collect reuses the cached QueryExecution; head() would re-plan)
    // still answers for v2 — snapshot isolation, the TOCTOU the guard
    // closes — while a FRESH query sees the DVs and refuses pushdown
    VersionedTable.deleteWhereMor(spark, t, col("k") > 50, "k")
    val r = q.collect()(0)
    assert(r.getLong(0) == 60L && r.getLong(1) == 60L,
      "the planned scan serves its pinned snapshot")
    val fresh = spark.sql("SELECT count(*) AS n FROM vtagg.ns.pinned")
    assert(!isPushed(fresh), "outstanding DVs refuse a fresh pushdown")
    assert(fresh.head().getLong(0) == 50L)
  }

  test("NDV headers bound grouped outputs: low-NDV aggregate sides broadcast") {
    graft.expr.GraftFunctions.register(spark) // the broadcast-hint rule
    val t = s"$root/ns/ndv"
    val big = spark.range(40000).select(
      (col("id") % 7).as("g"), col("id").as("k"), (col("id") * 3).as("v"))
    VersionedTable.commit(spark, t, big, overwrite = true,
      statsCols = Seq("g", "k"))
    VersionedTable.commit(spark, t,
      big.withColumn("k", col("k") + 40000L), overwrite = false,
      statsCols = Seq("g", "k"))
    // the extended headers carry per-generation NDV (summed = upper bound)
    assert(VersionedTable.scanNdv(spark, t, None, "g")
      .exists(n => n >= 7 && n < 50))
    assert(VersionedTable.scanNdv(spark, t, None, "k").exists(_ > 50000L))
    assert(VersionedTable.scanNdv(spark, t, None, "v").isEmpty,
      "untracked columns have no NDV")
    // the rows field feeds numRows exactly
    assert(VersionedTable.scanRowCount(spark, t, None, Nil, Nil)
      .contains(80000L))

    val fact = s"$root/ns/ndvfact"
    VersionedTable.commit(spark, fact, spark.range(200000).select(
      (col("id") % 7).as("fg"), (col("id") % 80000L).as("fk"),
      col("id").as("fv")), overwrite = true)

    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small threshold isolates the NDV decision: both BASE scans are
      // bigger than it, so only the aggregate bound can earn a hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024).toString)
      val lo = spark.sql(
        "SELECT fg, s FROM vtagg.ns.ndvfact JOIN " +
          "(SELECT g, sum(v) AS s FROM vtagg.ns.ndv GROUP BY g) ON fg = g")
      val hi = spark.sql(
        "SELECT fk, s FROM vtagg.ns.ndvfact JOIN " +
          "(SELECT k, sum(v) AS s FROM vtagg.ns.ndv GROUP BY k) ON fk = k")
      assert(lo.queryExecution.optimizedPlan.toString.contains("broadcast"),
        "7-group aggregate: NDV bound clears the threshold → hint")
      assert(planOf(lo).contains("BroadcastHashJoin"))
      assert(!hi.queryExecution.optimizedPlan.toString.contains("broadcast"),
        "80k-group aggregate: NDV bound exceeds the threshold → no hint")
      // results stay exact on the hinted path
      val expect = spark.range(40000)
        .select((col("id") % 7).as("g"), (col("id") * 3).as("v"))
        .groupBy("g").agg(sum(col("v")).as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1) * 2).toMap // two identical gens
      val got = lo.groupBy("fg").agg(first(col("s"))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("case-colliding schemas refuse aggregate pushdown outright") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val colliding = StructType(Seq(StructField("a", LongType),
      StructField("A", LongType)))
    val clean = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    def builder(schema: StructType) = new VTableScanBuilder(
      "/nonexistent", Some(1L), None, schema,
      aggGuard = Some(VTableAggGuard(() => Some(1L), Set.empty)))
    val agg = new Aggregation(Array(new CountStar), Array.empty)
    assert(!builder(colliding).pushAggregation(agg),
      "colliding names make footer column resolution ambiguous")
    assert(builder(clean).pushAggregation(agg),
      "the same offer pushes on a collision-free schema")
  }

  test("reported statistics size the scan: a small dim broadcasts") {
    graft.expr.GraftFunctions.register(spark)
    val fact = s"$root/ns/fact"
    val dim = s"$root/ns/dim"
    VersionedTable.commit(spark, fact,
      (1 to 5000).map(i => (i.toLong, i % 50)).toDF("k", "d"),
      overwrite = true)
    VersionedTable.commit(spark, dim,
      (0 until 50).map(i => (i, s"name$i")).toDF("d", "nm"),
      overwrite = true)

    val joined = spark.sql(
      "SELECT f.k, d.nm FROM vtagg.ns.fact f JOIN vtagg.ns.dim d " +
        "ON f.d = d.d")
    assert(planOf(joined).contains("BroadcastHashJoin"),
      s"manifest-sized dim must broadcast:\n${planOf(joined)}")
    assert(joined.count() == 5000L)
  }
}
