package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("mview_spec").toString

  // (key, grp, amt) rows; amt staged DECIMAL(18,2) so folds are exact
  private def rows(t: (Int, String, java.lang.Double)*): DataFrame = {
    import spark.implicits._
    t.toDF("k", "grp", "amt")
      .withColumn("amt", col("amt").cast("decimal(18,2)"))
  }

  private def mvState(mv: String): Map[String, (Long, Double)] =
    VersionedTable.readAt(spark, mv).collect().map { r =>
      val g = if (r.isNullAt(0)) "NULL" else r.getString(0)
      g -> (r.getLong(r.fieldIndex("cnt")),
        Option(r.getDecimal(r.fieldIndex("rev")))
          .map(_.doubleValue()).getOrElse(Double.NaN))
    }.toMap

  private def fullOf(src: String): Map[String, (Long, Double)] =
    VersionedTable.readAt(spark, src)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(col("amt"), lit(0))).as("rev"))
      .collect().map { r =>
        val g = if (r.isNullAt(0)) "NULL" else r.getString(0)
        g -> (r.getLong(1), r.getDecimal(2).doubleValue())
      }.toMap

  test("create materializes the full aggregate and records the marker") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "a", 5.0), (3, "b", null)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    assert(mvState(mv) === Map("a" -> ((2L, 15.0)), "b" -> ((1L, 0.0))),
      "all-NULL sum group reports 0 (declared IVM semantics)")
    val (folded, tip, stale) = MaterializedView.status(spark, mv)
    assert(folded == tip && !stale)
    // second create at the same root refuses (createIfAbsent contract)
    assert(!MaterializedView.create(spark, mv, src, Seq("grp"), "cnt:count"))
  }

  test("incremental refresh folds appends, updates and deletes; count-0 groups vanish") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "b", 7.0)), overwrite = true,
      meta = Map("prop:key" -> "k"))
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    // append into a + a brand-new group c
    VersionedTable.commit(spark, src,
      rows((3, "a", 2.5), (4, "c", 1.0)), overwrite = false)
    // CoW delete erases group b entirely
    VersionedTable.deleteWhere(spark, src, col("grp") === "b")
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental" && r.changedGroups == 3L,
      s"a, b and c all changed: $r")
    assert(mvState(mv) === fullOf(src))
    assert(!mvState(mv).contains("b"), "retracted-to-zero group removed")
    val (folded, tip, stale) = MaterializedView.status(spark, mv)
    assert(folded == tip && !stale)
  }

  test("noop refresh when already fresh; marker moves atomically with content") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src, rows((1, "a", 1.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"), "cnt:count"))
    val before = VersionedTable.versions(spark, mv).last
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "noop" && r.changedGroups == 0L)
    assert(VersionedTable.versions(spark, mv).last == before,
      "noop refresh publishes nothing")
    // the marker rides the SAME commit as the content: the refreshed
    // tip's properties carry the new source_version
    VersionedTable.commit(spark, src, rows((2, "a", 2.0)), overwrite = false)
    val r2 = MaterializedView.refresh(spark, mv)
    assert(r2.mode == "incremental")
    val props = VersionedTable.tableProperties(spark, mv)
    assert(props("mview.source_version").toLong == r2.sourceVersion)
    // and time travel BEFORE the refresh still reads the old content
    assert(VersionedTable.readAt(spark, mv, Some(before))
      .collect().map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("merge-shaped source commits fold as update pairs") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "b", 3.0)), overwrite = true,
      meta = Map("prop:key" -> "k"))
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    // upsert: k=1 moves from a(10) to a(11); k=5 inserts into b
    VersionedTable.mergeInto(spark, src,
      rows((1, "a", 11.0), (5, "b", 4.0)), "k")
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental")
    assert(mvState(mv) === fullOf(src))
  }

  test("restore in the window falls back to a full recompute") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src, rows((1, "a", 1.0)), overwrite = true)
    val v2 = VersionedTable.commit(spark, src, rows((2, "b", 2.0)),
      overwrite = false)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    VersionedTable.commit(spark, src, rows((3, "c", 3.0)), overwrite = false)
    VersionedTable.restore(spark, src, v2)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "full", s"feed is inexpressible across restore: $r")
    assert(mvState(mv) === fullOf(src))
  }

  test("tag and WAP-publish commits in the window stay incremental") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src, rows((1, "a", 1.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    // a release tag (metadata-only) and a WAP flow (stage on a branch,
    // publish by fast-forward) both land in the delta window
    VersionedTable.tagVersion(spark, src, "rel1")
    VersionedTable.createBranch(spark, src, "audit")
    VersionedTable.commitToBranch(spark, src, "audit", rows((2, "b", 4.0)))
    assert(MaterializedView.refresh(spark, mv).mode == "incremental",
      "a tag alone must NOT force a full recompute")
    assert(mvState(mv) === Map("a" -> ((1L, 1.0))),
      "staged branch rows are invisible until published")
    assert(VersionedTable.fastForward(spark, src, "audit").isDefined)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental" && r.changedGroups == 1L,
      s"wap_publish feeds its staged generations as inserts: $r")
    assert(mvState(mv) === fullOf(src))
  }

  test("where predicate narrows both the create and every refresh") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "a", -5.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)", where = Some("amt > 0")))
    assert(mvState(mv) === Map("a" -> ((1L, 10.0))))
    VersionedTable.commit(spark, src,
      rows((3, "a", 7.0), (4, "a", -1.0)), overwrite = false)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental")
    assert(mvState(mv) === Map("a" -> ((2L, 17.0))),
      "negative-amt rows filtered out of the fold too")
  }

  test("NULL group keys fold into one group, like GROUP BY") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, null, 1.0), (2, null, 2.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    VersionedTable.commit(spark, src, rows((3, null, 4.0)), overwrite = false)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.changedGroups == 1L, "NULL keys are ONE group")
    assert(mvState(mv) === Map("NULL" -> ((3L, 7.0))))
  }

  test("schema types stay pinned across refreshes (no decimal drift)") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src, rows((1, "a", 1.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    val t0 = VersionedTable.readAt(spark, mv).schema
    (1 to 3).foreach { i =>
      VersionedTable.commit(spark, src,
        rows((10 + i, "a", i.toDouble)), overwrite = false)
      MaterializedView.refresh(spark, mv)
    }
    assert(VersionedTable.readAt(spark, mv).schema === t0,
      "decimal + would widen every refresh without the schema pin")
  }

  test("grammar gates: count mandatory, collisions refused; min/max parse") {
    assert(MaterializedView.parseAggs("m:min(x), c:count, x:max(y)")
      .size == 3, "min/max are first-class aggregates since r17")
    intercept[IllegalArgumentException](
      MaterializedView.parseAggs("a:avg(x), c:count")) // avg derives at read
    intercept[IllegalArgumentException](
      MaterializedView.parseAggs("s:sum(x)")) // no count
    intercept[IllegalArgumentException](
      MaterializedView.parseAggs("c:count, c:sum(x)")) // dup name
    val src = freshRoot()
    VersionedTable.commit(spark, src, rows((1, "a", 1.0)), overwrite = true)
    intercept[IllegalArgumentException](MaterializedView.create(spark,
      freshRoot() + "/mv", src, Seq("grp"), "grp:count")) // name = group col
    intercept[IllegalArgumentException](MaterializedView.create(spark,
      freshRoot() + "/mv", src, Seq("grp"), "c:count, s:sum(nope)"))
    // a typo'd WHERE refuses at create, not first refresh
    intercept[Exception](MaterializedView.create(spark,
      freshRoot() + "/mv", src, Seq("grp"), "c:count",
      where = Some("no_such_col > 0")))
  }

  // ---- min/max hybrid fold -------------------------------------------

  private def mmState(mv: String): Map[String, (Long, Double, Double)] =
    VersionedTable.readAt(spark, mv).collect().map { r =>
      val g = if (r.isNullAt(0)) "NULL" else r.getString(0)
      def d(n: String): Double =
        Option(r.getDecimal(r.fieldIndex(n)))
          .map(_.doubleValue()).getOrElse(Double.NaN)
      g -> (r.getLong(r.fieldIndex("cnt")), d("lo"), d("hi"))
    }.toMap

  private def mmFull(src: String): Map[String, (Long, Double, Double)] =
    VersionedTable.readAt(spark, src)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), min(col("amt")).as("lo"),
        max(col("amt")).as("hi"))
      .collect().map { r =>
        val g = if (r.isNullAt(0)) "NULL" else r.getString(0)
        def d(i: Int): Double = Option(r.getDecimal(i))
          .map(_.doubleValue()).getOrElse(Double.NaN)
        g -> (r.getLong(1), d(2), d(3))
      }.toMap

  test("min/max: append-only windows fold without any rescan") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, lo:min(amt), hi:max(amt)"))
    // appends: new extreme in a, new group c, null value in b
    VersionedTable.commit(spark, src,
      rows((4, "a", 2.0), (5, "c", 9.0), (6, "b", null)), overwrite = false)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental" && r.recomputedGroups == 0L,
      "an insert-only window must never trigger a min/max recompute")
    assert(mmState(mv) === mmFull(src))
    // a non-extreme append leaves min/max alone (least/greatest fold)
    VersionedTable.commit(spark, src,
      rows((7, "a", 6.0)), overwrite = false)
    val r2 = MaterializedView.refresh(spark, mv)
    assert(r2.recomputedGroups == 0L)
    assert(mmState(mv) === mmFull(src))
  }

  test("min/max: a delete recomputes exactly the touched groups") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "b", 1.0),
        (5, "c", 4.0)), overwrite = true,
      meta = Map("prop:key" -> "k"))
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, lo:min(amt), hi:max(amt)"))
    // delete a's CURRENT MIN (k=2, amt=5) — the fold cannot undo an
    // extreme retraction, so group a must recompute; b and c must not
    VersionedTable.deleteWhere(spark, src, col("k") === 2)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "incremental")
    assert(r.recomputedGroups == 1L,
      s"only the retracted group recomputes, got ${r.recomputedGroups}")
    assert(mmState(mv) === mmFull(src))
    // an update (merge) is a retraction + insert: touched group recomputes
    VersionedTable.mergeInto(spark, src,
      rows((3, "b", 2.0)), "k")
    val r2 = MaterializedView.refresh(spark, mv)
    assert(r2.recomputedGroups == 1L)
    assert(mmState(mv) === mmFull(src))
    // retract a whole group: liveness removes it before min/max matter
    VersionedTable.deleteWhere(spark, src, col("grp") === "c")
    MaterializedView.refresh(spark, mv)
    assert(mmState(mv) === mmFull(src))
    assert(!mmState(mv).contains("c"))
  }

  // ---- join MVs ------------------------------------------------------

  private def dims(t: (Int, String)*): DataFrame = {
    import spark.implicits._
    t.toDF("dk", "region")
  }

  private def facts(t: (Int, Int, java.lang.Double)*): DataFrame = {
    import spark.implicits._
    t.toDF("fk", "fdk", "famt")
      .withColumn("famt", col("famt").cast("decimal(18,2)"))
  }

  private def joinFull(fact: String, dim: String): Map[String, (Long, Double)] =
    VersionedTable.readAt(spark, fact)
      .join(VersionedTable.readAt(spark, dim), col("fdk") === col("dk"))
      .groupBy("region")
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(col("famt"), lit(0))).as("rev"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap

  private def joinState(mv: String): Map[String, (Long, Double)] =
    VersionedTable.readAt(spark, mv).collect().map(r =>
      r.getString(0) -> (r.getLong(r.fieldIndex("cnt")),
        r.getDecimal(r.fieldIndex("rev")).doubleValue())).toMap

  test("join MV: either-side deltas and the both-sides term fold exactly") {
    val fact = freshRoot(); val dim = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, fact,
      facts((1, 10, 5.0), (2, 10, 3.0), (3, 20, 7.0)), overwrite = true,
      meta = Map("prop:key" -> "fk"))
    VersionedTable.commit(spark, dim,
      dims((10, "EU"), (20, "US")), overwrite = true,
      meta = Map("prop:key" -> "dk"))
    assert(MaterializedView.createJoin(spark, mv, fact, dim,
      Seq(("fdk", "dk")), Seq("region"), "cnt:count, rev:sum(famt)"))
    assert(joinState(mv) === joinFull(fact, dim))

    // fact-only delta (ΔA ⋈ B_old)
    VersionedTable.commit(spark, fact, facts((4, 20, 11.0)),
      overwrite = false)
    val r1 = MaterializedView.refresh(spark, mv)
    assert(r1.mode == "incremental" && r1.changedGroups == 1L)
    assert(joinState(mv) === joinFull(fact, dim))

    // dim-only delta (A_old ⋈ ΔB): a new dim key picks up facts...
    VersionedTable.commit(spark, fact, facts((5, 30, 2.0)),
      overwrite = false) // dangling fact — joins nothing yet
    MaterializedView.refresh(spark, mv)
    VersionedTable.commit(spark, dim, dims((30, "AP")), overwrite = false)
    val r2 = MaterializedView.refresh(spark, mv)
    assert(r2.mode == "incremental")
    assert(joinState(mv) === joinFull(fact, dim),
      "a dim insert must activate previously-dangling facts")

    // BOTH sides move in one window: the ΔA⋈ΔB term is load-bearing —
    // a fact AND its dim row arrive together
    VersionedTable.commit(spark, fact, facts((6, 40, 13.0)),
      overwrite = false)
    VersionedTable.commit(spark, dim, dims((40, "SA")), overwrite = false)
    val r3 = MaterializedView.refresh(spark, mv)
    assert(r3.mode == "incremental")
    assert(joinState(mv)("SA") === ((1L, 13.0)),
      "ΔA⋈ΔB: a fact and its dim arriving in the same window must join")
    assert(joinState(mv) === joinFull(fact, dim))

    // dim-side CoW delete retracts that region's rows (sign product)
    VersionedTable.deleteWhere(spark, dim, col("dk") === 10)
    val r4 = MaterializedView.refresh(spark, mv)
    assert(r4.mode == "incremental")
    assert(!joinState(mv).contains("EU"), "retracted region vanishes")
    assert(joinState(mv) === joinFull(fact, dim))

    // a noop refresh reports both markers fresh
    val r5 = MaterializedView.refresh(spark, mv)
    assert(r5.mode == "noop" && r5.source2Version.isDefined)
    val (_, _, stale) = MaterializedView.status(spark, mv)
    assert(!stale)
  }

  test("join MV: dim-side staleness flips status; restore falls back to full") {
    val fact = freshRoot(); val dim = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, fact, facts((1, 10, 5.0)),
      overwrite = true)
    VersionedTable.commit(spark, dim, dims((10, "EU"), (20, "US")),
      overwrite = true)
    assert(MaterializedView.createJoin(spark, mv, fact, dim,
      Seq(("fdk", "dk")), Seq("region"), "cnt:count, rev:sum(famt)"))
    // dim-only commit: source1 is fresh, the view must still be stale
    VersionedTable.commit(spark, dim, dims((30, "AP")), overwrite = false)
    val (_, _, stale) = MaterializedView.status(spark, mv)
    assert(stale, "a dim-side commit alone makes a join MV stale")
    MaterializedView.refresh(spark, mv)
    // RESTORE on the dim: its feed is inexpressible across the window
    VersionedTable.commit(spark, dim, dims((40, "SA")), overwrite = false)
    VersionedTable.restore(spark, dim,
      VersionedTable.versions(spark, dim).head)
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "full", "feed-inexpressible window → honest recompute")
    assert(joinState(mv) === joinFull(fact, dim))
  }

  test("join MV: create-time gates (overlap, keys, columns)") {
    val fact = freshRoot(); val dim = freshRoot()
    VersionedTable.commit(spark, fact, facts((1, 10, 5.0)), overwrite = true)
    VersionedTable.commit(spark, dim, dims((10, "EU")), overwrite = true)
    // overlapping column names refuse (ambiguous joined frame)
    val dimClash = freshRoot()
    VersionedTable.commit(spark, dimClash,
      dims((10, "EU")).withColumnRenamed("region", "famt"), overwrite = true)
    intercept[IllegalArgumentException](MaterializedView.createJoin(spark,
      freshRoot() + "/mv", fact, dimClash, Seq(("fdk", "dk")),
      Seq("dk"), "cnt:count"))
    // unknown join key / group column refuse at create
    intercept[IllegalArgumentException](MaterializedView.createJoin(spark,
      freshRoot() + "/mv", fact, dim, Seq(("nope", "dk")),
      Seq("region"), "cnt:count"))
    intercept[IllegalArgumentException](MaterializedView.createJoin(spark,
      freshRoot() + "/mv", fact, dim, Seq(("fdk", "dk")),
      Seq("nope"), "cnt:count"))
  }

  test("3-way join MV: pairwise fold, cross terms, retractions, create gates") {
    import spark.implicits._
    val fact = freshRoot(); val d1 = freshRoot(); val d2 = freshRoot()
    val mv = freshRoot() + "/mv"
    def factRows(t: (Int, Int, java.lang.Double)*): DataFrame =
      t.toDF("fk", "dk", "amt")
        .withColumn("amt", col("amt").cast("decimal(18,2)"))
    // fact(fk→d1.k1, dk→d2.k2), d1 carries band, d2 carries seg
    VersionedTable.commit(spark, fact,
      factRows((1, 10, 5.0), (2, 10, 3.0), (3, 20, 7.0)), overwrite = true)
    VersionedTable.commit(spark, d1,
      Seq((1, "lo"), (2, "lo"), (3, "hi")).toDF("k1", "band"),
      overwrite = true)
    VersionedTable.commit(spark, d2,
      Seq((10, "A"), (20, "B")).toDF("k2", "seg"), overwrite = true)

    // gates: overlapping columns anywhere in the chain refuse; a left
    // key must resolve in the ACCUMULATED columns, not just source 1
    intercept[IllegalArgumentException] {
      MaterializedView.createJoinChain(spark, mv + "_x", fact,
        Seq((d1, Seq(("fk", "k1"))), (d1, Seq(("fk", "k1")))),
        Seq("band"), "cnt:count")
    }
    intercept[IllegalArgumentException] {
      MaterializedView.createJoinChain(spark, mv + "_y", fact,
        Seq((d1, Seq(("fk", "k1"))), (d2, Seq(("nope", "k2")))),
        Seq("band"), "cnt:count")
    }
    // a key from the SECOND source resolves for the third join (the
    // accumulated frame carries every earlier source's columns)
    assert(MaterializedView.createJoinChain(spark, mv, fact,
      Seq((d1, Seq(("fk", "k1"))), (d2, Seq(("dk", "k2")))),
      Seq("band", "seg"), "cnt:count, tot:sum(amt)"))

    def state: Map[(String, String), (Long, Double)] =
      VersionedTable.readAt(spark, mv).collect().map(r =>
        (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDecimal(3).doubleValue()))).toMap
    def expected: Map[(String, String), (Long, Double)] =
      VersionedTable.readAt(spark, fact)
        .join(VersionedTable.readAt(spark, d1), col("fk") === col("k1"))
        .join(VersionedTable.readAt(spark, d2), col("dk") === col("k2"))
        .groupBy("band", "seg")
        .agg(count(lit(1)).as("cnt"), sum("amt").as("tot"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDecimal(3).doubleValue()))).toMap

    assert(state == Map(("lo", "A") -> ((2L, 8.0)),
      ("hi", "B") -> ((1L, 7.0))))

    // TWO sources move in ONE window: Δfact activates against Δd2's new
    // key 30 — only the ΔX⋈ΔY cross term at level 2 can produce that
    // row, so this pins the term's existence and its sign product
    VersionedTable.commit(spark, fact,
      factRows((3, 30, 11.0)), overwrite = false)
    VersionedTable.commit(spark, d2,
      Seq((30, "C")).toDF("k2", "seg"), overwrite = false)
    val r1 = MaterializedView.refresh(spark, mv)
    assert(r1.mode == "incremental")
    assert(state == expected)
    assert(state.contains(("hi", "C")), "the cross-term row must appear")

    // a dim-1 CoW delete retracts through BOTH joins (sign product -1)
    assert(VersionedTable.deleteWhere(spark, d1,
      col("k1") === 1).isDefined)
    val r2 = MaterializedView.refresh(spark, mv)
    assert(r2.mode == "incremental")
    assert(state == expected)
    assert(state(("lo", "A")) == ((1L, 3.0)),
      "fk=1's contribution must retract")

    // fact-only move on the 3-way chain stays incremental (Δfact⋈dims)
    VersionedTable.commit(spark, fact,
      factRows((5, 20, 2.0)), overwrite = false)
    assert(MaterializedView.refresh(spark, mv).mode == "incremental")
    assert(state == expected)
    assert(MaterializedView.refresh(spark, mv).mode == "noop")
  }

  test("refresh publishes its delta as recorded CDF; tableChanges serves it") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "b", 5.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    val v0 = VersionedTable.versions(spark, mv).last

    // append: group a updates, group c appears — the refresh commit's
    // recorded CDF must carry exactly that (overwrite shape notwithstanding)
    VersionedTable.commit(spark, src,
      rows((3, "a", 2.0), (4, "c", 7.0)), overwrite = false)
    MaterializedView.refresh(spark, mv)
    val v1 = VersionedTable.versions(spark, mv).last
    val ch = VersionedTable.tableChanges(spark, mv, v0, v1)
      .collect().map(r => (r.getString(r.fieldIndex("grp")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("cnt")))).toSet
    assert(ch == Set(("a", "update_preimage", 1L),
      ("a", "update_postimage", 2L), ("c", "insert", 1L)),
      s"recorded CDF must be the exact group delta, got $ch")

    // noop refresh: marker moves, recorded CDF says "no row changes" —
    // an incremental consumer sees an EMPTY window, not a refusal
    val r = MaterializedView.refresh(spark, mv)
    assert(r.mode == "noop" ||
      VersionedTable.tableChanges(spark, mv, v1,
        VersionedTable.versions(spark, mv).last).isEmpty)

    // vacuum keeps the recorded-CDF dirs of surviving versions: the
    // feed across the kept history must still read after maintenance
    VersionedTable.vacuum(spark, mv, keepVersions = 10, force = true)
    assert(VersionedTable.tableChanges(spark, mv, v0, v1).count() == 3L)
  }

  test("MV over MV: the second tier folds incrementally through every mode") {
    val base = freshRoot(); val mv1 = freshRoot() + "/mv1"
    val mv2 = freshRoot() + "/mv2"
    // base rows: (k, grp, amt); tier 1 groups by grp; tier 2 rolls the
    // tier-1 rows up to a single band by cnt parity — any tier-2
    // definition over tier-1 OUTPUT columns exercises the chain
    VersionedTable.commit(spark, base,
      rows((1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv1, base, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    assert(MaterializedView.create(spark, mv2, mv1, Seq("cnt"),
      "n:count, tot:sum(rev)"))

    def tier2: Map[Long, (Long, Double)] =
      VersionedTable.readAt(spark, mv2).collect().map(r =>
        r.getLong(r.fieldIndex("cnt")) ->
          ((r.getLong(r.fieldIndex("n")),
            r.getDecimal(r.fieldIndex("tot")).doubleValue()))).toMap
    def expectTier2: Map[Long, (Long, Double)] =
      VersionedTable.readAt(spark, base).groupBy("grp")
        .agg(count(lit(1)).as("cnt"),
          sum(coalesce(col("amt"), lit(0))).as("rev"))
        .groupBy("cnt").agg(count(lit(1)).as("n"), sum("rev").as("tot"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDecimal(2).doubleValue()))).toMap

    assert(tier2 == Map(2L -> ((1L, 15.0)), 1L -> ((1L, 1.0))))

    // append → both tiers incremental
    VersionedTable.commit(spark, base,
      rows((4, "b", 3.0), (5, "c", 8.0)), overwrite = false)
    assert(MaterializedView.refresh(spark, mv1).mode == "incremental")
    val r1 = MaterializedView.refresh(spark, mv2)
    assert(r1.mode == "incremental",
      "tier 2 must fold tier 1's recorded CDF, not recompute")
    assert(tier2 == expectTier2)

    // CoW delete (retraction) → still incremental end to end
    assert(VersionedTable.deleteWhere(spark, base,
      col("grp") === "a").isDefined)
    assert(MaterializedView.refresh(spark, mv1).mode == "incremental")
    assert(MaterializedView.refresh(spark, mv2).mode == "incremental")
    assert(tier2 == expectTier2)

    // base restore: tier 1 recomputes honestly (full) — but its publish
    // still records the content diff, so tier 2 STAYS incremental
    assert(VersionedTable.restore(spark, base, 1L).isDefined)
    assert(MaterializedView.refresh(spark, mv1).mode == "full")
    assert(MaterializedView.refresh(spark, mv2).mode == "incremental")
    assert(tier2 == expectTier2)

    // a restore of TIER 1 itself is inexpressible to tier 2 → honest full
    VersionedTable.commit(spark, base,
      rows((6, "d", 4.0)), overwrite = false)
    assert(MaterializedView.refresh(spark, mv1).mode == "incremental")
    assert(VersionedTable.restore(spark, mv1,
      VersionedTable.versions(spark, mv1).init.last).isDefined)
    val r2 = MaterializedView.refresh(spark, mv2)
    assert(r2.mode == "full",
      "a restored tier-1 history cannot feed row-level — recompute")
  }

  test("streaming auto-refresh: appends converge, replays absorb, noops free") {
    val src = freshRoot(); val mv = freshRoot() + "/mv"
    val ckpt = freshRoot() + "/ckpt"
    VersionedTable.commit(spark, src,
      rows((1, "a", 10.0), (2, "b", 3.0)), overwrite = true)
    assert(MaterializedView.create(spark, mv, src, Seq("grp"),
      "cnt:count, rev:sum(amt)"))
    VersionedTable.commit(spark, src, rows((3, "a", 4.0)), overwrite = false)
    VersionedTable.commit(spark, src, rows((4, "c", 8.0)), overwrite = false)

    val q1 = MaterializedView.autoRefresh(spark, mv, ckpt)
    q1.awaitTermination()
    assert(mvState(mv) === fullOf(src), "the stream drives the MV to the tip")
    val (_, _, stale) = MaterializedView.status(spark, mv)
    assert(!stale)
    val vAfter = VersionedTable.versions(spark, mv).last

    // restart with NO new source commits: the replayed/empty run must
    // not commit anything (refresh answers noop off the marker)
    val q2 = MaterializedView.autoRefresh(spark, mv, ckpt)
    q2.awaitTermination()
    assert(VersionedTable.versions(spark, mv).last == vAfter,
      "an idle restart publishes nothing")

    // a FRESH checkpoint replays the whole feed from scratch — the
    // marker absorbs it: one refresh may fire, but content stays exact
    VersionedTable.commit(spark, src, rows((5, "b", 1.0)), overwrite = false)
    val q3 = MaterializedView.autoRefresh(spark, mv, freshRoot() + "/ckpt2")
    q3.awaitTermination()
    assert(mvState(mv) === fullOf(src))
  }
}
