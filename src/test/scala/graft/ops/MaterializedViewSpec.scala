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

  test("grammar gates: min/max refused, count mandatory, collisions refused") {
    intercept[IllegalArgumentException](
      MaterializedView.parseAggs("m:min(x), c:count"))
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
}
