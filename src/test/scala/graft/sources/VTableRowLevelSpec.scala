package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.VersionedTable

class VTableRowLevelSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("vtrl").toString
    spark.conf.set("spark.sql.catalog.vtrl", classOf[VTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtrl.root", r)
    spark.conf.set("spark.sql.catalog.vtrl.pruneCol", "id")
    r
  }

  private def rows(sql: String): Set[(Int, Int)] =
    spark.sql(sql).collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private def lastKind(path: String): String =
    VersionedTable.commitKind(spark, path,
      VersionedTable.versions(spark, path).last)

  // generation dirs of one manifest, via the documented plain-text format
  private def dirsOf(path: String, v: Long): Seq[String] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_log", s"$v.commit")), "UTF-8")
      .split("\n").map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSeq

  test("SQL UPDATE rewrites only the generations holding a touched key") {
    val path = s"$root/u/t"
    spark.sql("CREATE TABLE vtrl.u.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO vtrl.u.t VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO vtrl.u.t VALUES (3, 30), (4, 40)")
    val vPre = VersionedTable.versions(spark, path).last
    val dirsPre = dirsOf(path, vPre)
    spark.sql("UPDATE vtrl.u.t SET v = v * 10 WHERE id IN (3, 4)")
    assert(rows("SELECT id, v FROM vtrl.u.t") ==
      Set((1, 10), (2, 20), (3, 300), (4, 400)))
    assert(lastKind(path) == "update")
    // generation granularity: keys 3,4 live in ONE generation — the
    // other two (create's empty + the first insert) carry over verbatim
    val dirsPost = dirsOf(path, vPre + 1)
    assert(dirsPre.count(dirsPost.contains) == dirsPre.size - 1,
      s"exactly one generation must rewrite: $dirsPre -> $dirsPost")
    // time travel: the pre-update snapshot is intact
    assert(rows(s"SELECT id, v FROM vtrl.u.t VERSION AS OF $vPre") ==
      Set((1, 10), (2, 20), (3, 30), (4, 40)))
    // statement staging is reclaimed
    val staging = new org.apache.hadoop.fs.Path(path, "_staging")
    val hfs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(staging) || hfs.listStatus(staging).isEmpty)
  }

  test("SQL MERGE INTO applies update, delete and insert clauses in one commit") {
    val path = s"$root/m/t"
    spark.sql("CREATE TABLE vtrl.m.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO vtrl.m.t VALUES (1, 10), (2, 20), (3, 30)")
    import spark.implicits._
    Seq((2, 200), (3, -1), (4, 400)).toDF("id", "v")
      .createOrReplaceTempView("mrg_src")
    val vPre = VersionedTable.versions(spark, path).last
    spark.sql(
      """MERGE INTO vtrl.m.t AS t USING mrg_src AS s ON t.id = s.id
        |WHEN MATCHED AND s.v < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |""".stripMargin)
    assert(rows("SELECT id, v FROM vtrl.m.t") ==
      Set((1, 10), (2, 200), (4, 400)))
    assert(lastKind(path) == "merge")
    // one statement = ONE commit; the pre-merge snapshot time-travels
    assert(VersionedTable.versions(spark, path).last == vPre + 1)
    assert(rows(s"SELECT id, v FROM vtrl.m.t VERSION AS OF $vPre") ==
      Set((1, 10), (2, 20), (3, 30)))
  }

  test("MERGE with NOT MATCHED BY SOURCE reconciles the target to the source") {
    val path = s"$root/s/t"
    spark.sql("CREATE TABLE vtrl.s.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO vtrl.s.t VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    import spark.implicits._
    Seq((3, 300), (4, 400), (5, 500)).toDF("id", "v")
      .createOrReplaceTempView("mrg_sync_src")
    val vPre = VersionedTable.versions(spark, path).last
    // the full three-way reconciliation (Catalyst plans it as a full
    // outer join over the same delta contract): source rows win, target
    // rows absent from the source age out
    spark.sql(
      """MERGE INTO vtrl.s.t AS t USING mrg_sync_src AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |WHEN NOT MATCHED BY SOURCE AND v < 15 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -v
        |""".stripMargin)
    assert(rows("SELECT id, v FROM vtrl.s.t") ==
      Set((2, -20), (3, 300), (4, 400), (5, 500)))
    assert(lastKind(path) == "merge")
    assert(VersionedTable.versions(spark, path).last == vPre + 1,
      "the whole reconciliation is ONE commit")
    assert(rows(s"SELECT id, v FROM vtrl.s.t VERSION AS OF $vPre") ==
      Set((1, 10), (2, 20), (3, 30), (4, 40)))
  }

  test("DELETE with an untranslatable predicate runs row-level on a keyed table") {
    val path = s"$root/d/t"
    spark.sql("CREATE TABLE vtrl.d.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO vtrl.d.t VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    // id % 2 = 1 translates to no source Filter — on a keyless table
    // this is refused (VTableCatalogSpec pins that); with a declared
    // row id it runs as a delta statement
    spark.sql("DELETE FROM vtrl.d.t WHERE id % 2 = 1")
    assert(rows("SELECT id, v FROM vtrl.d.t") == Set((2, 20), (4, 40)))
    assert(lastKind(path) == "delete")
    // the translatable fast path still lands as a metadata (CoW) delete
    spark.sql("DELETE FROM vtrl.d.t WHERE id = 2")
    assert(rows("SELECT id, v FROM vtrl.d.t") == Set((4, 40)))
    assert(lastKind(path) == "delete")
  }

  test("row-level statements are refused without a declared row-id key") {
    val path = s"$root/k/t"
    require(path.nonEmpty) // touch the lazy catalog registration
    spark.sql("CREATE TABLE vtrl.k.t (id INT, v INT)")
    spark.sql("INSERT INTO vtrl.k.t VALUES (1, 10)")
    intercept[Exception](
      spark.sql("UPDATE vtrl.k.t SET v = 0 WHERE id = 1"))
    intercept[Exception](spark.sql(
      "MERGE INTO vtrl.k.t t USING (SELECT 1 AS id, 2 AS v) s " +
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v"))
    intercept[Exception](
      spark.sql("DELETE FROM vtrl.k.t WHERE id % 2 = 1"))
    assert(rows("SELECT id, v FROM vtrl.k.t") == Set((1, 10)))
  }

  test("the row-id cardinality guard aborts a delta that would clip same-key neighbors") {
    val path = s"$root/g/t"
    spark.sql("CREATE TABLE vtrl.g.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    // the declared key does NOT uniquely identify rows: two rows share id=1
    spark.sql("INSERT INTO vtrl.g.t VALUES (1, 10), (1, 99), (2, 20)")
    val vPre = VersionedTable.versions(spark, path).last
    // the statement targets ONE of the id=1 rows; deleting by key would
    // silently remove the other — the commit must abort instead
    val e = intercept[Exception](
      spark.sql("UPDATE vtrl.g.t SET v = 0 WHERE v = 10"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("row-id")), s"got: ${msgs(e)}")
    // nothing published, nothing lost
    assert(VersionedTable.versions(spark, path).last == vPre)
    assert(rows("SELECT id, v FROM vtrl.g.t") ==
      Set((1, 10), (1, 99), (2, 20)))
    // a statement that targets ALL rows of the duplicated key is exact
    // under delete-by-key, so it proceeds
    spark.sql("UPDATE vtrl.g.t SET v = v + 1 WHERE id = 1")
    assert(rows("SELECT id, v FROM vtrl.g.t") ==
      Set((1, 11), (1, 100), (2, 20)))
  }

  test("a comma-LIST pruneCol records per-column stats through SQL DML") {
    // the catalog documents pruneCol as a comma list; the row-level write
    // path must SPLIT it — a joined "id,v" fed to one min(col(...)) fails
    // analysis AFTER the generation is written, aborting every
    // UPDATE/MERGE/DELETE on the catalog and leaking the orphan
    val r2 = Files.createTempDirectory("vtrl2").toString
    spark.conf.set("spark.sql.catalog.vtrl2", classOf[VTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.vtrl2.root", r2)
    spark.conf.set("spark.sql.catalog.vtrl2.pruneCol", "id,v")
    val path = s"$r2/p/t"
    spark.sql("CREATE TABLE vtrl2.p.t (id INT, v INT) TBLPROPERTIES ('key'='id')")
    spark.sql("INSERT INTO vtrl2.p.t VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("UPDATE vtrl2.p.t SET v = v + 5 WHERE id >= 2")
    assert(rows("SELECT id, v FROM vtrl2.p.t") ==
      Set((1, 10), (2, 25), (3, 35)))
    assert(lastKind(path) == "update")
    // the rewritten generation carries [min,max] headers for BOTH listed
    // columns — data skipping stays live across SQL DML
    val tipV = VersionedTable.versions(spark, path).last
    val meta = VersionedTable.manifestMeta(spark, path, tipV)
    Seq("id", "v").foreach { c =>
      assert(meta.keys.exists(_.startsWith(s"stats:$c:")),
        s"missing stats:$c header in ${meta.keys.toSeq.sorted}")
    }
  }
}
