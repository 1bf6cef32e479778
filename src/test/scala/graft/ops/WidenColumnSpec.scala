package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class WidenColumnSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("widen_spec").toString

  private def intRows(vs: Int*): DataFrame = {
    import spark.implicits._
    vs.map(v => (v, s"r$v")).toDF("v", "tag")
  }

  test("widen int→long is metadata-only; mixed eras serve one logical type") {
    val root = freshRoot()
    VersionedTable.commit(spark, root, intRows(1, 2), overwrite = true)
    val preDirs = VersionedTable.manifestDirs(spark, root, 1L)
    val v2 = VersionedTable.widenColumnType(spark, root, "v", LongType)
    assert(VersionedTable.manifestDirs(spark, root, v2) === preDirs,
      "no data moved — same generation dirs")
    assert(VersionedTable.commitKind(spark, root, v2) == "widen_column")
    // logical type is wide; values intact
    val after = VersionedTable.readAt(spark, root)
    assert(after.schema("v").dataType === LongType)
    assert(after.select("v").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // a post-widen append may write genuinely wide values
    import spark.implicits._
    VersionedTable.commit(spark, root,
      Seq((Int.MaxValue.toLong + 7L, "big")).toDF("v", "tag"),
      overwrite = false)
    val mixed = VersionedTable.readAt(spark, root)
    assert(mixed.schema("v").dataType === LongType)
    assert(mixed.select("v").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, Int.MaxValue.toLong + 7L))
    // ...and a NARROW post-widen append still reads wide
    VersionedTable.commit(spark, root, intRows(4), overwrite = false)
    assert(VersionedTable.readAt(spark, root)
      .select("v").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L, Int.MaxValue.toLong + 7L))
    // time travel BEFORE the ALTER serves the original narrow type
    assert(VersionedTable.readAt(spark, root, Some(1L))
      .schema("v").dataType === IntegerType)
  }

  test("re-widen replaces the cast with the wider target") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((java.math.BigDecimal.valueOf(12.34), 1))
        .toDF("d", "k")
        .withColumn("d", col("d").cast(DecimalType(10, 2))),
      overwrite = true)
    VersionedTable.widenColumnType(spark, root, "d", DecimalType(12, 2))
    VersionedTable.widenColumnType(spark, root, "d", DecimalType(16, 2))
    val props = VersionedTable.tableProperties(spark, root)
    assert(props("widen.d") == "decimal(16,2)", "one prop, widest target")
    assert(VersionedTable.readAt(spark, root)
      .schema("d").dataType === DecimalType(16, 2))
    // scale change is NOT a widening (values would re-round)
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, root, "d", DecimalType(18, 4)))
  }

  test("narrowing, reinterpretation and unknown columns refuse") {
    val root = freshRoot()
    VersionedTable.commit(spark, root, intRows(1), overwrite = true)
    VersionedTable.widenColumnType(spark, root, "v", LongType)
    intercept[IllegalArgumentException]( // narrowing back
      VersionedTable.widenColumnType(spark, root, "v", IntegerType))
    intercept[IllegalArgumentException]( // reinterpretation
      VersionedTable.widenColumnType(spark, root, "tag", IntegerType))
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, root, "nope", LongType))
  }

  test("partition transform sources and DV'd columns refuse; raw prop edits refuse") {
    import spark.implicits._
    val root = freshRoot()
    assert(VersionedTable.createIfAbsent(spark, root,
      Seq((1, "a", 10)).toDF("v", "tag", "b"),
      Map("partition" -> "bucket(4,v)", "key" -> "v")))
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, root, "v", LongType))
    // outstanding DV on b: refuse until compacted
    VersionedTable.commit(spark, root,
      Seq((2, "b", 20)).toDF("v", "tag", "b"), overwrite = false)
    VersionedTable.deleteWhereMor(spark, root, col("b") === 20, "b")
    intercept[IllegalArgumentException](
      VersionedTable.widenColumnType(spark, root, "b", LongType))
    // widen.* has a validated editor — raw edits refuse both ways
    intercept[IllegalArgumentException](VersionedTable.setProperties(
      spark, root, Map("widen.b" -> "bigint")))
    intercept[IllegalArgumentException](VersionedTable.setProperties(
      spark, root, Map.empty, unset = Seq("widen.b")))
    intercept[IllegalArgumentException](VersionedTable.createIfAbsent(
      spark, freshRoot(), Seq((1, 2)).toDF("a", "b"),
      Map("widen.a" -> "bigint")))
  }

  test("widen follows a rename and retires with a drop") {
    val root = freshRoot()
    VersionedTable.commit(spark, root, intRows(1, 2), overwrite = true)
    VersionedTable.widenColumnType(spark, root, "v", LongType)
    VersionedTable.renameColumn(spark, root, "v", "val")
    val renamed = VersionedTable.readAt(spark, root)
    assert(renamed.schema("val").dataType === LongType,
      "the cast follows the column across the rename")
    assert(VersionedTable.tableProperties(spark, root)
      .get("widen.val").contains("bigint"))
    VersionedTable.dropColumn(spark, root, "val")
    assert(!VersionedTable.tableProperties(spark, root)
      .keys.exists(_.startsWith("widen.")), "drop retires the cast")
    assert(VersionedTable.readAt(spark, root).columns.toSeq == Seq("tag"))
  }

  test("a full rewrite materializes the wide type and clears the property") {
    val root = freshRoot()
    VersionedTable.commit(spark, root, intRows(1, 2), overwrite = true)
    VersionedTable.commit(spark, root, intRows(3), overwrite = false)
    VersionedTable.widenColumnType(spark, root, "v", LongType)
    val v = VersionedTable.compact(spark, root).get
    assert(!VersionedTable.tableProperties(spark, root, Some(v))
      .contains("widen.v"), "compact cleared the cast")
    // the files themselves are wide now: raw parquet probe
    val dirs = VersionedTable.manifestDirs(spark, root, v)
    val raw = spark.read.parquet(
      dirs.map(d => s"$root/$d"): _*)
    assert(raw.schema("v").dataType === LongType)
    assert(VersionedTable.readAt(spark, root)
      .select("v").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("change feeds deliver an empty delta across the ALTER") {
    val root = freshRoot()
    val v1 = VersionedTable.commit(spark, root, intRows(1), overwrite = true)
    val v2 = VersionedTable.widenColumnType(spark, root, "v", LongType)
    assert(VersionedTable.tableChanges(spark, root, v1, v2).count() == 0L)
    assert(VersionedTable.readChanges(spark, root, v1, v2).count() == 0L)
  }

  test("SQL: ALTER TABLE ... ALTER COLUMN ... TYPE through the catalog") {
    import spark.implicits._
    val root = freshRoot()
    val cat = s"wcat${System.nanoTime() % 100000}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.VTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    Seq((1, "x")).toDF("v", "tag").createOrReplaceTempView("widen_src")
    spark.sql(s"CREATE TABLE $cat.main.t AS SELECT * FROM widen_src")
    spark.sql(s"ALTER TABLE $cat.main.t ALTER COLUMN v TYPE BIGINT")
    val df = spark.sql(s"SELECT v FROM $cat.main.t")
    assert(df.schema("v").dataType === LongType)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a narrowing retype refuses through SQL too
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.main.t ALTER COLUMN v TYPE INT"))
  }
}
