package graft.ops

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins `Q.t`'s events.ts loader against ALL THREE physical encodings the
  * driver's testdata has shipped in — independent of whatever encoding the
  * live testdata currently uses. The r7/r8 incident class: a testdata
  * regeneration flips the parquet physical type, a loader branch that
  * nothing exercises regresses silently, and 7 downstream `unix_micros`
  * queries die. Each fixture here is written with the raw parquet-java
  * Group API (Spark's writer cannot produce TIMESTAMP(NANOS)), so every
  * branch of `Q.t` stays pinned even when the live data exercises only one:
  *
  *   1. int64 TIMESTAMP(NANOS, adjustedToUTC=true)  → read as LONG under
  *      `nanosAsLong` → the floor-division branch (incl. pre-epoch floor);
  *   2. int64 TIMESTAMP(MICROS, adjustedToUTC=false) (pandas NTZ) → read as
  *      TIMESTAMP_NTZ → the cast-reinterpret branch (session tz is UTC);
  *   3. int64 TIMESTAMP(MICROS, adjustedToUTC=true) → plain TIMESTAMP →
  *      passthrough.
  *
  * All three must normalize to IDENTICAL TimestampType micros.
  */
class LoaderEncodingSpec extends SparkSpec {

  /** Expected normalized micros per event_id — shared by all encodings.
    * Includes a pre-epoch, non-round-microsecond instant: nanos→micros must
    * FLOOR (round toward -∞), matching DuckDB's ns→µs conversion, not
    * truncate toward zero.
    */
  private val expectedMicros: Seq[(Long, Long)] = Seq(
    1L -> -1000001L,            // pre-epoch
    2L -> 0L,                   // the epoch itself
    3L -> 86400000000L,         // 1970-01-02
    4L -> 1700000000123456L)    // a modern full-precision instant

  /** Sub-microsecond nanosecond remainders for the NANOS fixture: flooring
    * must erase each of these, on positive AND pre-epoch values.
    */
  private val nanoRemainders = Map(1L -> 999L, 2L -> 0L, 3L -> 1L, 4L -> 567L)

  private def eventsSchema(adjustedToUtc: Boolean, unit: TimeUnit): MessageType =
    Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, unit))
        .named("ts"))
      .named("events")

  /** Writes a one-file events.parquet into a fresh dir; returns the dir. */
  private def writeFixture(tag: String, adjustedToUtc: Boolean, unit: TimeUnit,
      tsValue: Long => Long): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_enc_$tag")
    dir.toFile.deleteOnExit()
    val file = dir.resolve("events.parquet")
    file.toFile.deleteOnExit()
    val schema = eventsSchema(adjustedToUtc, unit)
    val writer = ExampleParquetWriter.builder(new HPath(file.toString))
      .withConf(new Configuration()).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try expectedMicros.foreach { case (id, micros) =>
      writer.write(f.newGroup().append("event_id", id).append("ts", tsValue(micros)))
    } finally writer.close()
    dir.toString
  }

  private lazy val nanosDir =
    writeFixture("nanos", adjustedToUtc = true, TimeUnit.NANOS,
      micros => micros * 1000L + nanoRemainders(expectedMicros.find(_._2 == micros).get._1))
  private lazy val ntzDir =
    writeFixture("ntz", adjustedToUtc = false, TimeUnit.MICROS, identity)
  private lazy val utcDir =
    writeFixture("utc", adjustedToUtc = true, TimeUnit.MICROS, identity)
  // the hypothetical FOURTH encoding the r9 ADVICE flagged: TIMESTAMP(MILLIS)
  // — Spark scales it to TimestampType on read, so Q.t's passthrough branch
  // must carry it through unchanged (all expectedMicros are millis-exact
  // except the sub-milli instants, which this fixture floors to millis)
  private lazy val millisDir =
    writeFixture("millis", adjustedToUtc = true, TimeUnit.MILLIS,
      micros => Math.floorDiv(micros, 1000L))

  /** The physical type each fixture surfaces as on RAW read — if any of
    * these shifts (a Spark upgrade, a flag change, a 4th encoding), this
    * fails before the normalization asserts can mislead.
    */
  test("raw reads exercise three distinct loader branches") {
    def rawType(dir: String) =
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(rawType(nanosDir) === LongType,
      "TIMESTAMP(NANOS) must surface as LONG under nanosAsLong")
    assert(rawType(ntzDir) === TimestampNTZType,
      "unadjusted micros must surface as TIMESTAMP_NTZ")
    assert(rawType(utcDir) === TimestampType,
      "UTC-adjusted micros must surface as plain TIMESTAMP")
  }

  test("Q.t normalizes all three encodings to identical TimestampType micros") {
    for ((dir, tag) <- Seq((nanosDir, "nanos"), (ntzDir, "ntz"), (utcDir, "utc"))) {
      val df = Q.t(spark, dir, "events")
      assert(df.schema("ts").dataType === TimestampType, s"[$tag] normalized type")
      val got = df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === expectedMicros, s"[$tag] normalized micros")
    }
  }

  test("TIMESTAMP(MILLIS) rides the passthrough branch with correct scaling") {
    assert(spark.read.parquet(s"$millisDir/events.parquet")
      .schema("ts").dataType === TimestampType,
      "millis must surface as plain TIMESTAMP (the passthrough branch)")
    val df = Q.t(spark, millisDir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val expect = expectedMicros.map { case (id, us) =>
      (id, Math.floorDiv(us, 1000L) * 1000L)
    }
    assert(got === expect, "millis values must scale to micros, not pass raw")
  }

  test("non-events tables pass through Q.t untouched") {
    // the ts normalization is keyed on the table NAME — a same-shaped file
    // under another name must not be rewritten
    val df = spark.read.parquet(s"$nanosDir/events.parquet")
    val copyDir = java.nio.file.Files.createTempDirectory("graft_enc_other")
    copyDir.toFile.deleteOnExit()
    df.write.mode("overwrite").parquet(s"$copyDir/other.parquet")
    val other = Q.t(spark, copyDir.toString, "other")
    assert(other.schema("ts").dataType === LongType)
  }
}
