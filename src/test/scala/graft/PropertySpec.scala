package graft

import graft.etl.{Dates, SpotifyTransform}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4), driven by ScalaCheck
  * generators with a fixed seed (the scalatest-scalacheck bridge is not on
  * the offline classpath, so sampling is explicit): multi-format date
  * parsing is total over all three precisions, explode row counts equal the
  * sum of array sizes, and keep-first dedup is idempotent and keeps the
  * minimum position per key.
  */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val dateGen: Gen[(String, String)] = for {
    y <- Gen.choose(1900, 2099)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    precision <- Gen.oneOf(0, 1, 2)
  } yield precision match {
    case 0 => (f"$y%04d", f"$y%04d-01-01")
    case 1 => (f"$y%04d-$m%02d", f"$y%04d-$m%02d-01")
    case _ => (f"$y%04d-$m%02d-$d%02d", f"$y%04d-$m%02d-$d%02d")
  }

  test("parseReleaseDate is total over yyyy / yyyy-MM / yyyy-MM-dd") {
    import spark.implicits._
    val cases = sample(dateGen, 200)
    val got = cases.map(_._1).toDF("raw")
      .select(Dates.parseReleaseDate(col("raw")).cast("string").as("parsed"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("parseReleaseDate yields null only for garbage") {
    import spark.implicits._
    val junk = Seq("not-a-date", "13-13", "", "20231315").toDF("raw")
      .select(Dates.parseReleaseDate(col("raw")).as("parsed"))
    assert(junk.collect().forall(_.isNullAt(0)))
  }

  test("explode row count equals the sum of array sizes") {
    import spark.implicits._
    val arrays = sample(Gen.listOf(Gen.alphaStr), 50)
    val df = arrays.toDF("arr")
    assert(df.select(explode(col("arr"))).count() ===
      arrays.map(_.size.toLong).sum)
  }

  test("keepFirst is idempotent and keeps the minimum position per key") {
    import spark.implicits._
    val rows = sample(
      for {
        pos <- Gen.choose(0, 100000)
        key <- Gen.oneOf("a", "b", "c", "d")
      } yield (pos, key), 80)
      .distinctBy(_._1) // unique positions → a well-defined "first"
    val df = rows.toDF("pos", "k").withColumn("orig_pos", col("pos"))
    val once = SpotifyTransform.keepFirst(df, "k")
    val twice = SpotifyTransform.keepFirst(
      once.withColumn("pos", col("orig_pos")), "k")
    assert(once.count() === rows.map(_._2).distinct.size.toLong)
    assert(twice.collect().toSet === once.collect().toSet)
    val expect = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).min }
    val kept = once.collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Int]("orig_pos")).toMap
    assert(kept === expect)
  }
}
