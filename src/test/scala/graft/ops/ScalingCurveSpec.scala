package graft.ops

import graft.SparkSpec

/** Pins the committed scaling-curve artifact (`SCALING_CURVE.json`,
  * produced by `graft.tools.ScalingProbe`): every registered query must
  * carry a measured sf0.001/0.01/0.1 curve, and none may be flagged
  * superlinear (top-decade log-log slope > the probe's threshold with a
  * non-trivial absolute time). This is the forcing function that keeps
  * the "would it survive 100×" claim MEASURED, not argued: adding a query
  * without re-running the probe fails here, and a query whose data cost
  * quietly went superlinear fails at regeneration time.
  *
  * Regenerate with: `sbt "runMain graft.tools.ScalingProbe"` (~15-25 min;
  * timing happens there, NOT here — this spec only audits the artifact,
  * so the test suite stays fast).
  */
class ScalingCurveSpec extends SparkSpec {

  test("SCALING_CURVE.json covers every registered query, none superlinear") {
    val path = java.nio.file.Paths.get("SCALING_CURVE.json")
    assert(java.nio.file.Files.exists(path),
      "SCALING_CURVE.json missing — run `sbt \"runMain graft.tools.ScalingProbe\"`")
    import spark.implicits._
    val df = spark.read.option("multiLine", true)
      .json(path.toAbsolutePath.toString)
    val rows = df.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("queries")).as("q"))
      .select($"q.name", $"q.slope_top", $"q.flag", $"q.t")
      .collect()
    val measured = rows.map(_.getAs[String]("name")).toSet
    val registered = graft.SparkEntry.queries.keySet
    val missing = registered -- measured
    val stale = measured -- registered
    assert(missing.isEmpty,
      s"queries with NO measured scaling curve (re-run ScalingProbe): " +
        s"${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"scaling curves for queries that no longer exist (re-run " +
        s"ScalingProbe): ${stale.toSeq.sorted.mkString(", ")}")
    val flagged = rows.filter(_.getAs[Boolean]("flag"))
      .map(r => s"${r.getAs[String]("name")} slope=${r.getAs[Double]("slope_top")}")
    assert(flagged.isEmpty,
      s"SUPERLINEAR queries (fix the plan, then re-measure): " +
        flagged.mkString(", "))
    // sanity on the artifact itself: three timings per query, all positive
    rows.foreach { r =>
      val ts = r.getSeq[Double](r.fieldIndex("t"))
      assert(ts.length == 3 && ts.forall(t => t > 0 && !t.isNaN),
        s"malformed timing row for ${r.getAs[String]("name")}: $ts")
    }
  }
}
