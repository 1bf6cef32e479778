package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the MATCH_RECOGNIZE-style pattern query: real-data structural
  * invariants plus a hand-checked journey recomputed test-side.
  */
class EventPatternsSpec extends SparkSpec {

  test("q107: counts match a test-side regex over the reassembled journey") {
    val rows = graft.SparkEntry.queries("q107_event_pattern")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows.nonEmpty)
    // reassemble each user's journey independently and re-count
    val ev = Q.t(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val chars = Map("signup" -> 'S', "view" -> 'V', "click" -> 'C',
      "purchase" -> 'P', "error" -> 'E')
    ev.groupBy(_._1).foreach { case (uid, events) =>
      // full microsecond precision: getTime alone truncates to millis and
      // could order sub-millisecond-distinct events differently than the
      // query's timestamp sort
      val journey = events
        .sortBy(e => (e._2.toInstant.getEpochSecond, e._2.toInstant.getNano, e._3))
        .map(e => chars(e._4)).mkString
      val row = rows(uid)
      assert(row.getAs[Int]("journey_len") === journey.length, s"user $uid")
      assert(row.getAs[Int]("n_conversions") ===
        "VC*P".r.findAllIn(journey).length, s"user $uid")
      assert(row.getAs[Int]("n_error_bursts") ===
        "EE+".r.findAllIn(journey).length, s"user $uid")
      val maxRun = "C+".r.findAllIn(journey).map(_.length).maxOption.getOrElse(0)
      assert(row.getAs[Int]("max_click_run") === maxRun, s"user $uid")
      assert(row.getAs[Boolean]("signup_then_purchase") ===
        "S.*P".r.findFirstIn(journey).isDefined, s"user $uid")
    }
  }
}
