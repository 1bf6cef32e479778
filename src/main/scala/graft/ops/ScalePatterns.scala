package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Scale-pattern operators: techniques that only matter when one key or one
  * file dwarfs the rest — demonstrated at test scale, oracle-checked to be
  * semantically identical to their naive forms.
  */
object ScalePatterns {

  def pack: Seq[Q] = Seq(q30SaltedAgg)

  /** Skew-resistant aggregation: two-phase salted groupBy. A hot key (here
    * event_type, 5 values total — pathological at 100 TB) is split across
    * 16 salt shards for the partial aggregate, then the shards are merged
    * in a second, tiny aggregation. Shuffle 1 spreads the hot key over
    * `SaltBuckets` reducers instead of one; shuffle 2 moves only
    * (#keys × #salts) rows. The oracle is the PLAIN group-by — salting
    * must be a pure execution-plan change, never a semantic one.
    */
  val SaltBuckets = 16

  val q30SaltedAgg: Q = Q(
    "q30_salted_agg",
    (s, dir) => {
      val events = t(s, dir, "events")
      events
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(SaltBuckets)))
        .groupBy(col("event_type"), col("salt"))
        .agg(
          count(lit(1)).as("pn"),
          sum(Q.dec2(col("value"))).as("pv"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("pn")).cast("long").as("n"),
          sum(col("pv")).cast("double").as("total_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n, ${Q.sumDec("value")} AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""))
}
