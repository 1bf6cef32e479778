package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Scale-pattern operators: techniques that only matter when one key or one
  * file dwarfs the rest — demonstrated at test scale, oracle-checked to be
  * semantically identical to their naive forms.
  */
object ScalePatterns {

  def pack: Seq[Q] = Seq(q30SaltedAgg, q32SaltedJoin, q54Zorder)

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

  /** The weighting dim for q32 — 5 rows, one per event type. In-code AND
    * mirrored verbatim into the oracle's VALUES list.
    */
  private val TypeFactors = Seq(
    ("click", "1.50"), ("error", "0.25"), ("purchase", "3.00"),
    ("signup", "2.00"), ("view", "0.75"))

  /** Skew-resistant JOIN: the fact side's join key has 5 values across
    * ~all rows (the classic hot-key join that sends 20 % of a 100 TB table
    * through one reducer). Salting: the fact takes a deterministic salt in
    * [0, SaltBuckets); the dim is exploded ×SaltBuckets; the join key
    * becomes (type, salt), spreading every hot key over SaltBuckets
    * reducers. Like q30, the oracle is the PLAIN join — salting must be a
    * pure execution-plan change. (Spark would normally BROADCAST a 5-row
    * dim and no skew exists at all — the salted shuffle join is forced
    * here with a broadcast hint disabled via salt explosion + shuffle hint
    * to demonstrate the pattern for dims too big to broadcast.)
    */
  val q32SaltedJoin: Q = Q(
    "q32_salted_join",
    (s, dir) => {
      val events = t(s, dir, "events")
      val dim = s.createDataFrame(TypeFactors.map { case (ty, f) =>
        (ty, new java.math.BigDecimal(f))
      }).toDF("event_type", "factor")
        .withColumn("factor",
          col("factor").cast(org.apache.spark.sql.types.DecimalType(4, 2)))
      val saltedDim = dim.select(col("event_type"), col("factor"),
        explode(array((0 until SaltBuckets).map(lit(_)): _*)).as("salt"))
      val saltedFact = events.withColumn(
        "salt", pmod(xxhash64(col("event_id")), lit(SaltBuckets)).cast("int"))
      saltedFact.hint("shuffle_hash")
        .join(saltedDim.hint("shuffle_hash"), Seq("event_type", "salt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(Q.dec2(col("value")) * col("factor")).cast("double")
            .as("weighted_value"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH dim(event_type, factor) AS (VALUES
        ${TypeFactors.map { case (t, f) => s"('$t', CAST($f AS DECIMAL(4,2)))" }
          .mkString(", ")})
      SELECT e.event_type, count(*) AS n,
        CAST(sum(CAST(e.value AS DECIMAL(18,2)) * d.factor) AS DOUBLE)
          AS weighted_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY e.event_type ORDER BY e.event_type"""))

  /** 16-bit × 16-bit Morton interleave as a flat codegen shift/mask sum —
    * shared by q54 and the file-compaction rewriter
    * ([[graft.ops.Compaction]]). Inputs must already sit in [0, 2¹⁶).
    */
  def mortonKey(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { j =>
      (shiftright(x, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(y, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)

  /** q54: Z-order (Morton) layout key — interleave the bits of two scan
    * dimensions so sorting by the single derived key co-locates rows that
    * are close in BOTH. At warehouse scale this is the data-LAYOUT
    * optimization: files written in z-order carry tight min/max ranges on
    * both source columns, so scans filtered on either dimension prune
    * files (the same reason lakehouse OPTIMIZE ZORDER exists). Here the
    * curve key for (user_id, time-of-day-minute) is computed as a flat
    * 32-term codegen shift/mask sum — pure integer ops, bit-exact in any
    * engine — and the output is the layout ordering itself.
    */
  val q54Zorder: Q = Q(
    "q54_zorder",
    (s, dir) => {
      val x = pmod(col("user_id"), lit(65536L))
      // minute of day (integer µs arithmetic end-to-end — no double epoch)
      val y = pmod(expr("unix_micros(ts) div 60000000"), lit(1440L))
      t(s, dir, "events")
        .select(col("event_id"), x.as("x"), y.as("y"))
        .select(col("event_id"), col("x"), col("y"),
          mortonKey(col("x"), col("y")).as("zval"))
        .orderBy(col("zval"), col("event_id"))
    },
    Some("""
      SELECT event_id, x, y,
        CAST((""" + (0 until 16).map { j =>
          s"((x >> $j) & 1) * ${1L << (2 * j)} + ((y >> $j) & 1) * ${1L << (2 * j + 1)}"
        }.mkString(" + ") + """) AS BIGINT) AS zval
      FROM (
        SELECT event_id,
          user_id % 65536 AS x,
          (epoch_us(ts) // 60000000) % 1440 AS y
        FROM events) t
      ORDER BY zval, event_id"""))
}
