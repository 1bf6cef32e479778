package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q.t

/** Relational/analytics surface additions, round 6 (continuation): cohort
  * retention, interval-sweep peak concurrency, and a deterministic
  * Bloom-filter pre-join — the runtime-filtering pattern behind
  * "semi-join reduction" on 100 TB fact scans.
  */
object Relational4 {

  def pack: Seq[Q] = Seq(q60CohortRetention, q61PeakConcurrency,
    q62BloomPrejoin, q63ExactDeciles)

  /** q60: monthly COHORT RETENTION over `orders` — the warehouse query
    * behind every retention curve. cohort(c) = first active month of
    * customer c; for every (cohort, months-since) cell, how many of the
    * cohort's customers were active again that month, as exact counts plus
    * integer basis points (active·10⁴ ÷ cohort_size — integer division, so
    * the ratio compares bit-exact across engines with no float surface).
    *
    * Scale shape: one keyed distinct on (customer, month) — the fact table
    * collapses to at most |customers|×|months| rows before anything else —
    * then keyed aggregates on customer and on (cohort, month). The
    * month-level tables (cohort sizes, retention cells) are bounded by the
    * CALENDAR squared, not by data volume, so the final broadcast join is
    * safe by construction at any scale.
    */
  val q60CohortRetention: Q = Q(
    "q60_cohort_retention",
    (s, dir) => {
      // am = zero-based absolute month index (year·12 + month−1): month
      // arithmetic in pure integers, no months_between() float semantics
      val m = t(s, dir, "orders")
        .select(col("o_custkey").as("cust"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .as("am"))
        .distinct()
      val cohort = m.groupBy(col("cust")).agg(min(col("am")).as("cm"))
      val sizes = cohort.groupBy(col("cm"))
        .agg(count(lit(1)).as("cohort_size"))
      val cells = m.join(cohort, "cust")
        .groupBy(col("cm"), (col("am") - col("cm")).as("months_since"))
        .agg(count(lit(1)).as("active_customers"))
      cells.join(broadcast(sizes), "cm")
        .select(
          make_date(expr("cm div 12"), col("cm") % 12 + 1, lit(1))
            .as("cohort_month"),
          col("months_since"), col("active_customers"), col("cohort_size"),
          expr("active_customers * 10000 div cohort_size")
            .as("retention_bp"))
        .orderBy(col("cohort_month"), col("months_since"))
    },
    Some("""
      WITH m AS (
        SELECT DISTINCT o_custkey AS cust,
          year(o_orderdate) * 12 + month(o_orderdate) - 1 AS am
        FROM orders),
      cohort AS (SELECT cust, min(am) AS cm FROM m GROUP BY cust),
      sizes AS (SELECT cm, count(*) AS cohort_size FROM cohort GROUP BY cm),
      cells AS (
        SELECT cm, am - cm AS months_since, count(*) AS active_customers
        FROM m JOIN cohort USING (cust) GROUP BY 1, 2)
      SELECT make_date(cm // 12, cm % 12 + 1, 1) AS cohort_month,
        months_since, active_customers, cohort_size,
        active_customers * 10000 // cohort_size AS retention_bp
      FROM cells JOIN sizes USING (cm)
      ORDER BY cohort_month, months_since"""))

  private val DayUs = 86400000000L

  /** q61: PEAK CONCURRENCY by interval sweep — each event opens a session
    * of `value` minutes; how many sessions were ever open at once, and
    * when was that level first reached? The classic +1/−1 endpoint sweep:
    * net deltas per timestamp, a running sum in global time order, max.
    *
    * The running sum is the scale problem: a naive `Window.orderBy(t)` is
    * a single-task global sort. This uses the d50/d62 TWO-PHASE PREFIX SUM
    * instead — per-day-shard window cumsum (partitioned, parallel) plus a
    * broadcast of per-shard prefix totals (one row per DAY, bounded by the
    * calendar, not the data) — so the sweep scales with executors while
    * the oracle states the same sum as one portable window.
    *
    * Arithmetic is all-integer: timestamps in µs, durations via
    * value·100 (exact DECIMAL(18,2) grid) · 600000 µs — no decimal→int
    * rounding anywhere, so both engines agree bit-exact.
    */
  /** The q61 sweep over any (t0, dur) µs-interval frame — exposed for
    * planted-peak and plan-shape specs.
    */
  def peakConcurrency(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val ep = ev.select(col("t0").as("t"), lit(1L).as("d"))
        .unionAll(ev.select((col("t0") + col("dur")).as("t"),
          lit(-1L).as("d")))
        .groupBy(col("t")).agg(sum(col("d")).as("net"))
        .withColumn("shard", expr(s"t div $DayUs"))
      val local = ep.withColumn("run_local",
        sum(col("net")).over(
          Window.partitionBy(col("shard")).orderBy(col("t"))))
      // one row per shard (day) — the unpartitioned window ranks a
      // calendar-bounded aggregate, the d66 exception pattern
      val prefixes = ep.groupBy(col("shard")).agg(sum(col("net")).as("tot"))
        .withColumn("prefix",
          coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("prefix"))
      val conc = local.join(broadcast(prefixes), "shard")
        .select(col("t"), (col("run_local") + col("prefix")).as("conc"))
      val peak = conc.agg(max(col("conc")).as("peak"))
      conc.join(broadcast(peak), col("conc") === col("peak"))
        .agg(max(col("peak")).as("peak_concurrency"),
          timestamp_micros(min(col("t"))).as("first_peak_at"))
  }

  val q61PeakConcurrency: Q = Q(
    "q61_peak_concurrency",
    (s, dir) => peakConcurrency(t(s, dir, "events")
      .select(unix_micros(col("ts")).as("t0"),
        ((col("value").cast(DecimalType(18, 2)) * 100).cast("long") *
          600000L).as("dur"))),
    Some("""
      WITH ev AS (
        SELECT epoch_us(ts) AS t0,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 600000 AS dur
        FROM events),
      ep AS (
        SELECT t, CAST(sum(d) AS BIGINT) AS net FROM (
          SELECT t0 AS t, 1 AS d FROM ev
          UNION ALL SELECT t0 + dur, -1 FROM ev) x
        GROUP BY t),
      run AS (
        SELECT t, CAST(sum(net) OVER (ORDER BY t) AS BIGINT) AS conc
        FROM ep)
      SELECT (SELECT max(conc) FROM run) AS peak_concurrency,
        make_timestamp((SELECT min(t) FROM run
          WHERE conc = (SELECT max(conc) FROM run))) AS first_peak_at"""))

  // Bloom geometry: 2^16 bits as 1024 64-bit words; 3 independent
  // multiplicative hashes (public xxhash/murmur odd constants).
  private val BloomBits = 65536L
  private val HashP = 1000003L
  private val HashA = Seq(2654435761L, 2246822519L, 3266489917L)
  private val HashB = Seq(17L, 101L, 331L)

  private def posExpr(key: String, i: Int): String =
    s"(($key % $HashP) * ${HashA(i)} + ${HashB(i)}) % $BloomBits"

  /** q62: BLOOM-FILTER PRE-JOIN (semi-join reduction) — build a 2¹⁶-bit
    * Bloom filter over the dim-side join keys (parts of one brand), probe
    * every fact row against it BEFORE the real join, and report the
    * filter's work: rows scanned, rows surviving the Bloom probe, true
    * matches, false positives, and the matched revenue.
    *
    * This is the runtime-filter pattern that makes 100 TB star joins
    * affordable: the filter is CONSTANT-SIZE (1024 words regardless of
    * data volume), broadcasts for free, and eliminates the non-matching
    * bulk of the fact table before the join shuffle — exactly what
    * Spark's own InjectRuntimeFilter/DPP does, here spelled explicitly
    * with deterministic integer hashes so the whole dataflow (bit
    * positions, word ORs, probe masks) is oracle-checkable bit-for-bit.
    * No false negatives by construction: candidates ⊇ matches, which the
    * count columns prove (n_true + n_false_pos = n_bloom_pass).
    */
  /** The q62 dataflow over any dim(k) / fact(k, l_extendedprice) pair —
    * exposed for the planted no-false-negatives spec.
    */
  def bloomPrejoin(dim: org.apache.spark.sql.DataFrame,
      fact: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val pos = HashA.indices
        .map(i => dim.select(expr(posExpr("k", i)).as("p")))
        .reduce(_ unionAll _)
      val bloom = pos
        .groupBy(expr("p div 63").as("w"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT)))")
          .as("bits"))
      val probed = HashA.indices.foldLeft(fact) { (df, i) =>
        val b = bloom.select(col("w").as(s"w$i"), col("bits").as(s"bits$i"))
        df.withColumn(s"p$i", expr(posExpr("k", i)))
          .join(broadcast(b), expr(s"p$i div 63") === col(s"w$i"), "left")
          .withColumn(s"pass$i",
            expr(s"coalesce(bits$i, CAST(0 AS BIGINT)) & " +
              s"shiftleft(CAST(1 AS BIGINT), CAST(p$i % 63 AS INT))") =!= 0L)
      }
      val flagged = probed.select(col("k"), col("l_extendedprice"),
        (col("pass0") && col("pass1") && col("pass2")).as("bloom_pass"))
      val withTruth = flagged.join(broadcast(dim.distinct()
          .withColumn("is_match", lit(true))), Seq("k"), "left")
        .select(col("l_extendedprice"), col("bloom_pass"),
          coalesce(col("is_match"), lit(false)).as("is_match"))
      withTruth.agg(
        count(lit(1)).as("n_fact"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("bloom_pass") && !col("is_match"), 1L).otherwise(0L))
          .as("n_false_pos"),
        sum(when(col("is_match"),
            col("l_extendedprice").cast(DecimalType(18, 2)))
          .otherwise(lit(null))).cast("double").as("matched_revenue"))
  }

  val q62BloomPrejoin: Q = Q(
    "q62_bloom_prejoin",
    (s, dir) => bloomPrejoin(
      t(s, dir, "part").filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey").as("k")),
      Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .select(col("l_partkey").as("k"), col("l_extendedprice"))),
    Some(s"""
      WITH dim AS (
        SELECT p_partkey AS k FROM part WHERE p_brand = 'Brand#13'),
      pos AS (
        ${HashA.indices
          .map(i => s"SELECT ${posExpr("k", i)} AS p FROM dim")
          .mkString("\n        UNION ALL ")}),
      bloom AS (
        SELECT p // 63 AS w,
          bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
        FROM pos GROUP BY 1),
      probed AS (
        SELECT f.l_extendedprice, f.l_partkey AS k,
          ${HashA.indices.map(i =>
            s"""coalesce(b$i.bits, 0) &
              (CAST(1 AS BIGINT) << CAST(${posExpr("f.l_partkey", i)} % 63
                AS INT)) <> 0 AS pass$i""").mkString(",\n          ")}
        FROM lineitem f
        ${HashA.indices.map(i =>
          s"LEFT JOIN bloom b$i ON ${posExpr("f.l_partkey", i)} // 63 = b$i.w")
          .mkString("\n        ")}),
      flagged AS (
        SELECT l_extendedprice, pass0 AND pass1 AND pass2 AS bloom_pass,
          EXISTS (SELECT 1 FROM dim WHERE dim.k = probed.k) AS is_match
        FROM probed)
      SELECT count(*) AS n_fact,
        CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bloom_pass,
        CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        CAST(sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)
          AS BIGINT) AS n_false_pos,
        CAST(sum(CASE WHEN is_match
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
          AS matched_revenue
      FROM flagged"""))

  /** q63: EXACT GLOBAL DECILES without a global sort — the order-statistics
    * problem every profiler hits at scale. Naive exact quantiles sort the
    * whole column through one task; approximate (q34b) trades exactness.
    * This stays exact AND distributed by switching from row order to VALUE
    * order: collapse the column to a (value, count) histogram (keyed agg —
    * the only pass over the data), then run the d50 two-phase prefix sum
    * over the value axis — per-value-shard window cumsum in parallel plus
    * a broadcast of per-shard totals (shards = price÷1000 buckets, bounded
    * by the price DOMAIN, not the row count). Decile k's boundary is the
    * least value whose cumulative count reaches ⌈k·N/10⌉ — integer
    * arithmetic, exact at any scale, and every window in the plan is
    * either partitioned or ranks one-row-per-shard aggregates.
    */
  val q63ExactDeciles: Q = Q(
    "q63_exact_deciles",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .select(col("l_extendedprice").as("v"))
      val h = li.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .withColumn("shard", floor(col("v") / 1000).cast("long"))
      val local = h.withColumn("run_local",
        sum(col("c")).over(Window.partitionBy(col("shard")).orderBy(col("v"))))
      val prefixes = h.groupBy(col("shard")).agg(sum(col("c")).as("tot"))
        .withColumn("prefix",
          coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("prefix"))
      val cum = local.join(broadcast(prefixes), "shard")
        .select(col("v"), (col("run_local") + col("prefix")).as("cum"))
      val n = li.agg(count(lit(1)).as("n"))
      val targets = s.range(1, 10).toDF("decile")
        .crossJoin(broadcast(n))
        .select(col("decile"), expr("(decile * n + 9) div 10").as("target_count"))
      cum.join(broadcast(targets), col("cum") >= col("target_count"))
        .groupBy(col("decile"))
        .agg(min(col("v")).as("boundary_price"),
          min(col("cum")).as("cum_count"),
          min(col("target_count")).as("target_count"))
        .orderBy(col("decile"))
    },
    Some("""
      WITH h AS (
        SELECT l_extendedprice AS v, count(*) AS c FROM lineitem GROUP BY 1),
      cum AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
      n AS (SELECT count(*) AS n FROM lineitem),
      t AS (
        SELECT k AS decile, (k * (SELECT n FROM n) + 9) // 10 AS target_count
        FROM (SELECT unnest(range(1, 10)) AS k))
      SELECT decile, min(v) AS boundary_price, min(cum) AS cum_count,
        min(target_count) AS target_count
      FROM cum JOIN t ON cum.cum >= t.target_count
      GROUP BY decile ORDER BY decile"""))
}
