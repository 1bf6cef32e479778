package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Portable, hash-oracled twins of the engine-internal sketches.
  *
  * q12b (HLL++) and q53 (CountMinAggregator) demonstrate Spark's native
  * sketch machinery, whose internals are engine-specific — no SQL oracle
  * can reproduce them. These two queries re-build the SAME sketch
  * algorithms from first principles on the repo's cross-engine hash bases
  * (the d42 determinization: [[Dedup.mh60]] for strings, the q62
  * multiplicative family for integer keys), so registers, counters, AND the
  * final estimates are plain SQL both engines compute bit-identically —
  * converting the sketch family from spec-bounded to DuckDB-hash-proven
  * (the e58/e63 oracled-twin pattern).
  *
  * Scale shape is the whole point of both sketches and is preserved: each
  * is ONE map-side-combined aggregate over the fact table into a
  * CONSTANT-size state (256 HLL registers / depth×width CMS counters), so
  * the shuffle ships kilobytes regardless of input volume — exactly the
  * behavior that makes them the 100 TB replacements for exact distinct /
  * exact heavy-hitter counting.
  */
object PortableSketches {

  def pack: Seq[Q] = Seq(q12cPortableHll, q53bPortableCms, q34cQuantileSample)

  // ------------------------------------------------------------------ HLL
  // Geometry: p = 8 → m = 256 buckets from the LOW 8 bits of the 60-bit
  // mh60 hash; the remaining 52 bits feed the leading-zero rank. Flajolet
  // et al.'s bias constant α_m = 0.7213/(1 + 1.079/m) for m ≥ 128.
  private val HllM = 256
  private val RankBits = 52 // 60-bit hash minus the 8 bucket bits

  /** α_m · m² · 2^52, folded into ONE double in Scala and embedded in both
    * engines (Spark as the literal, DuckDB via the round-trip decimal
    * string), so the raw estimate is a single deterministic division
    * `AlphaM2Scaled / S` where S = Σ 2^(52 − M_b) is an EXACT integer
    * (max 256·2^52 = 2^60 — comfortably BIGINT).
    */
  private val AlphaM2Scaled: Double =
    0.7213 / (1 + 1.079 / HllM) * (HllM.toDouble * HllM) * (1L << RankBits).toDouble

  /** q12c: PORTABLE HYPERLOGLOG — q12b's approx-distinct (parts per return
    * flag) with the sketch itself spelled relationally: bucket = low 8
    * bits of [[Dedup.mh60]], rank = leading-zero position of the top 52
    * bits (computed as 53 − length(bin(v)) — pure integer/string ops both
    * engines share), register M_b = max rank per (flag, bucket), estimate
    * = α_m·m²·2^52 / Σ 2^(52−M_b) with the standard linear-counting
    * fallback (E ≤ 2.5m and empty buckets exist → m·ln(m/V)). The harmonic
    * sum is kept EXACT by summing the integer numerators 2^(52−M_b) at
    * fixed denominator 2^52 — no order-dependent float accumulation — so
    * registers, Σ, and the estimate all hash-match DuckDB. The 32-bit-era
    * large-range correction is moot here: ranks come from a 52-bit field.
    *
    * Output carries the exact distinct count and the relative error, so
    * the dumped parquet PINS the sketch's accuracy (the q53/d42b audit
    * convention) — expected |rel_err| ≈ 1.04/√256 ≈ 6.5%.
    */
  val q12cPortableHll: Q = Q(
    "q12c_portable_hll",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .select(col("l_returnflag"), col("l_partkey"))
      val h = li.select(col("l_returnflag"),
        Dedup.mh60(col("l_partkey").cast("string")).as("h"))
      val ranked = h.select(col("l_returnflag"),
        (col("h") % HllM).as("bucket"),
        shiftright(col("h"), 8).as("v"))
        .select(col("l_returnflag"), col("bucket"),
          when(col("v") === 0, lit(RankBits + 1))
            .otherwise(lit(RankBits + 1) - length(bin(col("v")))).as("rank"))
      val regs = ranked.groupBy(col("l_returnflag"), col("bucket"))
        .agg(max(col("rank")).as("m_b"))
      val sums = regs.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($RankBits - m_b AS INT))"))
            .as("s_obs"))
        .select(col("l_returnflag"), col("n_buckets"),
          (lit(HllM.toLong) - col("n_buckets")).as("v_empty"),
          (col("s_obs") + (lit(HllM.toLong) - col("n_buckets")) *
            lit(1L << RankBits)).as("s_int"))
      val rawEst = lit(AlphaM2Scaled) / col("s_int").cast("double")
      val est = sums.select(col("l_returnflag"), col("n_buckets"),
        col("v_empty"), col("s_int"),
        when(rawEst <= lit(2.5 * HllM) && col("v_empty") > 0,
          lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("v_empty").cast("double")))
          .otherwise(rawEst).as("raw_est"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      est.join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"), col("n_buckets"),
          col("v_empty"), col("s_int"),
          round(col("raw_est"), 6).as("hll_est"),
          round((col("raw_est") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH h AS (
        SELECT l_returnflag,
          ${Dedup.sqlMh("CAST(l_partkey AS VARCHAR)")} AS h
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, h % $HllM AS bucket,
          CASE WHEN (h >> 8) = 0 THEN ${RankBits + 1}
               ELSE ${RankBits + 1} - length(bin(h >> 8)) END AS rank
        FROM h),
      regs AS (
        SELECT l_returnflag, bucket, max(rank) AS m_b
        FROM ranked GROUP BY l_returnflag, bucket),
      sums AS (
        SELECT l_returnflag,
          CAST(count(*) AS BIGINT) AS n_buckets,
          CAST($HllM - count(*) AS BIGINT) AS v_empty,
          CAST(CAST(sum(CAST(1 AS BIGINT) << CAST($RankBits - m_b AS INT))
                 AS BIGINT)
            + ($HllM - count(*)) * CAST(${1L << RankBits} AS BIGINT)
            AS BIGINT) AS s_int
        FROM regs GROUP BY l_returnflag),
      est AS (
        SELECT l_returnflag, n_buckets, v_empty, s_int,
          CASE WHEN CAST('$AlphaM2Scaled' AS DOUBLE) / CAST(s_int AS DOUBLE)
                      <= ${2.5 * HllM} AND v_empty > 0
               THEN CAST($HllM AS DOUBLE)
                 * ln(CAST($HllM AS DOUBLE) / CAST(v_empty AS DOUBLE))
               ELSE CAST('$AlphaM2Scaled' AS DOUBLE) / CAST(s_int AS DOUBLE)
          END AS raw_est
        FROM sums),
      ex AS (
        SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
        FROM lineitem GROUP BY l_returnflag)
      SELECT est.l_returnflag, ex.n_exact, est.n_buckets, est.v_empty,
        est.s_int,
        round(est.raw_est, 6) AS hll_est,
        round((est.raw_est - CAST(ex.n_exact AS DOUBLE))
          / CAST(ex.n_exact AS DOUBLE), 6) AS rel_err
      FROM est JOIN ex USING (l_returnflag)
      ORDER BY l_returnflag"""))

  // ------------------------------------------------------------------ CMS
  // Geometry: depth 5 × width 64 — deliberately NARROW so the sf0.01 event
  // stream (150 users) actually collides and the overcount column shows
  // the sketch earning its min-of-rows. Hash family: the q62 multiplicative
  // constants extended to depth 5 (public xxhash/murmur/FNV-style odd
  // constants); (k % P) ≤ 1e6 keeps every product < 2^63.
  private val CmsDepth = 5
  private val CmsWidth = 64L
  private val CmsP = 1000003L
  private val CmsA = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L, 374761393L)
  private val CmsB = Seq(17L, 101L, 331L, 709L, 1049L)

  private def cmsPos(key: String, i: Int): String =
    s"(($key % $CmsP) * ${CmsA(i)} + ${CmsB(i)}) % $CmsWidth"

  /** q53b: PORTABLE COUNT-MIN SKETCH — q53's heavy-hitter audit with the
    * sketch as a RELATION: one posexplode fans each event into its
    * (row, bucket) coordinates, one map-side-combined groupBy builds the
    * depth×width counter table (≤ 320 rows regardless of input — the
    * constant-size shuffle that makes CMS the 100 TB frequency sketch),
    * and the exact top-10 users read back min-over-rows point estimates
    * via a broadcast join. All-integer dataflow → the never-undercount
    * invariant (overcount ≥ 0) and the εN envelope are both visible in,
    * and hash-proven by, the dumped parquet.
    */
  val q53bPortableCms: Q = Q(
    "q53b_portable_cms",
    (s, dir) => {
      val ev = Q.spread(t(s, dir, "events"), "event_id")
        .select(col("user_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val arms = (0 until CmsDepth).map(i => expr(cmsPos("user_id", i)))
      val sketch = ev.select(posexplode(array(arms: _*)).as(Seq("i", "bucket")))
        .groupBy(col("i"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(10)
      val probes = exact.select(col("user_id"), col("n_exact"),
        posexplode(array(arms: _*)).as(Seq("i", "bucket")))
      val res = probes.join(broadcast(sketch), Seq("i", "bucket"))
        .groupBy(col("user_id"), col("n_exact"))
        .agg(min(col("cnt")).as("n_est"))
        .select(col("user_id"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("user_id"))
      Q.materialized(res, ev)
    },
    Some(s"""
      WITH ev AS (SELECT user_id FROM events),
      pos AS (
        ${(0 until CmsDepth).map(i =>
          s"SELECT $i AS i, ${cmsPos("user_id", i)} AS bucket FROM ev")
          .mkString("\n        UNION ALL ")}),
      sk AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM pos GROUP BY i, bucket),
      ex AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM ev GROUP BY user_id
        ORDER BY n_exact DESC, user_id LIMIT 10),
      probes AS (
        ${(0 until CmsDepth).map(i =>
          s"SELECT user_id, n_exact, $i AS i, ${cmsPos("user_id", i)} AS bucket FROM ex")
          .mkString("\n        UNION ALL ")}),
      est AS (
        SELECT p.user_id, p.n_exact, CAST(min(s.cnt) AS BIGINT) AS n_est
        FROM probes p JOIN sk s ON p.i = s.i AND p.bucket = s.bucket
        GROUP BY p.user_id, p.n_exact)
      SELECT user_id, n_exact, n_est, n_est - n_exact AS overcount
      FROM est ORDER BY n_exact DESC, user_id"""))

  // ------------------------------------------------- quantile sampling
  /** 1-in-SampleMod deterministic hash sample (the q34b twin's knob). */
  private val SampleMod = 16

  /** The q63 distributed order-statistics device over any (v) column:
    * value histogram → per-value-shard window cumsum + broadcast shard
    * prefixes → (v, cum). Every window is partitioned by the value-DOMAIN
    * shard except the one-row-per-shard prefix ranking, the audited
    * two-phase-prefix-sum exemption (`PortableSketchesSpec` plan-asserts
    * this, since q34c's eager materialization hides it from
    * `WindowAuditSpec`'s sweep). Exposed package-private for that audit.
    */
  private[ops] def cumHist(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("shard", floor(col("v") / 1000).cast("long"))
    val local = h.withColumn("run_local",
      sum(col("c")).over(Window.partitionBy(col("shard")).orderBy(col("v"))))
    val prefixes = h.groupBy(col("shard")).agg(sum(col("c")).as("tot"))
      .withColumn("prefix",
        coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("prefix"))
    local.join(broadcast(prefixes), "shard")
      .select(col("v"), (col("run_local") + col("prefix")).as("cum"))
  }

  /** Decile boundaries from a (v, cum) table + its one-row total. */
  private def decileBounds(cum: org.apache.spark.sql.DataFrame,
      total: org.apache.spark.sql.DataFrame, out: String)
      : org.apache.spark.sql.DataFrame = {
    val s = cum.sparkSession
    val targets = s.range(1, 10).toDF("decile")
      .crossJoin(broadcast(total))
      .select(col("decile"), expr("(decile * n + 9) div 10").as("tc"))
    cum.join(broadcast(targets), col("cum") >= col("tc"))
      .groupBy(col("decile")).agg(min(col("v")).as(out))
  }

  /** q34c: PORTABLE QUANTILE ESTIMATION BY DETERMINISTIC HASH SAMPLING —
    * the oracled twin of q34b's Greenwald-Khanna sketch (whose internals
    * are engine-specific, hence ⊘): sample every row whose [[Dedup.mh60]]
    * of the (orderkey, linenumber) row key is ≡ 0 mod [[SampleMod]] — a
    * property of the ROW, not of engine iteration order, so Spark and
    * DuckDB select the IDENTICAL sample — then take the sample's exact
    * deciles via the q63 shard-window device and audit them against the
    * full-data exact deciles in-query: the output carries both boundaries
    * plus the sample boundary's true rank error in basis points (integer
    * arithmetic end-to-end). Expected |err| ~ √(q(1−q)·SampleMod/N) —
    * fractions of a percent at warehouse row counts.
    *
    * Scale shape: the sample clause is a scan-level filter (no shuffle to
    * sample); both decile passes run the q63 domain-sharded machinery;
    * at 100 TB the sample pass touches 1/16 of the rows and the full pass
    * exists only because the AUDIT needs the truth — a production user
    * runs the sample side alone.
    */
  val q34cQuantileSample: Q = Q(
    "q34c_quantile_sample",
    (s, dir) => {
      val li = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .select(col("l_extendedprice").as("v"),
          concat(col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string")).as("rk"))
      val sample = li.filter(Dedup.mh60(col("rk")) % SampleMod === 0)
        .select(col("v"))
      val full = li.select(col("v"))
      val cumFull = cumHist(full)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nFull = full.agg(count(lit(1)).as("n"))
      val exact = decileBounds(cumFull, nFull, "exact_price")
      val approx = decileBounds(cumHist(sample),
        sample.agg(count(lit(1)).as("n")), "sample_price")
      val res = exact.join(approx, "decile")
        .join(cumFull.select(col("v").as("sample_price"), col("cum")),
          "sample_price")
        .crossJoin(broadcast(nFull))
        .select(col("decile"), col("exact_price"), col("sample_price"),
          abs(expr("(cum * 10000) div n") - col("decile") * 1000)
            .as("err_bp"))
        .orderBy(col("decile"))
      Q.materialized(res, cumFull)
    },
    Some(s"""
      WITH li AS (
        SELECT l_extendedprice AS v,
          CAST(l_orderkey AS VARCHAR) || '#' ||
            CAST(l_linenumber AS VARCHAR) AS rk
        FROM lineitem),
      smp AS (
        SELECT v FROM li WHERE ${Dedup.sqlMh("rk")} % $SampleMod = 0),
      cumf AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
        FROM (SELECT v, count(*) AS c FROM li GROUP BY 1) h),
      cums AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum
        FROM (SELECT v, count(*) AS c FROM smp GROUP BY 1) h),
      nf AS (SELECT count(*) AS n FROM li),
      ns AS (SELECT count(*) AS n FROM smp),
      tf AS (
        SELECT k AS decile, (k * (SELECT n FROM nf) + 9) // 10 AS tc
        FROM (SELECT unnest(range(1, 10)) AS k)),
      ts AS (
        SELECT k AS decile, (k * (SELECT n FROM ns) + 9) // 10 AS tc
        FROM (SELECT unnest(range(1, 10)) AS k)),
      exact AS (
        SELECT decile, min(v) AS exact_price
        FROM cumf JOIN tf ON cumf.cum >= tf.tc GROUP BY decile),
      approx AS (
        SELECT decile, min(v) AS sample_price
        FROM cums JOIN ts ON cums.cum >= ts.tc GROUP BY decile)
      SELECT e.decile, e.exact_price, a.sample_price,
        abs((c.cum * 10000) // (SELECT n FROM nf) - e.decile * 1000)
          AS err_bp
      FROM exact e JOIN approx a USING (decile)
      JOIN cumf c ON c.v = a.sample_price
      ORDER BY e.decile"""))
}
