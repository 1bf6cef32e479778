package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q.t

/** Eighth relational pack: statistical audit classics. Benford first-digit
  * conformance (the forensic-accounting screen every financial warehouse
  * runs over amount columns), the Mann-Whitney U rank test (the
  * distribution-free two-sample location comparison q81's chi-square
  * cannot give for ordinal data), and the Kolmogorov-Smirnov two-sample
  * test (any-difference ECDF distance, U's distributional complement).
  * All are spelled integer-exact — digits come from bigint string heads,
  * the U statistic is doubled into an integer, the KS numerator is
  * cross-multiplied — so the oracles hash-compare with (almost) no float
  * surface.
  */
object Relational8 {

  def pack: Seq[Q] = Seq(q103Benford, q104MannWhitney, q105KsTest, q109Welch)

  /** Shared by q104/q105: per-(status, flag, value) contingency counts of
    * R-vs-N line quantities — the ONE data-sized aggregate both rank tests
    * reduce to (everything after it runs on a ≤100-row bounded domain).
    */
  private def rnQtyCounts(s: SparkSession, dir: String): DataFrame =
    Q.spread(t(s, dir, "lineitem"), "l_orderkey")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_linestatus").as("status"), col("l_returnflag").as("flag"),
        col("l_quantity").cast("int").as("qty"))
      .groupBy(col("status"), col("flag"), col("qty"))
      .agg(count(lit(1)).as("n"))

  /** Benford's-law expected first-digit shares log10(1+1/d) in integer
    * basis points — fixed published constants (they sum to exactly 10000),
    * embedded identically in the Spark frame and the oracle VALUES so
    * neither engine ever computes a log.
    */
  private val BenfordBp: Seq[(Int, Int)] = Seq(
    1 -> 3010, 2 -> 1761, 3 -> 1249, 4 -> 969, 5 -> 792,
    6 -> 669, 7 -> 580, 8 -> 512, 9 -> 458)

  /** q103: BENFORD FIRST-DIGIT AUDIT over `l_extendedprice` — observed
    * first-significant-digit shares vs the Benford expectation, in basis
    * points. Amounts spanning several orders of magnitude should follow
    * log10(1+1/d); a flat synthetic price column (like this testdata's)
    * shows up as large deviations, which is precisely the audit signal.
    *
    * Determinism: the first digit is the first character of the bigint
    * string of floor(price) — integer formatting is identical across
    * engines, so no log10/power float path (whose floor at a decade
    * boundary could differ by one ulp and shift a digit). Shares are
    * integer-division basis points; expectations are embedded constants.
    *
    * Scale shape: one map-side 9-group aggregate over the fact table; the
    * one-row total then rides a broadcast to the 9-row report frame (the
    * audited one-row crossJoin convention).
    */
  val q103Benford: Q = Q(
    "q103_benford",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      val obs = Q.spread(t(s, dir, "lineitem"), "l_orderkey")
        .filter(col("l_extendedprice") >= 1)
        .select(substring(floor(col("l_extendedprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("n_obs"))
      val total = obs.agg(sum(col("n_obs")).as("total"))
      val expected = BenfordBp.toDF("digit", "exp_bp")
      // obs is value-bounded (at most 9 digit groups) — IT broadcasts, so
      // the left-outer keeps every expected digit with a hash build side
      expected
        .join(broadcast(obs), Seq("digit"), "left")
        .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          col("exp_bp"))
        .crossJoin(broadcast(total))
        .select(col("digit"), col("n_obs"),
          expr("(10000 * n_obs) div total").as("obs_bp"),
          col("exp_bp"),
          (expr("(10000 * n_obs) div total") - col("exp_bp")).as("dev_bp"))
        .orderBy(col("digit"))
    },
    Some("""
      WITH b(digit, exp_bp) AS (VALUES
        (1, 3010), (2, 1761), (3, 1249), (4, 969), (5, 792),
        (6, 669), (7, 580), (8, 512), (9, 458)),
      obs AS (
        SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
          CAST(count(*) AS BIGINT) AS n_obs
        FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
      tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM obs)
      SELECT b.digit, coalesce(o.n_obs, 0) AS n_obs,
        (10000 * coalesce(o.n_obs, 0)) // tot.total AS obs_bp,
        b.exp_bp,
        (10000 * coalesce(o.n_obs, 0)) // tot.total - b.exp_bp AS dev_bp
      FROM b LEFT JOIN obs o USING (digit) CROSS JOIN tot
      ORDER BY b.digit"""))

  /** q104: MANN-WHITNEY U TEST — per line status, does the returned
    * ('R') population ship systematically larger quantities than the
    * non-returned ('N') one? U counts cross-group pairs where R exceeds N
    * (ties half-weighted); reported DOUBLED so it stays an integer, plus
    * the rank-biserial effect size 2U/(n₁n₂) − 1.
    *
    * Scale shape: quantities are low-cardinality, so the test reduces to
    * the per-(status, flag, value) contingency counts — one map-side
    * aggregate over the fact table; the O(values²) pair sum then runs on
    * the ≤100-row-per-status count table via a broadcast join (equi on
    * status, the qa ≥ qb band as the join's residual condition — a hash
    * join, never a cartesian product). Pair products stage through
    * DECIMAL(38,0) (the q102 idiom) so the sum cannot overflow at
    * warehouse row counts; the test-scale result is cast back to BIGINT.
    */
  val q104MannWhitney: Q = Q(
    "q104_mann_whitney",
    (s: SparkSession, dir: String) => {
      val d38 = DecimalType(38, 0)
      val cnt = rnQtyCounts(s, dir)
      val r = cnt.filter(col("flag") === "R")
        .select(col("status"), col("qty").as("qa"), col("n").as("na"))
      val nn = cnt.filter(col("flag") === "N")
        .select(col("status").as("status_b"), col("qty").as("qb"),
          col("n").as("nb"))
      // decimal staging BEFORE the multiply — a Long product of two
      // warehouse-scale cell counts would already have wrapped
      val na38 = col("na").cast(d38)
      val nb38 = col("nb").cast(d38)
      val u2 = r.join(broadcast(nn),
          col("status") === col("status_b") && col("qa") >= col("qb"))
        .select(col("status"),
          when(col("qa") > col("qb"), lit(2).cast(d38) * na38 * nb38)
            .otherwise(na38 * nb38).as("contrib"))
        .groupBy(col("status"))
        .agg(sum(col("contrib")).as("u2d"))
      val totals = cnt.groupBy(col("status")).agg(
        sum(when(col("flag") === "R", col("n")).otherwise(0L)).as("n_r"),
        sum(when(col("flag") === "N", col("n")).otherwise(0L)).as("n_n"))
      // drive from totals: a status where no R quantity reaches any N
      // quantity has NO u2 row, but U=0 is a legitimate result — the left
      // join + coalesce keeps it reported instead of silently dropped
      val u2c = coalesce(col("u2d"), lit(0).cast(d38))
      val dev2d = u2c - col("n_r").cast(d38) * col("n_n").cast(d38)
      totals.join(u2, Seq("status"), "left")
        .filter(col("n_r") > 0 && col("n_n") > 0)
        .select(col("status"), col("n_r"), col("n_n"),
          u2c.cast("long").as("u2"), // test-scale output narrowing
          dev2d.cast("long").as("dev2"),
          round(dev2d.cast("double") /
            (col("n_r").cast("double") * col("n_n").cast("double")), 6)
            .as("rank_biserial"))
        .orderBy(col("status"))
    },
    Some("""
      WITH cnt AS (
        SELECT l_linestatus AS status, l_returnflag AS flag,
          CAST(l_quantity AS INT) AS qty, CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1, 2, 3),
      u AS (
        -- HUGEINT staging BEFORE the multiply (the q105 overflow guard)
        SELECT r.status,
          CAST(sum(CASE WHEN r.qa > n.qb
                        THEN 2 * CAST(r.na AS HUGEINT) * n.nb
                        ELSE CAST(r.na AS HUGEINT) * n.nb END)
            AS BIGINT) AS u2
        FROM (SELECT status, qty AS qa, n AS na FROM cnt WHERE flag = 'R') r
        JOIN (SELECT status, qty AS qb, n AS nb FROM cnt WHERE flag = 'N') n
          ON r.status = n.status AND r.qa >= n.qb
        GROUP BY r.status),
      totals AS (
        SELECT status,
          CAST(sum(CASE WHEN flag = 'R' THEN n ELSE 0 END) AS BIGINT) AS n_r,
          CAST(sum(CASE WHEN flag = 'N' THEN n ELSE 0 END) AS BIGINT) AS n_n
        FROM cnt GROUP BY status)
      SELECT t.status, t.n_r, t.n_n, coalesce(u.u2, 0) AS u2,
        CAST(coalesce(u.u2, 0) - CAST(t.n_r AS HUGEINT) * t.n_n AS BIGINT) AS dev2,
        round(CAST(coalesce(u.u2, 0) - CAST(t.n_r AS HUGEINT) * t.n_n AS DOUBLE)
          / (CAST(t.n_r AS DOUBLE) * CAST(t.n_n AS DOUBLE)), 6)
          AS rank_biserial
      FROM totals t LEFT JOIN u USING (status)
      WHERE t.n_r > 0 AND t.n_n > 0
      ORDER BY t.status"""))

  /** q105: KOLMOGOROV-SMIRNOV TWO-SAMPLE TEST — q104's distributional
    * companion: where Mann-Whitney detects a location shift, KS detects
    * ANY difference between the R and N quantity distributions (shape,
    * spread, tails) as D = max |ECDF_R − ECDF_N|, evaluated on the
    * observed value grid where the maximum is attained.
    *
    * Determinism: D's numerator is cross-multiplied to the integer
    * |cumR·n_n − cumN·n_r| (DECIMAL(38,0)-staged like q104, cast back at
    * test scale), so the maximum is an exact integer compare; D itself
    * and the α=0.05 critical value 1.358·√((n₁+n₂)/(n₁n₂)) are one IEEE
    * divide/sqrt each — identical across engines — and the reject flag
    * compares those unrounded doubles.
    *
    * Scale shape: the same one map-side contingency aggregate as q104;
    * the cumulative ECDFs run on the ≤100-row count table via a
    * broadcast qa ≤ qb band join (hash join on status with the band as
    * residual), never a window over the fact table.
    */
  val q105KsTest: Q = Q(
    "q105_ks_test",
    (s: SparkSession, dir: String) => {
      val d38 = DecimalType(38, 0)
      val cnt = rnQtyCounts(s, dir)
      val grid = cnt.select(col("status"), col("qty")).distinct()
      val cum = grid
        .join(broadcast(cnt.select(col("status").as("status_b"),
            col("qty").as("qb"), col("flag"), col("n"))),
          col("status") === col("status_b") && col("qb") <= col("qty"))
        .groupBy(col("status"), col("qty"))
        .agg(
          sum(when(col("flag") === "R", col("n")).otherwise(0L)).as("cum_r"),
          sum(when(col("flag") === "N", col("n")).otherwise(0L)).as("cum_n"))
      val totals = cnt.groupBy(col("status")).agg(
        sum(when(col("flag") === "R", col("n")).otherwise(0L)).as("n_r"),
        sum(when(col("flag") === "N", col("n")).otherwise(0L)).as("n_n"))
      val dnum = cum.join(broadcast(totals), "status")
        .filter(col("n_r") > 0 && col("n_n") > 0)
        .select(col("status"), col("n_r"), col("n_n"),
          abs((col("cum_r").cast(d38) * col("n_n").cast(d38)) -
            (col("cum_n").cast(d38) * col("n_r").cast(d38))).as("num"))
        .groupBy(col("status"), col("n_r"), col("n_n"))
        .agg(max(col("num")).cast("long").as("ks_num"))
      // per-factor double casts: a Long n_r*n_n product would wrap at
      // warehouse counts before the cast could save it
      val nProd = col("n_r").cast("double") * col("n_n").cast("double")
      val ksd = col("ks_num").cast("double") / nProd
      val crit = lit(1.358) *
        sqrt((col("n_r") + col("n_n")).cast("double") / nProd)
      dnum.select(col("status"), col("n_r"), col("n_n"), col("ks_num"),
          round(ksd, 6).as("ks_d"),
          round(crit, 6).as("d_crit_05"),
          (ksd > crit).as("reject_h0"))
        .orderBy(col("status"))
    },
    Some("""
      WITH cnt AS (
        SELECT l_linestatus AS status, l_returnflag AS flag,
          CAST(l_quantity AS INT) AS qty, CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1, 2, 3),
      grid AS (SELECT DISTINCT status, qty FROM cnt),
      cum AS (
        SELECT g.status, g.qty,
          CAST(sum(CASE WHEN c.flag = 'R' THEN c.n ELSE 0 END) AS BIGINT) AS cum_r,
          CAST(sum(CASE WHEN c.flag = 'N' THEN c.n ELSE 0 END) AS BIGINT) AS cum_n
        FROM grid g JOIN cnt c ON g.status = c.status AND c.qty <= g.qty
        GROUP BY g.status, g.qty),
      totals AS (
        SELECT status,
          CAST(sum(CASE WHEN flag = 'R' THEN n ELSE 0 END) AS BIGINT) AS n_r,
          CAST(sum(CASE WHEN flag = 'N' THEN n ELSE 0 END) AS BIGINT) AS n_n
        FROM cnt GROUP BY status),
      dnum AS (
        -- HUGEINT (int128) staging, the q104 overflow guard in DuckDB's
        -- native wide-int type (DECIMAL x DECIMAL would need width 76)
        SELECT c.status, t.n_r, t.n_n,
          CAST(max(abs(CAST(c.cum_r AS HUGEINT) * CAST(t.n_n AS HUGEINT)
                   - CAST(c.cum_n AS HUGEINT) * CAST(t.n_r AS HUGEINT)))
            AS BIGINT) AS ks_num
        FROM cum c JOIN totals t USING (status)
        WHERE t.n_r > 0 AND t.n_n > 0
        GROUP BY c.status, t.n_r, t.n_n)
      SELECT status, n_r, n_n, ks_num,
        round(CAST(ks_num AS DOUBLE)
          / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE)), 6) AS ks_d,
        round(1.358 * sqrt(CAST(n_r + n_n AS DOUBLE)
          / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))), 6) AS d_crit_05,
        CAST(ks_num AS DOUBLE) / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))
          > 1.358 * sqrt(CAST(n_r + n_n AS DOUBLE)
              / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE)))
          AS reject_h0
      FROM dnum ORDER BY status"""))

  /** q109: WELCH'S T-TEST — the parametric completion of the audit trio:
    * where q104 compares locations rank-wise and q105 compares whole
    * ECDFs, Welch answers "do the R and N quantity MEANS differ", without
    * the equal-variance assumption Student's t needs (the variant
    * statisticians recommend as the default two-sample mean test).
    *
    * Determinism: each population reduces to exact integer moments
    * (n, Σx, Σx²) accumulated in DECIMAL(38,0) — order-independent,
    * overflow-proof — via the same one map-side contingency aggregate as
    * q104/q105; the t statistic, the Welch–Satterthwaite df, and the
    * |t| > 1.96 flag are then a FIXED, mirrored sequence of IEEE ops on
    * those exact moments (the g70 moments-then-assembly discipline), with
    * the flag comparing unrounded doubles.
    */
  val q109Welch: Q = Q(
    "q109_welch_ttest",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val cnt = rnQtyCounts(s, dir)
      val mom = cnt.groupBy(col("status")).agg(
        sum(when(col("flag") === "R", col("n")).otherwise(0L)).as("n_r"),
        sum(when(col("flag") === "N", col("n")).otherwise(0L)).as("n_n"),
        sum(when(col("flag") === "R", (col("qty") * col("n")).cast(d38))
          .otherwise(lit(0).cast(d38))).as("sx_r"),
        sum(when(col("flag") === "N", (col("qty") * col("n")).cast(d38))
          .otherwise(lit(0).cast(d38))).as("sx_n"),
        sum(when(col("flag") === "R",
            (col("qty") * col("qty") * col("n")).cast(d38))
          .otherwise(lit(0).cast(d38))).as("sxx_r"),
        sum(when(col("flag") === "N",
            (col("qty") * col("qty") * col("n")).cast(d38))
          .otherwise(lit(0).cast(d38))).as("sxx_n"))
        .filter(col("n_r") > 1 && col("n_n") > 1)
      def meanOf(sx: String, n: String) =
        col(sx).cast("double") / col(n).cast("double")
      // sample variance from exact moments: (n·Σx² − (Σx)²) / (n·(n−1))
      def varOf(n: String, sx: String, sxx: String) =
        (col(n).cast(d38) * col(sxx) - col(sx) * col(sx)).cast("double") /
          (col(n).cast("double") * (col(n) - 1).cast("double"))
      val ser = varOf("n_r", "sx_r", "sxx_r") / col("n_r").cast("double")
      val sen = varOf("n_n", "sx_n", "sxx_n") / col("n_n").cast("double")
      val tStat = (meanOf("sx_r", "n_r") - meanOf("sx_n", "n_n")) /
        sqrt(ser + sen)
      val dfW = ((ser + sen) * (ser + sen)) /
        ((ser * ser) / (col("n_r") - 1).cast("double") +
          (sen * sen) / (col("n_n") - 1).cast("double"))
      mom.select(col("status"), col("n_r"), col("n_n"),
          round(meanOf("sx_r", "n_r") - meanOf("sx_n", "n_n"), 6)
            .as("mean_diff"),
          round(tStat, 6).as("t_stat"),
          round(dfW, 4).as("df_welch"),
          (abs(tStat) > lit(1.96)).as("reject_h0"))
        .orderBy(col("status"))
    },
    Some("""
      WITH cnt AS (
        SELECT l_linestatus AS status, l_returnflag AS flag,
          CAST(l_quantity AS INT) AS qty, CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY 1, 2, 3),
      mom AS (
        SELECT status,
          CAST(sum(CASE WHEN flag = 'R' THEN n ELSE 0 END) AS BIGINT) AS n_r,
          CAST(sum(CASE WHEN flag = 'N' THEN n ELSE 0 END) AS BIGINT) AS n_n,
          sum(CASE WHEN flag = 'R' THEN CAST(qty * n AS HUGEINT)
                   ELSE CAST(0 AS HUGEINT) END) AS sx_r,
          sum(CASE WHEN flag = 'N' THEN CAST(qty * n AS HUGEINT)
                   ELSE CAST(0 AS HUGEINT) END) AS sx_n,
          sum(CASE WHEN flag = 'R' THEN CAST(qty * qty * n AS HUGEINT)
                   ELSE CAST(0 AS HUGEINT) END) AS sxx_r,
          sum(CASE WHEN flag = 'N' THEN CAST(qty * qty * n AS HUGEINT)
                   ELSE CAST(0 AS HUGEINT) END) AS sxx_n
        FROM cnt GROUP BY status
        HAVING n_r > 1 AND n_n > 1),
      asm AS (
        SELECT status, n_r, n_n,
          CAST(sx_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS m_r,
          CAST(sx_n AS DOUBLE) / CAST(n_n AS DOUBLE) AS m_n,
          CAST(CAST(n_r AS HUGEINT) * sxx_r - sx_r * sx_r AS DOUBLE)
            / (CAST(n_r AS DOUBLE) * CAST(n_r - 1 AS DOUBLE))
            / CAST(n_r AS DOUBLE) AS ser,
          CAST(CAST(n_n AS HUGEINT) * sxx_n - sx_n * sx_n AS DOUBLE)
            / (CAST(n_n AS DOUBLE) * CAST(n_n - 1 AS DOUBLE))
            / CAST(n_n AS DOUBLE) AS sen
        FROM mom)
      SELECT status, n_r, n_n,
        round(m_r - m_n, 6) AS mean_diff,
        round((m_r - m_n) / sqrt(ser + sen), 6) AS t_stat,
        round(((ser + sen) * (ser + sen)) /
          ((ser * ser) / CAST(n_r - 1 AS DOUBLE)
            + (sen * sen) / CAST(n_n - 1 AS DOUBLE)), 4) AS df_welch,
        abs((m_r - m_n) / sqrt(ser + sen)) > 1.96 AS reject_h0
      FROM asm ORDER BY status"""))
}
