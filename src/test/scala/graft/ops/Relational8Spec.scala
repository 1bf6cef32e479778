package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the statistical-audit pack: Benford's report must cover all
  * nine digits exactly once with shares that tally, and the Mann-Whitney
  * U must equal a brute-force pair count recomputed test-side.
  */
class Relational8Spec extends SparkSpec {

  test("q103: all nine digits, shares tally to one, constants sum to 10000") {
    val rows = graft.SparkEntry.queries("q103_benford")(spark, sf0001)
      .collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    // expected constants are a fixed probability vector
    assert(rows.map(_.getAs[Int]("exp_bp")).sum === 10000)
    // integer-truncated shares: sum within 9 bp of exactly one
    val obsSum = rows.map(_.getAs[Long]("obs_bp")).sum
    assert(obsSum > 10000L - 9 && obsSum <= 10000L)
    // n_obs tallies to the filtered row count
    val n = graft.ops.Q.t(spark, sf0001, "lineitem")
      .filter(col("l_extendedprice") >= 1).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === n)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") ===
        r.getAs[Long]("obs_bp") - r.getAs[Int]("exp_bp"))
    }
  }

  test("q105: KS numerator equals a brute-force ECDF sweep per status") {
    val rows = graft.SparkEntry.queries("q105_ks_test")(spark, sf0001)
      .collect().map(r => r.getAs[String]("status") -> r).toMap
    val raw = graft.ops.Q.t(spark, sf0001, "lineitem")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_linestatus"), col("l_returnflag"),
        col("l_quantity").cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    raw.groupBy(_._1).foreach { case (status, triples) =>
      val rq = triples.collect { case (_, "R", q) => q }
      val nq = triples.collect { case (_, "N", q) => q }
      val ksNum = triples.map(_._3).distinct.map { v =>
        math.abs(rq.count(_ <= v).toLong * nq.length -
          nq.count(_ <= v).toLong * rq.length)
      }.max
      val row = rows(status)
      assert(row.getAs[Long]("ks_num") === ksNum, s"status $status")
      val d = ksNum.toDouble / (rq.length.toLong * nq.length)
      assert(math.abs(row.getAs[Double]("ks_d") - d) < 1e-6)
      // reject flag consistent with the reported D vs critical value
      assert(row.getAs[Boolean]("reject_h0") ===
        (d > 1.358 * math.sqrt((rq.length + nq.length).toDouble /
          (rq.length.toLong * nq.length))))
    }
  }

  test("q104: U2 equals a brute-force pair count per status") {
    val rows = graft.SparkEntry.queries("q104_mann_whitney")(spark, sf0001)
      .collect().map(r => r.getAs[String]("status") -> r).toMap
    // brute force on the raw (status, flag, qty) triples, test-side
    val raw = graft.ops.Q.t(spark, sf0001, "lineitem")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_linestatus"), col("l_returnflag"),
        col("l_quantity").cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    raw.groupBy(_._1).foreach { case (status, triples) =>
      val rq = triples.collect { case (_, "R", q) => q }
      val nq = triples.collect { case (_, "N", q) => q }
      val u2 = (for (a <- rq; b <- nq) yield {
        if (a > b) 2L else if (a == b) 1L else 0L
      }).sum
      val row = rows(status)
      assert(row.getAs[Long]("u2") === u2, s"status $status")
      assert(row.getAs[Long]("n_r") === rq.length.toLong)
      assert(row.getAs[Long]("n_n") === nq.length.toLong)
      assert(row.getAs[Long]("dev2") === u2 - rq.length.toLong * nq.length)
    }
  }

  test("q109: Welch t and df equal a brute-force recomputation per status") {
    val rows = graft.SparkEntry.queries("q109_welch_ttest")(spark, sf0001)
      .collect().map(r => r.getAs[String]("status") -> r).toMap
    val raw = graft.ops.Q.t(spark, sf0001, "lineitem")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_linestatus"), col("l_returnflag"),
        col("l_quantity").cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    raw.groupBy(_._1).foreach { case (status, triples) =>
      val rq = triples.collect { case (_, "R", q) => q.toDouble }
      val nq = triples.collect { case (_, "N", q) => q.toDouble }
      def mean(xs: Array[Double]) = xs.sum / xs.length
      def svar(xs: Array[Double]) = {
        val m = mean(xs)
        xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      }
      val ser = svar(rq) / rq.length
      val sen = svar(nq) / nq.length
      val tExp = (mean(rq) - mean(nq)) / math.sqrt(ser + sen)
      val dfExp = (ser + sen) * (ser + sen) /
        (ser * ser / (rq.length - 1) + sen * sen / (nq.length - 1))
      val row = rows(status)
      assert(math.abs(row.getAs[Double]("t_stat") - tExp) < 1e-4,
        s"status $status t")
      assert(math.abs(row.getAs[Double]("df_welch") - dfExp) < dfExp * 1e-4,
        s"status $status df")
      assert(row.getAs[Boolean]("reject_h0") === (math.abs(tExp) > 1.96))
      assert(row.getAs[Long]("n_r") === rq.length.toLong)
      assert(row.getAs[Long]("n_n") === nq.length.toLong)
    }
  }

  test("q109: identical planted populations give t = 0 and no rejection") {
    // two flags carrying the SAME multiset of quantities — the null
    // hypothesis is true by construction and the statistic must be 0
    val rq = Seq(1, 2, 2, 3, 5, 8, 8, 9)
    val nq = rq
    val n = rq.length
    val sx = rq.sum.toDouble
    val sxx = rq.map(q => q * q).sum.toDouble
    val v = (n * sxx - sx * sx) / (n.toDouble * (n - 1))
    val se = v / n
    val t = (sx / n - sx / n) / math.sqrt(se + se)
    assert(t === 0.0)
    val df = (se + se) * (se + se) / (2 * (se * se / (n - 1)))
    assert(math.abs(df - 2.0 * (n - 1)) < 1e-9,
      "equal variances and sizes collapse Welch df to 2(n-1)")
  }
}
