package graft.ops

import graft.SparkSpec

/** Pins q34b's Greenwald-Khanna estimates against the exact interpolated
  * percentiles of q34 on the driver data: with accuracy 10000 over ~3k-row
  * groups the rank error is sub-row, so the estimate must land within the
  * value-span of one rank either side of the exact percentile — bounded
  * here by 1% of the group's value range.
  */
class ApproxPercentileSpec extends SparkSpec {

  test("approx percentiles track exact percentiles within 1% of range") {
    val dir = "/root/testdata/sf0.01"
    val exact = Relational2.q34Percentiles.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational2.q34bApproxPercentiles.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    // order totals span ~[850, 500k]
    val tol = 0.01 * 500000
    approx.foreach { case (status, (m, p90)) =>
      val (em, ep90) = exact(status)
      assert(math.abs(m - em) <= tol, s"$status median: est=$m exact=$em")
      assert(math.abs(p90 - ep90) <= tol, s"$status p90: est=$p90 exact=$ep90")
    }
  }
}
