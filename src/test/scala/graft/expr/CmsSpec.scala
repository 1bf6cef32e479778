package graft.expr

import graft.SparkSpec
import graft.ops.CustomExprQueries

/** Count-min sketch invariants: point estimates NEVER undercount (all
  * updates are positive — the estimate is a min over counters each ≥ the
  * true count) and overcount within the εN envelope; the q53 audit query
  * carries both figures in its output.
  */
class CmsSpec extends SparkSpec {

  test("CMS point estimates are exact on a collision-free small domain") {
    val agg = new CountMinAggregator(4, 64)
    val data = Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)
    val sk = data.foldLeft(agg.zero)(agg.reduce)
    assert(CountMinAggregator.estimate(sk, 4, 64, 1L) === 5L)
    assert(CountMinAggregator.estimate(sk, 4, 64, 2L) === 3L)
    assert(CountMinAggregator.estimate(sk, 4, 64, 3L) === 1L)
  }

  test("merge is element-wise: split-and-merge equals one-shot") {
    val agg = new CountMinAggregator(4, 64)
    val (l, r) = (Seq(1L, 2L, 1L), Seq(2L, 3L))
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val oneShot = (l ++ r).foldLeft(agg.zero)(agg.reduce)
    assert(merged.toSeq === oneShot.toSeq)
  }

  test("q53: heavy-hitter estimates never undercount, overcount ≤ εN") {
    val rows = CustomExprQueries.q53CmsHeavyHitters.run(spark, sf0001).collect()
    assert(rows.length === 10)
    val total = 1000L // sf0.001 events rows (εN envelope input)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val over = r.getAs[Long]("overcount")
      assert(over >= 0L, s"CMS undercounted: $r")
      // ε ≈ e/width = e/8192; generous 10x margin keeps the spec
      // noise-proof while still catching a broken hash family (which
      // collides everything and overcounts by O(N))
      assert(over <= math.max(2L, (10 * math.E * total / 8192).toLong),
        s"CMS overcount outside envelope: $r (exact=$exact)")
    }
  }
}
