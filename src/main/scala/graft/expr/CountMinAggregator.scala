package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch over long keys as a typed `Aggregator` UDAF: a
  * depth × width counter matrix where every update increments one counter
  * per row (chosen by that row's hash) and a point estimate reads the MIN
  * of its depth counters. Estimates never UNDER-count (all updates are
  * positive) and over-count by ≤ εN (ε ≈ e/width) with probability
  * 1 − δ (δ ≈ e^−depth) — the constant-size answer to "how often did key
  * X occur" over a stream/corpus too large for an exact group-by.
  *
  * Buffer is one flat Array[Long] (depth·width ≤ a few KB), so partial
  * aggregation ships a constant-size sketch per partition regardless of
  * input size — the defining scale property. Merge is element-wise sum
  * (sketches are linear), which is also what makes the sketch
  * cross-partition and cross-day composable in a warehouse.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")
  require(depth <= CountMinAggregator.MaxDepth,
    s"depth $depth exceeds the ${CountMinAggregator.MaxDepth}-entry hash " +
      "family — fail here, not per-row inside an executor")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.bucket(d, width, key)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object CountMinAggregator {
  /** Universal-hash row functions h_d(x) = ((a_d·(x mod P) + b_d) mod P)
    * mod width over the Mersenne prime P = 2³¹−1 (the MinHash family's
    * arithmetic: products stay < 2⁶², no overflow under ANSI). ONE
    * definition shared by the update path above and the query-side lookup
    * ([[graft.ops.CustomExprQueries]]), so the two cannot drift.
    */
  private val P = 2147483647L
  val MaxDepth = 8
  private val coefs: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(47)
    IndexedSeq.fill(MaxDepth)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
  }

  def bucket(d: Int, width: Int, key: Long): Int = {
    val (a, b) = coefs(d)
    val x = ((key % P) + P) % P
    (((a * x + b) % P) % width).toInt
  }

  /** Point estimate: min over the depth counters for `key`. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, key: Long): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + bucket(d, width, key))
      if (v < best) best = v
      d += 1
    }
    best
  }
}
