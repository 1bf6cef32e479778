package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row entering the top-k heap. */
case class Scored(id: Long, score: Double)

/** Typed `Aggregator` UDAF: exact per-group top-k as a single aggregation —
  * no window, no per-group sort of the full partition. The buffer carries at
  * most k elements, so the shuffle moves O(groups × k) rows instead of the
  * whole input: the scalable form of "top k per group" when k ≪ group size.
  *
  * Ordering is total (score desc, id asc) so results are deterministic
  * under score ties. Register with `functions.udaf(new TopKAggregator(k))`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = trim(buf :+ a)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}
