package graft.ops

import graft.SparkSpec

/** Planted pins for e67 reciprocal rank fusion: a corpus engineered so the
  * Hamming and L2 rankings DISAGREE, with the fused scores and tie-breaks
  * hand-computed from the integer formula.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)

  test("e67: disagreeing rankings fuse to the hand-computed RRF order") {
    // q(0): all +0.5 (grid 256 everywhere, all sign bits set)
    // c(5): all +0.4  → hamming 0 (rank 1), l2 = 64·51² = 166464 (rank 2)
    // c(6): q with dim0 = −0.01 → hamming 1 (rank 2), l2 = 261² (rank 1)
    // c(7): dim1 = −0.01, rest +0.3 → hamming 1 (rank 3 on cid), l2 worst
    val emb = Seq(
      (0L, vec(_ => 0.5f)),
      (5L, vec(_ => 0.4f)),
      (6L, vec(i => if (i == 0) -0.01f else 0.5f)),
      (7L, vec(i => if (i == 1) -0.01f else 0.3f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity2.rrfFusion(emb, k = 3).collect()
    val byCid = rows.map(r => r.getAs[Long]("cid") -> r).toMap
    def rrf(r1: Int, r2: Int) = 1000000000L / (60 + r1) + 1000000000L / (60 + r2)
    assert(byCid(5L).getAs[Int]("hamming_rank") === 1)
    assert(byCid(5L).getAs[Int]("l2_rank") === 2)
    assert(byCid(6L).getAs[Int]("hamming_rank") === 2)
    assert(byCid(6L).getAs[Int]("l2_rank") === 1)
    assert(byCid(5L).getAs[Long]("rrf_scaled") === rrf(1, 2))
    assert(byCid(6L).getAs[Long]("rrf_scaled") === rrf(2, 1))
    assert(byCid(7L).getAs[Long]("rrf_scaled") === rrf(3, 3))
    // 5 and 6 tie on fused score — cid breaks the tie; 7 trails
    assert(rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("cid")).toList
      === List(5L, 6L, 7L))
  }

  test("e67: a candidate outside one shortlist scores only the other list") {
    // 60 candidates: cid 5 nearest in both lists; cids 6..64 form a ladder.
    // With L=50, the bottom candidates fall off both shortlists and must
    // be absent; fused scores stay the pure per-list formula otherwise.
    val emb = (Seq((0L, vec(_ => 0.5f))) ++
      (5L to 64L).map(c => (c, vec(_ => (0.4f - (c - 5) * 0.005f)))))
      .toDF("vec_id", "embedding")
    val rows = Similarity2.rrfFusion(emb, k = 60).collect()
    // every returned row carries a consistent recomputed fusion score
    rows.foreach { r =>
      val rh = r.getAs[Int]("hamming_rank")
      val rl = r.getAs[Int]("l2_rank")
      val expect = (if (rh <= 50) 1000000000L / (60 + rh) else 0L) +
        (if (rl <= 50) 1000000000L / (60 + rl) else 0L)
      assert(r.getAs[Long]("rrf_scaled") === expect)
    }
    assert(rows.map(_.getAs[Long]("cid")).distinct.length === rows.length)
  }
}
