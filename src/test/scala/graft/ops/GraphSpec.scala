package graft.ops

import graft.SparkSpec

/** Hand-computable PageRank pins: the integer recurrence on a star graph
  * (one iteration, exact expected values) and the uniform fixed point on a
  * regular graph (5 iterations keep every rank at SCALE/N exactly).
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("g60: one star-graph iteration matches the hand-computed recurrence") {
    // center 0 — leaves 1,2,3 (undirected). N=4, r0 = S/4 = 250e9 each,
    // base = (15·S÷100)÷4 = 37_500_000_000.
    // center ← 3 leaf contribs of (85·250e9÷100)÷1 → 37.5e9 + 637.5e9
    // leaf   ← (85·250e9÷100)÷3 = 70_833_333_333 (floor) + base
    val pr = Graph.pageRank(sym((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("r")).toMap
    assert(pr(0L) === 675000000000L)
    assert(pr(1L) === 108333333333L)
    assert(pr(1L) === pr(2L) && pr(2L) === pr(3L))
  }

  test("g60: a regular graph is a uniform fixed point across 5 iterations") {
    // 4-cycle, deg 2 everywhere: r' = base + 2·((85·(S/4)÷100)÷2) = S/4
    val pr = Graph.pageRank(
      sym((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), iters = 5)
      .collect().map(_.getAs[Long]("r")).distinct
    assert(pr.toSeq === Seq(Graph.Scale / 4))
  }
}
