package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Graph5Spec extends SparkSpec {

  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def run(edges: org.apache.spark.sql.DataFrame, sources: Long*,
  ): Map[(Long, Long), (Long, Long, Long)] =
    Graph5.sampledStress(edges, sources.toDF("sid"), rounds = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("path graph: stress equals the hand-computed betweenness numerators") {
    // 0—1—2—3—4; from source 0 every σ is 1, so stress(v) IS the number
    // of (0,t) pairs routed through v: 3, 2, 1, 0 down the path
    val out = run(sym((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), 0L)
    assert(out((0L, 1L)) == ((1L, 3L, 3L)))
    assert(out((0L, 2L)) == ((1L, 2L, 2L)))
    assert(out((0L, 3L)) == ((1L, 1L, 1L)))
    assert(out((0L, 4L)) == ((1L, 0L, 0L)))
    assert(!out.contains((0L, 0L)), "source itself is never scored")
  }

  test("diamond graph: sigma multiplies across parallel shortest paths") {
    // 0—1—3, 0—2—3: two length-2 paths to 3 ⇒ σ(3)=2; each middle node
    // carries one completion (the path to 3), node 3 continues nowhere
    val out = run(sym((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), 0L)
    assert(out((0L, 1L)) == ((1L, 1L, 1L)))
    assert(out((0L, 2L)) == ((1L, 1L, 1L)))
    assert(out((0L, 3L))._1 == 2L, "two shortest paths reach the far corner")
    assert(out((0L, 3L))._3 == 0L, "no paths continue past it")
  }

  test("two sources accumulate independently under one fused dataflow") {
    val edges = sym((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val out = run(edges, 0L, 4L)
    // mirrored sources on a symmetric path: mirrored scores
    assert(out((0L, 1L))._3 == 3L && out((4L, 3L))._3 == 3L)
    assert(out((0L, 2L))._3 == 2L && out((4L, 2L))._3 == 2L)
    // per-node totals as g82 aggregates them: middle node carries both
    val totals = out.toSeq.groupBy(_._1._2)
      .map { case (n, rows) => n -> rows.map(_._2._3).sum }
    assert(totals(2L) == 4L, "2 routes for each source through the center")
  }

  test("g82 runs end-to-end at sf0.001 with positive through-traffic") {
    val out = Graph5.g82SampledBetweenness.run(spark, sf0001).collect()
    assert(out.length > 0 && out.length <= 20)
    assert(out.head.getLong(2) >= out.last.getLong(2), "sorted by stress desc")
    assert(out.head.getLong(2) > 0, "a connected trade graph has through-traffic")
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= Graph5.BtwSources))
  }
}
