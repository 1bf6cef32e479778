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

  test("g60 plan: round streams cached edges — no rank broadcast, no edge re-shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    val (e, deg, ew, ncnt) =
      Graph.edgeState(sym((0L, 1L), (0L, 2L), (1L, 2L)))
    try {
      ew.count() // pin the cache so its hash(src) partitioning is in force
      val n = ncnt.head().getLong(0)
      val ranks = deg
        .select(col("src").as("node"), lit(Graph.Scale / n).as("r"))
        .localCheckpoint(true)
      val plan = Graph.round(ew, deg, n, ranks).queryExecution.executedPlan
      // the node count is a folded literal — a round broadcasts NOTHING
      assert(plan.collect { case b: BroadcastExchangeExec => b }.isEmpty,
        s"state broadcast inside the loop:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"rank state must shuffle to the edges, not broadcast:\n$plan")
      // the cached edge table joins with NO exchange between scan and join
      def ewScans(p: SparkPlan) = p.collect {
        case s: InMemoryTableScanExec
          if Seq("src", "dst", "deg").forall(n => s.output.exists(_.name == n)) => s
      }
      val ewJoins = plan.collect {
        case j: BaseJoinExec if ewScans(j).nonEmpty => j }
      assert(ewJoins.nonEmpty, s"edge join not found:\n$plan")
      val j = ewJoins.minBy(_.collectLeaves().size) // innermost: edges ⋈ ranks
      Seq(j.left, j.right).filter(c => ewScans(c).nonEmpty).foreach { c =>
        val bad = c.collect {
          case s: ShuffleExchangeExec if ewScans(s).nonEmpty => s }
        assert(bad.isEmpty, s"O(edges) side re-shuffled every round:\n$plan")
      }
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
        case None => conf.unset("spark.sql.adaptive.enabled")
      }
      ew.unpersist(); deg.unpersist(); e.unpersist()
    }
  }

  test("g60: a regular graph is a uniform fixed point across 5 iterations") {
    // 4-cycle, deg 2 everywhere: r' = base + 2·((85·(S/4)÷100)÷2) = S/4
    val pr = Graph.pageRank(
      sym((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), iters = 5)
      .collect().map(_.getAs[Long]("r")).distinct
    assert(pr.toSeq === Seq(Graph.Scale / 4))
  }

  test("g63: one seeded iteration on an edge matches the hand recurrence") {
    // nodes {2, 3}, one undirected edge, seed = 2 (ns = 1):
    // r0 = (S, 0); r1(2) = 15%·S + 0 = 1.5e11,
    // r1(3) = 0 + (85·S÷100)÷1 = 8.5e11
    import org.apache.spark.sql.functions.lit
    val pr = Graph.personalizedPageRank(
      sym((2L, 3L)), n => n === lit(2L), iters = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("r")).toMap
    assert(pr(2L) === 150000000000L)
    assert(pr(3L) === 850000000000L)
  }

  private def pairsDF(pairs: (Long, Long)*) = pairs.toDF("d1", "d2")

  test("g61: a 64-node chain collapses in O(log n) rounds, all labeled 0") {
    // diameter-63 path — label propagation's worst case (one step/round);
    // star contraction must finish in ~log² n rounds, not 63
    val chain = pairsDF((0L until 63L).map(i => (i, i + 1)): _*)
    val (cc, rounds) = Graph.ccStarContraction(chain)
    val labels = cc.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
    assert(labels.size === 64)
    assert(labels.values.toSet === Set(0L), s"non-root labels: $labels")
    assert(rounds <= 12, s"chain took $rounds rounds — not O(log n)")
  }

  test("g62: K4 + a path — hand-countable triangles and coefficient") {
    // K4 on {1,2,3,4}: 6 edges, 4 triangles, every wedge closed at the K4;
    // path 10-11-12 adds 2 edges, 1 open wedge and no triangles.
    // W = Σd(d-1)/2 = 4·3 (K4) + 1 (node 11) = 13; coeff = 12/13.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L)).toDF("x", "y")
    val r = Graph.triangleStats(e).collect().head
    assert(r.getAs[Long]("n_edges") === 8L)
    assert(r.getAs[Long]("n_wedges") === 13L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Double]("clustering_coeff") === math.rint(12.0 / 13 * 1e6) / 1e6)
  }

  test("g61: components match d46's label propagation on a mixed graph") {
    // two cliques + a chain + an isolated pair, shuffled ids
    val pairs = pairsDF(
      (10L, 3L), (3L, 7L), (10L, 7L),          // triangle {3,7,10}
      (20L, 21L), (21L, 22L), (22L, 20L),      // triangle {20,21,22}
      (30L, 31L), (31L, 32L), (32L, 33L),      // chain {30..33}
      (40L, 41L))                              // pair {40,41}
    val (star, _) = Graph.ccStarContraction(pairs)
    val prop = Clustering.connectedComponents(
      pairs.select($"d1", $"d2"))
    val a = star.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = prop.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("g64: chain BFS — exact hop distances, horizon cut, unreached absent") {
    // chain 2-1-3-5-7, island {100,101}; seed = node 2 (n % 200 == 2)
    val edges = sym((2L, 1L), (1L, 3L), (3L, 5L), (5L, 7L), (100L, 101L))
    val d3 = Graph.bfsHops(edges, n => n % 200 === 2, iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    assert(d3 === Map(2L -> 0L, 1L -> 1L, 3L -> 2L, 5L -> 3L))
    // one more round reaches 7; the island is never reached
    val d4 = Graph.bfsHops(edges, n => n % 200 === 2, iters = 4)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    assert(d4 === d3 + (7L -> 4L))
  }

  test("g65: pendant chain peels away, the K4 core survives with converged=true") {
    // K4 on {1,2,3,4} + chain 4-10-11: 2-core peeling strips 11 then 10;
    // survivors all keep degree 3
    val edges = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 10L), (10L, 11L))
    val rows = Graph.kCore(edges, k = 2, rounds = 4).collect()
    val deg = rows.map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
    assert(deg === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(rows.forall(_.getAs[Boolean]("converged")))
  }

  test("g65: a too-short horizon reports converged=false honestly") {
    // chain 1-2-3-4-5 under k=2: every round only strips the endpoints;
    // one round leaves 2-3-4 whose new endpoints still have degree 1
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val rows = Graph.kCore(edges, k = 2, rounds = 1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getAs[Boolean]("converged")))
    // two more rounds empty it (the 2-core of a path is empty): vacuously
    // converged with zero rows
    assert(Graph.kCore(edges, k = 2, rounds = 3).collect().isEmpty)
  }

  test("g66: two HITS rounds match the hand-computed integer recurrence") {
    // c1→{s1,s2}, c2→{s1}; S=10^6, h0 = S each.
    // a1 = (2S, S) → norm (S, S/2); h1 = (1.5S, S) → norm (S, 666666)
    // a2 = (1666666, S) → norm (S, 600000); h2 = (1.6S, S) → (S, 625000)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("c", "s")
    val got = Graph.hits(edges, iters = 2).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("key")) ->
        r.getAs[Long]("score")).toMap
    assert(got(("hub", 1L)) === 1000000L)
    assert(got(("hub", 2L)) === 625000L)
    assert(got(("authority", 10L)) === 1000000L)
    assert(got(("authority", 11L)) === 600000L)
  }

  test("g64: frontier is incremental — settled nodes never re-enter") {
    // triangle: both 1 and 3 discovered at hop 1 stay at 1 despite the
    // 1-3 edge offering a hop-2 path
    val edges = sym((2L, 1L), (2L, 3L), (1L, 3L))
    val d = Graph.bfsHops(edges, n => n === 2, iters = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    assert(d === Map(2L -> 0L, 1L -> 1L, 3L -> 1L))
  }
}
