package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Planted-graph pins for the k-truss peel (g76) and the deterministic
  * hash walks (g77).
  */
class Graph4Spec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("x", "y")

  test("ktruss: K4 core survives, pendant triangle-free edge peels off") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + pendant edge 4-5
    // (support 0). Round 1 must peel exactly the pendant; rounds 2-3
    // must be fixpoints.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val rows = Graph4.ktrussPeel(e, k = 4, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((1, 7L, 6L, 1L), (2, 6L, 6L, 0L),
      (3, 6L, 6L, 0L)))
  }

  test("ktruss: cascade — losing one edge can unravel a whole round later") {
    // Two triangles sharing edge 2-3, plus K4 on {10,11,12,13}. The
    // shared edge sits in BOTH triangles (support 2) so it survives
    // round 1 while its four side edges peel — then, its triangles
    // gone, it cascades off in round 2. The K4 persists.
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L),
      (12L, 13L))
    val rows = Graph4.ktrussPeel(e, k = 4, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.toSeq === Seq((1, 7L), (2, 6L)))
  }

  test("walks: paths follow edges, are reproducible, and stay in-graph") {
    // small symmetric graph: hub 0 connected to 2,4,6,8; ring among evens
    val und = Seq((0L, 2L), (0L, 4L), (0L, 6L), (0L, 8L), (2L, 4L),
      (4L, 6L), (6L, 8L))
    val adj = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((0L, 0L), (2L, 2L)).toDF("wid", "node")
    def run() = Graph4.hashWalks(adj, seeds, steps = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run()
    assert(a.toSeq === run().toSeq) // the hash IS the RNG: bit-stable
    assert(a.length === 2 * 4)      // 2 walks x (seed + 3 steps)
    val edgeSet = (und ++ und.map(_.swap)).toSet
    for (wid <- Seq(0L, 2L)) {
      val path = a.filter(_._1 == wid).sortBy(_._2).map(_._3)
      assert(path.head === wid)
      path.sliding(2).foreach { case Array(u, v) =>
        assert(edgeSet.contains((u, v)), s"walk $wid hopped $u->$v")
      }
    }
  }

  test("luby mis: one member per clique per round, cliques drain in one") {
    // K5 on {1..5} + disjoint triangle {10,11,12}: within a clique all
    // nodes are mutually adjacent, so exactly ONE node (the hash-priority
    // minimum) can be a strict local min — round 1 must admit exactly 2
    // members (one per component) and retire everything.
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val tri = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val rows = Graph4.lubyMis((k5 ++ tri).toDF("x", "y"), rounds = 2)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows(0)._1 === 1)
    assert(rows(0)._2 === 2L) // one per clique
    assert(rows(0)._3 === 8L) // everything retires
    assert(rows(0)._4 === 0L)
    assert(rows(1) === ((2, 0L, 0L, 0L))) // fixpoint: nothing left
  }

  test("luby mis: members of one round are pairwise non-adjacent") {
    // star hub 1000 with leaves 2,4,...,40: leaves are only adjacent to
    // the hub, so whichever side wins, the member set is independent.
    // If the hub wins round 1, everything retires at once; if leaves win,
    // exactly the cheaper-than-hub leaves join, the hub retires as their
    // neighbor, and the pricier leaves — now isolated — all join in
    // round 2. Either way round 2 ends with nothing active and the whole
    // star decided.
    val e = (1L to 20L).map(i => (2 * i, 1000L)).toDF("x", "y")
    val rows = Graph4.lubyMis(e, rounds = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (r1, r2) = (rows(0), rows(1))
    assert(r2._3 === 0L) // star fully decided after two rounds
    if (r1._1 === 1L) { // hub won outright
      assert(r1._4 === 1000L)
      assert(r1._2 === 21L && r1._3 === 0L)
      assert(r2._1 === 0L)
    } else { // k leaves won; hub retired; rest joined isolated in round 2
      assert(r1._4 % 2 === 0L && r1._4 > 0L)
      assert(r1._2 === r1._1 + 1)
      assert(r2._1 === 20L - r1._1)
      assert(r1._1 + r2._1 === 20L) // every leaf ends up in the MIS
    }
  }

  test("temporal reach: influence cannot ride an edge into the past") {
    // chain 1—2 (m=2), 2—3 (m=4): forward in time, 3 reached at month 4.
    // chain 1—4 (m=5), 4—5 (m=3): the 4—5 edge predates arrival at 4 —
    // node 5 must stay unreachable however many rounds run.
    val und = Seq((1L, 2L, 2L), (2L, 3L, 4L), (1L, 4L, 5L), (4L, 5L, 3L))
    val sym = (und ++ und.map { case (a, b, m) => (b, a, m) })
      .toDF("src", "dst", "m")
    val seeds = Seq((1L, 0L)).toDF("node", "arr")
    val got = Graph4.temporalReach(sym, seeds, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 5L))
    assert(!got.contains(5L), "node 5 is only reachable backwards in time")
  }

  test("multi-source bfs: exact hop distances on a path, horizon-bounded") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val adj = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 1L), (5L, 5L)).toDF("seed", "node")
    val d = Graph4.multiBfs(adj, seeds, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d((1L, 2L)) === 1L && d((1L, 3L)) === 2L && d((1L, 4L)) === 3L)
    assert(!d.contains((1L, 5L)), "node 5 is 4 hops out — past the horizon")
    assert(d((5L, 3L)) === 2L)
    assert(!d.contains((5L, 1L)), "symmetric: 1 is past 5's horizon too")
    assert(d((1L, 1L)) === 0L)
  }

  test("fim: PSM sections reassemble to the original token sequence") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "solo"),
      (3L, "x y")).toDF("doc_id", "text")
    Corpus5.fimSplit(docs).collect().foreach { r =>
      val psm = r.getAs[String]("psm_text")
      val sec = psm.split("<PRE>|<SUF>|<MID>").map(_.trim)
      // sec(0) is the empty pre-marker prefix; PSM order is P,S,M
      val rebuilt = (sec(1).split(" ").filter(_.nonEmpty) ++
        sec(3).split(" ").filter(_.nonEmpty) ++
        sec(2).split(" ").filter(_.nonEmpty)).toSeq
      val doc = Map(1L -> "a b c d e f g h i j", 2L -> "solo",
        3L -> "x y")(r.getLong(0))
      assert(rebuilt === doc.split(" ").toSeq)
      assert(r.getAs[Long]("middle_len") ===
        r.getAs[Long]("p2") - r.getAs[Long]("p1"))
    }
  }

  test("katz: hand-computed walk mass on a 3-node path") {
    // symmetric path 0—1—2; KatzScale = 1e9, attenuation 1/8:
    //   w1 = (125e6, 250e6, 125e6)
    //   w2 = (31.25e6, 31.25e6, 31.25e6)
    //   w3 = (3906250, 7812500, 3906250)
    val sym = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val out = Graph4.katz(sym, Graph4.KatzIters).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("katz_scaled")).toMap
    assert(out === Map(
      0L -> (125000000L + 31250000L + 3906250L),
      1L -> (250000000L + 31250000L + 7812500L),
      2L -> (125000000L + 31250000L + 3906250L)))
  }

  test("katz: the endpoint of a star never out-scores the hub") {
    // star: hub 1 connected to 2,3,4 — the hub collects 3 attenuated
    // masses per hop, each leaf only the hub's
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val sym = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = Graph4.katz(sym, Graph4.KatzIters).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("katz_scaled")).toMap
    assert(out(1L) > out(2L))
    assert(out(2L) === out(3L) && out(3L) === out(4L))
  }
}
