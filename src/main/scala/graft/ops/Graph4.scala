package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** Fourth graph pack: cohesive-subgraph mining (k-truss) and deterministic
  * random-walk sampling — the walk generator is the data-production side
  * of graph learning (walk corpora feed node-embedding trainers), stated
  * with the same integer-hash determinism the corpus samplers use.
  */
object Graph4 {

  def pack: Seq[Q] = Seq(g76KTruss, g77RandomWalks, g78LubyMis,
    g79TemporalReach, g80HarmonicCentrality, g81KatzCentrality)

  private val TrussK = 4
  private val TrussRounds = 3
  private val WalkSteps = 4

  /** Part co-purchase edges, the g62/g71 base: parts co-ordered ≥ 2
    * times, oriented x < y. */
  private def coEdges(s: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    val lp = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("x"), col("y"))
  }

  /** Per-edge triangle support of an x<y oriented edge set: enumerate
    * each triangle a<b<c once (the g71 double-join), then credit its
    * three edges. Support is the quantity k-truss peels on. */
  def support(e: DataFrame): DataFrame = {
    val tris = e.as("e1")
      .join(e.as("e2"), col("e1.y") === col("e2.x"))
      .join(e.as("e3"),
        col("e1.x") === col("e3.x") && col("e2.y") === col("e3.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
    tris.select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("c").as("y")),
        struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .select(col("e.x"), col("e.y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("sup"))
  }

  /** g76: K-TRUSS PEEL — three rounds of 4-truss peeling over the part
    * co-purchase graph: every edge must sit in ≥ k−2 = 2 triangles, edges
    * below the bar are removed, and removal cascades (a surviving edge's
    * support can drop once its triangles lose a side). The report is the
    * peel trajectory — edges before/kept/removed per round — the
    * shrinking-core summary a community-mining pipeline monitors.
    *
    * Scale shape: each round is one triangle enumeration (two self-joins
    * of the current edge set, the same shape as g62) plus a semi join —
    * all keyed shuffles, no broadcast of anything graph-sized. Round
    * state is eagerly checkpointed (flat lineage, ≤ 2 edge tables live,
    * the g60 loop contract) and superseded rounds are released. Peeling
    * is monotone (edge sets only shrink), so round cost falls as the
    * core tightens; a fixed round count keeps the oracle replayable as
    * an unrolled MATERIALIZED-CTE loop.
    */
  /** The peel loop, exposed for planted-graph specs: returns the
    * per-round (round, n_before, n_kept, n_removed) trajectory. */
  def ktrussPeel(e0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = e0.localCheckpoint(true)
    var stats = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      val kept = e.join(
          support(e).filter(col("sup") >= k - 2),
          Seq("x", "y"), "left_semi")
        .localCheckpoint(true)
      // materialize the 1-row stat BEFORE releasing this round's edge
      // blocks — the count aggregates read them
      stats = stats :+ e.agg(count(lit(1)).as("n_before"))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
        .select(lit(r).as("round"), col("n_before"), col("n_kept"),
          (col("n_before") - col("n_kept")).as("n_removed"))
        .localCheckpoint(true)
      Q.releaseBlocks(e)
      e = kept
    }
    val out = stats.reduce(_ unionAll _).orderBy(col("round"))
      .localCheckpoint(true)
    Q.releaseBlocks(e)
    out
  }

  val g76KTruss: Q = Q(
    "g76_ktruss",
    (s, dir) => ktrussPeel(coEdges(s, dir), TrussK, TrussRounds),
    Some {
      def round(prev: String, cur: String) = s"""
      sup_$cur AS MATERIALIZED (
        SELECT x, y, count(*) AS sup FROM (
          SELECT t.a AS x, t.b AS y FROM tri_$cur t
          UNION ALL SELECT t.b, t.c FROM tri_$cur t
          UNION ALL SELECT t.a, t.c FROM tri_$cur t) c
        GROUP BY x, y),
      $cur AS MATERIALIZED (
        SELECT e.x, e.y FROM $prev e
        JOIN sup_$cur s ON e.x = s.x AND e.y = s.y
        WHERE s.sup >= ${TrussK - 2})"""
      def tri(src: String, cur: String) = s"""
      tri_$cur AS MATERIALIZED (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM $src e1
        JOIN $src e2 ON e1.y = e2.x
        JOIN $src e3 ON e1.x = e3.x AND e2.y = e3.y)"""
      s"""
      WITH lp AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT a.p AS x, b.p AS y
        FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      ${tri("e0", "r1")}, ${round("e0", "r1")},
      ${tri("r1", "r2")}, ${round("r1", "r2")},
      ${tri("r2", "r3")}, ${round("r2", "r3")}
      SELECT round, n_before, n_kept, n_before - n_kept AS n_removed
      FROM (
        SELECT 1 AS round, (SELECT CAST(count(*) AS BIGINT) FROM e0)
            AS n_before,
          (SELECT CAST(count(*) AS BIGINT) FROM r1) AS n_kept
        UNION ALL
        SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM r1),
          (SELECT CAST(count(*) AS BIGINT) FROM r2)
        UNION ALL
        SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM r2),
          (SELECT CAST(count(*) AS BIGINT) FROM r3)) t
      ORDER BY round"""
    })

  /** g77: DETERMINISTIC RANDOM WALKS — fixed-length walks over the
    * customer–supplier bipartite graph (the g60 node encoding), one walk
    * per seed customer, each step choosing the neighbor that minimizes a
    * Knuth multiplicative hash of (current node, candidate, step). The
    * hash plays the role of the RNG: the walk corpus is fully
    * reproducible — the property a training-data generator needs for
    * lineage audits — and both engines replay it bit-exactly.
    *
    * Scale shape: one walk step = one keyed join of the O(walks)
    * frontier against the src-keyed adjacency, then an argmin per walk
    * (a window over each walk's candidate set — partitioned by walk id,
    * never global). Walk state is checkpointed per step, superseded
    * frontiers released. Node ids stay raw; nothing is packed, so no
    * id-width bound.
    */
  /** The walk loop, exposed for planted-graph specs: `adj` is a
    * symmetric (src, dst) adjacency, `seeds` one (wid, node) row per
    * walk; returns every (wid, step, node) visit. */
  def hashWalks(adj: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    val a = adj.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = seeds
      .select(col("wid"), lit(0).as("step"), col("node"))
      .localCheckpoint(true)
    var path = frontier
    for (i <- 1 to steps) {
      val w = Window.partitionBy(col("wid"))
        .orderBy(col("h"), col("dst"))
      val next = frontier
        .join(a.hint("shuffle_hash"), col("node") === col("src"))
        .select(col("wid"),
          pmod((col("node") * 1000003 + col("dst") * 131 + lit(i)),
            lit(1000000007L)).as("m"), col("dst"))
        .select(col("wid"),
          pmod(col("m") * 2654435761L, lit(4294967296L)).as("h"),
          col("dst"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("wid"), lit(i).as("step"), col("dst").as("node"))
        .localCheckpoint(true)
      path = path.unionAll(next)
      frontier = next
    }
    val out = path.orderBy(col("wid"), col("step")).localCheckpoint(true)
    a.unpersist()
    out
  }

  val g77RandomWalks: Q = Q(
    "g77_random_walks",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val adj = cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
      val seeds = adj.select(col("src")).distinct()
        .filter(col("src") % 2 === 0 && expr("src div 2") % 97 === 0)
        .select(col("src").as("wid"), col("src").as("node"))
      hashWalks(adj, seeds, WalkSteps)
    },
    Some {
      def step(prev: String, cur: String, i: Int) = s"""
      $cur AS MATERIALIZED (
        SELECT wid, $i AS step, dst AS node FROM (
          SELECT f.wid, a.dst,
            row_number() OVER (PARTITION BY f.wid ORDER BY
              ((f.node * 1000003 + a.dst * 131 + $i) % 1000000007)
                * 2654435761 % 4294967296, a.dst) AS rn
          FROM $prev f JOIN adj a ON f.node = a.src) t
        WHERE rn = 1)"""
      s"""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      adj AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM cs
        UNION ALL SELECT s, c FROM cs),
      w0 AS MATERIALIZED (
        SELECT src AS wid, 0 AS step, src AS node
        FROM (SELECT DISTINCT src FROM adj) n
        WHERE src % 2 = 0 AND (src // 2) % 97 = 0),
      ${step("w0", "w1", 1)}, ${step("w1", "w2", 2)},
      ${step("w2", "w3", 3)}, ${step("w3", "w4", 4)}
      SELECT wid, step, node FROM (
        SELECT * FROM w0 UNION ALL SELECT * FROM w1
        UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
        UNION ALL SELECT * FROM w4) t
      ORDER BY wid, step"""
    })

  private val MisRounds = 3

  /** Unique Luby priority: Knuth hash (30 bits) packed above the node id
    * (33 bits) — strict-minimum comparisons need NO tie handling because
    * the low bits make every priority distinct. Bound: node < 2³³. */
  private def prio(node: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(pmod(node, lit(1000000007L)) * 2654435761L, lit(1073741824L)) *
      8589934592L + node

  /** The Luby loop, exposed for planted-graph independence specs: takes
    * x<y oriented edges, returns the per-round trajectory
    * (round, n_new_mis, n_removed, n_active_after, mis_id_sum). */
  def lubyMis(e0: DataFrame, rounds: Int): DataFrame = {
    val nodes0 = e0.select(col("x").as("node"))
      .unionAll(e0.select(col("y").as("node"))).distinct()
    var active = nodes0.select(col("node"), prio(col("node")).as("p"))
      .localCheckpoint(true)
    var edges = e0.localCheckpoint(true)
    var stats = Seq.empty[DataFrame]
    for (r <- 1 to rounds) {
      val sym = edges.select(col("x").as("src"), col("y").as("dst"))
        .unionAll(edges.select(col("y").as("src"), col("x").as("dst")))
      val nbMin = sym
        .join(active.select(col("node").as("dst"), col("p").as("pd")), "dst")
        .groupBy(col("src")).agg(min(col("pd")).as("minnb"))
      // strict local minimum enters the MIS; isolated actives (no
      // neighbor row) enter too — their minnb is null
      val mis = active.join(nbMin,
          col("node") === col("src"), "left")
        .filter(col("minnb").isNull || col("p") < col("minnb"))
        .select(col("node")).localCheckpoint(true)
      val removed = mis
        .unionAll(sym.join(mis, sym("src") === mis("node"))
          .select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      val nextActive = active.join(removed, Seq("node"), "left_anti")
        .localCheckpoint(true)
      val nextEdges = edges
        .join(nextActive.select(col("node").as("x")), Seq("x"), "left_semi")
        .join(nextActive.select(col("node").as("y")), Seq("y"), "left_semi")
        .localCheckpoint(true)
      stats = stats :+ mis.agg(count(lit(1)).as("n_new_mis"),
          coalesce(sum(col("node")), lit(0L)).as("mis_id_sum"))
        .crossJoin(removed.agg(count(lit(1)).as("n_removed")))
        .crossJoin(nextActive.agg(count(lit(1)).as("n_active_after")))
        .select(lit(r).as("round"), col("n_new_mis"), col("n_removed"),
          col("n_active_after"), col("mis_id_sum"))
        .localCheckpoint(true)
      Q.releaseBlocks(active); Q.releaseBlocks(edges)
      Q.releaseBlocks(mis); Q.releaseBlocks(removed)
      active = nextActive
      edges = nextEdges
    }
    val out = stats.reduce(_ unionAll _).orderBy(col("round"))
      .localCheckpoint(true)
    Q.releaseBlocks(active); Q.releaseBlocks(edges)
    out
  }

  /** g78: LUBY MAXIMAL INDEPENDENT SET — three rounds of the classic
    * parallel MIS algorithm over the part co-purchase graph: every
    * active node whose hashed priority is a strict local minimum joins
    * the set, then it and its neighbors retire. The per-round report
    * (new members, removals, survivors, and the member-id checksum)
    * pins the whole trajectory, not just the final census.
    *
    * Scale shape: a round is two keyed joins (neighbor-min, removal
    * semi/anti) over src-keyed frames — no broadcast of anything
    * graph-sized, state checkpointed and released per round (the g60
    * loop contract). The deterministic hash priority is what makes a
    * PARALLEL greedy correct: all executors agree on every local
    * minimum with zero coordination — the same reason Luby beats
    * sequential greedy at cluster scale.
    */
  val g78LubyMis: Q = Q(
    "g78_luby_mis",
    (s, dir) => lubyMis(coEdges(s, dir), MisRounds),
    Some {
      def round(act: String, edg: String, cur: String, r: Int) = s"""
      sym_$cur AS MATERIALIZED (
        SELECT x AS src, y AS dst FROM $edg
        UNION ALL SELECT y, x FROM $edg),
      mis_$cur AS MATERIALIZED (
        SELECT a.node FROM $act a LEFT JOIN (
          SELECT s.src, min(b.p) AS minnb
          FROM sym_$cur s JOIN $act b ON s.dst = b.node
          GROUP BY s.src) m ON a.node = m.src
        WHERE m.minnb IS NULL OR a.p < m.minnb),
      rem_$cur AS MATERIALIZED (
        SELECT DISTINCT node FROM (
          SELECT node FROM mis_$cur
          UNION ALL
          SELECT s.dst FROM sym_$cur s JOIN mis_$cur m ON s.src = m.node) t),
      act_$cur AS MATERIALIZED (
        SELECT a.node, a.p FROM $act a
        WHERE NOT EXISTS (SELECT 1 FROM rem_$cur r WHERE r.node = a.node)),
      edg_$cur AS MATERIALIZED (
        SELECT e.x, e.y FROM $edg e
        WHERE EXISTS (SELECT 1 FROM act_$cur a WHERE a.node = e.x)
          AND EXISTS (SELECT 1 FROM act_$cur a WHERE a.node = e.y)),
      st_$cur AS MATERIALIZED (
        SELECT $r AS round,
          (SELECT CAST(count(*) AS BIGINT) FROM mis_$cur) AS n_new_mis,
          (SELECT CAST(count(*) AS BIGINT) FROM rem_$cur) AS n_removed,
          (SELECT CAST(count(*) AS BIGINT) FROM act_$cur)
            AS n_active_after,
          (SELECT CAST(coalesce(sum(node), 0) AS BIGINT) FROM mis_$cur)
            AS mis_id_sum)"""
      s"""
      WITH lp AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT a.p AS x, b.p AS y
        FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      act0 AS MATERIALIZED (
        SELECT node,
          ((node % 1000000007) * 2654435761) % 1073741824
            * 8589934592 + node AS p
        FROM (SELECT DISTINCT x AS node FROM e0
              UNION SELECT y FROM e0) n),
      ${round("act0", "e0", "r1", 1)},
      ${round("act_r1", "edg_r1", "r2", 2)},
      ${round("act_r2", "edg_r2", "r3", 3)}
      SELECT round, n_new_mis, n_removed, n_active_after, mis_id_sum
      FROM (SELECT * FROM st_r1 UNION ALL SELECT * FROM st_r2
            UNION ALL SELECT * FROM st_r3) t
      ORDER BY round"""
    })

  private val ReachRounds = 3

  /** The temporal-BFS loop, exposed for planted-graph specs: `edges` is a
    * symmetric (src, dst, m) month-stamped adjacency, `seeds` one
    * (node, arr) row per start (arr = earliest usable month). Returns the
    * earliest-arrival table after `rounds` synchronous relaxations. */
  def temporalReach(edges: DataFrame, seeds: DataFrame, rounds: Int)
      : DataFrame = {
    val e = edges.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var arr = seeds.localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cand = e.hint("shuffle_hash")
        .join(arr.withColumnRenamed("node", "src")
          .withColumnRenamed("arr", "a"), "src")
        .filter(col("m") >= col("a"))
        .groupBy(col("dst")).agg(min(col("m")).as("arr"))
        .select(col("dst").as("node"), col("arr"))
      val next = arr.unionAll(cand)
        .groupBy(col("node")).agg(min(col("arr")).as("arr"))
        .localCheckpoint(true)
      Q.releaseBlocks(arr)
      arr = next
    }
    e.unpersist()
    arr
  }

  /** g79: TIME-RESPECTING REACHABILITY — which nodes can a seed set's
    * influence reach when information only flows FORWARD in time: a hop
    * over a month-m trading edge is usable only at months ≥ the arrival
    * month at its source (Kempe et al.'s temporal-path constraint). A
    * static BFS (g64) vastly overstates reach — a 1995 edge cannot
    * propagate something learned in 1998; this is the honest epidemic /
    * information-diffusion radius. Report: earliest-arrival-month census
    * by node side plus an id checksum per month.
    *
    * Scale shape: each round is ONE src-keyed join of the arrival table
    * against the cached month-stamped adjacency + a dst-keyed min — the
    * g60 loop contract with a time filter; the arrival table is the only
    * state and only it moves. Output is month-bounded.
    */
  val g79TemporalReach: Q = Q(
    "g79_temporal_reach",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          ((year(col("o_orderdate")) - 1995) * 12 +
            month(col("o_orderdate")) - 1).cast("long").as("m"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"), col("m"))
        .distinct()
      val sym = cs.select(col("c").as("src"), col("s").as("dst"), col("m"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst"),
          col("m")))
      val seeds = cs.select(col("c").as("node")).distinct()
        .filter(expr("node div 2") % 250 === 0)
        .select(col("node"), lit(0L).as("arr"))
      temporalReach(sym, seeds, ReachRounds)
        .groupBy(col("arr"))
        .agg(sum(when(col("node") % 2 === 0, 1L).otherwise(0L))
          .as("n_customers"),
          sum(when(col("node") % 2 === 1, 1L).otherwise(0L))
            .as("n_suppliers"),
          sum(col("node")).as("id_sum"))
        .orderBy(col("arr"))
    },
    Some {
      def round(prev: String, cur: String) = s"""
      $cur AS MATERIALIZED (
        SELECT node, CAST(min(arr) AS BIGINT) AS arr FROM (
          SELECT node, arr FROM $prev
          UNION ALL
          SELECT e.dst AS node, CAST(min(e.m) AS BIGINT) AS arr
          FROM sym e JOIN $prev p ON e.src = p.node
          WHERE e.m >= p.arr
          GROUP BY e.dst) t
        GROUP BY node)"""
      s"""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
          CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
               AS BIGINT) AS m
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      sym AS MATERIALIZED (
        SELECT c AS src, s AS dst, m FROM cs
        UNION ALL SELECT s, c, m FROM cs),
      a0 AS MATERIALIZED (
        SELECT node, CAST(0 AS BIGINT) AS arr
        FROM (SELECT DISTINCT c AS node FROM cs) n
        WHERE (node // 2) % 250 = 0),
      ${round("a0", "a1")}, ${round("a1", "a2")}, ${round("a2", "a3")}
      SELECT arr,
        CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_customers,
        CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_suppliers,
        CAST(sum(node) AS BIGINT) AS id_sum
      FROM a3 GROUP BY arr ORDER BY arr"""
    })

  private val HarmonicRounds = 3

  /** Multi-source labeled BFS, exposed for planted-graph specs: state is
    * (seed, node, d); each round relaxes one hop, keeping the min
    * distance per (seed, node). */
  def multiBfs(adj: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val a = adj.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("seed"), col("node"), lit(0L).as("d"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cand = a.hint("shuffle_hash")
        .join(dist.withColumnRenamed("node", "src"), "src")
        .groupBy(col("seed"), col("dst"))
        .agg((min(col("d")) + 1).as("d"))
        .select(col("seed"), col("dst").as("node"), col("d"))
      val next = dist.unionAll(cand)
        .groupBy(col("seed"), col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
      Q.releaseBlocks(dist)
      dist = next
    }
    a.unpersist()
    dist
  }

  /** g80: HARMONIC CENTRALITY (sampled) — Σ_seeds 1/d(seed, v) within a
    * 3-hop horizon, from a deterministic seed sample: the
    * closeness-family score that handles disconnection gracefully
    * (unreached pairs contribute 0, no ∞ bookkeeping — the reason
    * harmonic replaced classic closeness on big graphs, Boldi & Vigna
    * 2014). Reciprocals land on the 10⁶ integer grid (10⁶ div d — d ≤ 3,
    * exact), so scores sum and compare exactly. Top-15 nodes reported.
    *
    * Scale shape: one multi-source labeled BFS — state is (seed, node)
    * keyed, each round one src-keyed join + min-merge (g60 loop
    * contract with a seed label riding along); seed count bounds the
    * state multiplier. The final score is one keyed rollup + a bounded
    * top-k.
    */
  val g80HarmonicCentrality: Q = Q(
    "g80_harmonic_centrality",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val adj = cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
      val seeds = cs.select(col("c").as("node")).distinct()
        .filter(expr("node div 2") % 401 === 0)
        .select(col("node").as("seed"), col("node"))
      multiBfs(adj, seeds, HarmonicRounds)
        .filter(col("d") > 0)
        .groupBy(col("node"))
        .agg(sum(expr("1000000 div d")).as("harmonic_micro"),
          count(lit(1)).as("n_seeds_reaching"))
        .orderBy(col("harmonic_micro").desc, col("node"))
        .limit(15)
    },
    Some {
      def round(prev: String, cur: String) = s"""
      $cur AS MATERIALIZED (
        SELECT seed, node, CAST(min(d) AS BIGINT) AS d FROM (
          SELECT seed, node, d FROM $prev
          UNION ALL
          SELECT p.seed, e.dst AS node, CAST(min(p.d) + 1 AS BIGINT) AS d
          FROM sym e JOIN $prev p ON e.src = p.node
          GROUP BY p.seed, e.dst) t
        GROUP BY seed, node)"""
      s"""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      sym AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM cs
        UNION ALL SELECT s, c FROM cs),
      d0 AS MATERIALIZED (
        SELECT node AS seed, node, CAST(0 AS BIGINT) AS d
        FROM (SELECT DISTINCT c AS node FROM cs) n
        WHERE (node // 2) % 401 = 0),
      ${round("d0", "d1")}, ${round("d1", "d2")}, ${round("d2", "d3")}
      SELECT node,
        CAST(sum(1000000 // d) AS BIGINT) AS harmonic_micro,
        CAST(count(*) AS BIGINT) AS n_seeds_reaching
      FROM d3 WHERE d > 0
      GROUP BY node
      ORDER BY harmonic_micro DESC, node LIMIT 15"""
    })

  // ----------------------------------------------------- Katz centrality

  /** Fixed-point unit for Katz walk mass (10⁻⁹ — three decades more
    * headroom than g60's 10⁻¹² because walk mass GROWS multiplicatively
    * with degree: w_k ≤ (d_max·α)^k·KatzScale, and hub in-degrees here
    * reach the hundreds).
    */
  private[ops] val KatzScale = 1000000000L
  private[ops] val KatzIters = 3
  /** Attenuation α = 1/KatzAtt, applied as one integer divide per edge
    * hop — Spark `div` and DuckDB `//` agree on the positive domain.
    */
  private[ops] val KatzAtt = 8L

  /** Katz walk-mass accumulation over `iters` hops: w₀(v) = KatzScale,
    * w_k(v) = Σ_{u→v} (w_{k-1}(u) div KatzAtt), and the score is
    * Σ_{k=1..iters} w_k — the truncated Katz series Σ αᵏ(Aᵀ)ᵏ·1 in exact
    * integer arithmetic. The g60 loop contract verbatim: cached
    * hash(src)-partitioned degree-joined edges, each round shuffles only
    * the O(nodes) mass table, rounds checkpointed, nothing broadcast.
    * Exposed for planted-graph specs.
    */
  def katz(edges: DataFrame, iters: Int): DataFrame = {
    val (e, deg, ew, ncnt) = Graph.edgeState(edges)
    require(ncnt.head().getLong(0) > 0,
      "katz on an empty edge set (no nodes)")
    var w = deg.select(col("src").as("node"), lit(KatzScale).as("w"))
      .localCheckpoint(true)
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (_ <- 1 to iters) {
      val next = ew
        .join(w.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst"), expr(s"w div $KatzAtt").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("w"))
        .select(col("dst").as("node"), col("w"))
        .localCheckpoint(true)
      // w₀ is not part of the score and w_{k-1} already fed this round —
      // release it unless a later union still needs it (rounds keeps k≥1)
      if (!rounds.contains(w)) Q.releaseBlocks(w)
      w = next
      rounds += next
    }
    val res = rounds.reduce(_ unionAll _)
      .groupBy(col("node")).agg(sum(col("w")).as("katz_scaled"))
    ew.unpersist(); deg.unpersist(); e.unpersist()
    Q.materialized(res, rounds.toSeq: _*)
  }

  /** g81: KATZ CENTRALITY over the g60 customer↔supplier trade graph —
    * the walk-counting complement of PageRank: where PageRank's random
    * surfer NORMALIZES by out-degree (influence as probability), Katz
    * counts attenuated walks raw, so well-connected hubs score by reach
    * rather than by share. Completes the centrality family
    * (degree g75, eigenvector-style g60/g71, hub/authority g66,
    * harmonic g80). Truncated at `KatzIters` hops with α = 1/8 in exact
    * integer fixed point; the oracle replays the identical recurrence
    * through MATERIALIZED per-round CTEs.
    */
  val g81KatzCentrality: Q = Q(
    "g81_katz",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      katz(edges, KatzIters)
        .select(
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          expr("node div 2").as("key"),
          col("katz_scaled"))
        .orderBy(col("kind"), col("key"))
    },
    Some {
      def round(prev: String, cur: String) = s"""
      $cur AS MATERIALIZED (
        SELECT e.dst AS node, CAST(sum(p.w // $KatzAtt) AS BIGINT) AS w
        FROM edges e JOIN $prev p ON e.src = p.node
        GROUP BY e.dst)"""
      s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s, c FROM pairs),
      k0 AS MATERIALIZED (
        SELECT src AS node, CAST($KatzScale AS BIGINT) AS w
        FROM (SELECT DISTINCT src FROM edges) n),
      ${round("k0", "k1")}, ${round("k1", "k2")}, ${round("k2", "k3")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
          AS kind,
        node // 2 AS key,
        CAST(sum(w) AS BIGINT) AS katz_scaled
      FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2
            UNION ALL SELECT * FROM k3) t
      GROUP BY 1, 2 ORDER BY kind, key"""
    })
}
