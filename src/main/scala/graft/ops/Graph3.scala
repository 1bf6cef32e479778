package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** Graph analytics, third wave: weighted shortest paths and the degree-
  * assortativity coefficient — distance and topology-shape queries over
  * the customer↔supplier trade graph.
  */
object Graph3 {

  def pack: Seq[Q] = Seq(g69Sssp, g70Assortativity, g71ClusteringCoef,
    g72Modularity, g73Diameter, g75DegreeHistogram)

  /** g75: DEGREE DISTRIBUTION PROFILE — log₂-bucketed degree histogram of
    * the trade graph plus each bucket's share and the CCDF ("what
    * fraction of nodes have degree ≥ 2ᵏ"): the first chart drawn for any
    * graph ("is this heavy-tailed?"), and the input to every hub-cap
    * decision in this repo (g68's MaxCustDeg, d41's stop-shingles). One
    * keyed degree count; floor(log₂ d) computed INTEGER-exactly in both
    * engines as length(bin(d))−1 (a float ln(d)/ln(2) can misbucket at
    * exact powers of two); constant-size output; CCDF by a reverse
    * running sum over ≤64 buckets.
    */
  val g75DegreeHistogram: Q = Q(
    "g75_degree_histogram",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val deg = pairs.select(col("c").as("node"))
        .unionAll(pairs.select(col("s").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val h = deg
        .withColumn("bucket", (length(bin(col("d"))) - 1).cast("long"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_nodes"))
      val tot = h.agg(sum(col("n_nodes")).as("n_total"))
      val w = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.crossJoin(broadcast(tot))
        .withColumn("n_at_least", sum(col("n_nodes")).over(w))
        .select(col("bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
            .as("min_degree"),
          col("n_nodes"),
          expr("n_nodes * 10000 div n_total").as("share_bp"),
          expr("n_at_least * 10000 div n_total").as("ccdf_bp"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      deg AS (
        SELECT node, count(*) AS d FROM (
          SELECT c AS node FROM pairs UNION ALL SELECT s FROM pairs) t
        GROUP BY node),
      h AS (
        SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
          count(*) AS n_nodes
        FROM deg GROUP BY 1),
      tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM h)
      SELECT bucket, CAST(1 << CAST(bucket AS INT) AS BIGINT) AS min_degree,
        n_nodes,
        n_nodes * 10000 // (SELECT n_total FROM tot) AS share_bp,
        CAST(sum(n_nodes) OVER (ORDER BY bucket DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          * 10000 // (SELECT n_total FROM tot) AS ccdf_bp
      FROM h ORDER BY bucket"""))

  val BfsRounds = 6

  /** g73: DIAMETER ESTIMATE BY DOUBLE BFS SWEEP — the standard two-pass
    * lower bound: BFS from an arbitrary anchor (the min node), take the
    * farthest reached node (ties → min id), BFS again from there; that
    * second eccentricity lower-bounds the true diameter and is exact on
    * trees — the cheap "how wide is this graph" answer that avoids
    * all-pairs work. Each sweep is the g69 frontier loop with unit
    * lengths and a fixed `BfsRounds` horizon (so the oracle replays the
    * recurrence; distances reported are horizon-bounded).
    */
  val g73Diameter: Q = Q(
    "g73_diameter",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"),
          lit(1L).as("len"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst"),
          lit(1L).as("len")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val anchor = edges.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0L).as("d"))
      val sweep1 = sssp(edges, anchor, BfsRounds)
      // farthest node, ties → min id: packed argmax (d ≤ BfsRounds « 2³²)
      val far = sweep1.agg(min((lit(1048576L) - col("d")) * 4294967296L +
          col("node")).as("p"))
        .select((col("p") % 4294967296L).as("node"), lit(0L).as("d"))
      val sweep2 = sssp(edges, far.localCheckpoint(true), BfsRounds)
      val out = sweep2
        .agg(max(col("d")).as("diameter_lb"),
          count(lit(1)).as("n_reached"))
        .crossJoin(broadcast(far.select(col("node").as("far_node"))))
        .crossJoin(broadcast(anchor.select(col("node").as("anchor_node"))))
        .select(col("anchor_node"), col("far_node"), col("diameter_lb"),
          col("n_reached"))
      val res = Q.materialized(out, edges)
      res
    },
    Some {
      def sweep(tag: String, seed: String) = {
        val rounds = (1 to BfsRounds).map { i =>
          s"""
      ${tag}$i AS MATERIALIZED (
        SELECT node, min(d) AS d FROM (
          SELECT e.dst AS node, p.d + 1 AS d
          FROM ${tag}${i - 1} p JOIN edges e ON e.src = p.node
          UNION ALL SELECT node, d FROM ${tag}${i - 1}) u
        GROUP BY node)"""
        }.mkString(",")
        s"""
      ${tag}0 AS ($seed),$rounds"""
      }
      s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s AS src, c AS dst FROM pairs),
      ${sweep("a", "SELECT min(src) AS node, CAST(0 AS BIGINT) AS d FROM edges")},
      far AS (
        SELECT CAST(min((1048576 - d) * 4294967296 + node) % 4294967296
                    AS BIGINT) AS node
        FROM a$BfsRounds),
      ${sweep("b", s"SELECT node, CAST(0 AS BIGINT) AS d FROM far")}
      SELECT (SELECT min(src) FROM edges) AS anchor_node,
        (SELECT node FROM far) AS far_node,
        CAST(max(d) AS BIGINT) AS diameter_lb,
        count(*) AS n_reached
      FROM b$BfsRounds"""
    })

  /** g72: MODULARITY of the g67 label-propagation communities — Newman's
    * Q = Σ_c [intra_c/L − (d_c/L)²] over the symmetric edge list (L =
    * 2·edges): did LPA actually find denser-than-chance structure, or
    * just connected blobs? The quality score every community pipeline
    * reports next to its labels.
    *
    * Exactness: intra/degree masses are integers; the per-community
    * contribution is the exact integer intra_c·L − d_c², accumulated in
    * DECIMAL(38,0) (overflow-proof at any edge count), with ONE IEEE
    * division by L² at the end — both engines agree bit-exact. Plan:
    * the LPA loop (g67's shape) + two label-keyed aggregates (edge
    * intra test = one two-sided label join) + a one-row total.
    */
  val g72Modularity: Q = Q(
    "g72_modularity",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val labels = Graph2.labelPropagation(edges, Graph2.LpaIters)
      val lsrc = labels.select(col("node").as("src"), col("label").as("lsrc"))
      val ldst = labels.select(col("node").as("dst"), col("label").as("ldst"))
      val tagged = edges
        .join(lsrc.hint("shuffle_hash"), "src")
        .join(ldst.hint("shuffle_hash"), "dst")
      val perComm = tagged.groupBy(col("lsrc").as("community"))
        .agg(count(lit(1)).as("d_c"),
          sum(when(col("lsrc") === col("ldst"), 1L).otherwise(0L))
            .as("intra_c"))
      val lTot = edges.agg(count(lit(1)).as("bigL"))
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val out = perComm.crossJoin(broadcast(lTot))
        .agg(count(lit(1)).as("n_communities"),
          min(col("bigL")).as("bigL"),
          sum((col("intra_c") * col("bigL") - col("d_c") * col("d_c"))
            .cast(d38)).as("num"))
        .select(col("n_communities"), expr("bigL div 2").as("m_edges"),
          (col("num").cast("double") /
            (col("bigL") * col("bigL")).cast("double")).as("modularity"))
      Q.materialized(out, edges)
    },
    Some {
      val rounds = (1 to Graph2.LpaIters).map { i =>
        s"""
      l$i AS MATERIALIZED (
        SELECT dst AS node,
          CAST(min((${Graph2.MaxCnt} - c) * ${Graph2.LabelPackP} + label)
               % ${Graph2.LabelPackP} AS BIGINT) AS label
        FROM (
          SELECT e.dst, l.label, count(*) AS c
          FROM edges e JOIN l${i - 1} l ON e.src = l.node
          GROUP BY e.dst, l.label) v
        GROUP BY dst)"""
      }.mkString(",")
      s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s AS src, c AS dst FROM pairs),
      l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS label FROM edges),$rounds,
      tagged AS (
        SELECT ls.label AS lsrc, ld.label AS ldst
        FROM edges e
        JOIN l${Graph2.LpaIters} ls ON ls.node = e.src
        JOIN l${Graph2.LpaIters} ld ON ld.node = e.dst),
      ltot AS (SELECT count(*) AS bigL FROM edges),
      per_comm AS (
        SELECT lsrc AS community, count(*) AS d_c,
          CAST(sum(CASE WHEN lsrc = ldst THEN 1 ELSE 0 END) AS BIGINT)
            AS intra_c
        FROM tagged GROUP BY lsrc)
      SELECT CAST(count(*) AS BIGINT) AS n_communities,
        (SELECT bigL FROM ltot) // 2 AS m_edges,
        CAST(sum(CAST(intra_c * (SELECT bigL FROM ltot) - d_c * d_c
                      AS DECIMAL(38,0))) AS DOUBLE)
          / CAST((SELECT bigL FROM ltot) * (SELECT bigL FROM ltot) AS DOUBLE)
          AS modularity
      FROM per_comm"""
    })

  /** g71: LOCAL CLUSTERING COEFFICIENT — per node of the part co-purchase
    * graph (g62's edge set): how many of my neighbors' pairs are
    * themselves connected, as triangles·10⁴ ÷ (deg choose 2). The
    * per-node refinement of g62's global census — nodes with high degree
    * but low coefficient are BRIDGES, high-coefficient nodes sit inside
    * dense cliques (the ecosystem-vs-broker distinction).
    *
    * Plan: triangles enumerated once on the x<y<z ORIENTED join (each
    * triangle exactly once — no double counting, and the oriented edge
    * list halves the join input), then each triangle credits its three
    * corners via explode + keyed count; degrees from the symmetric list;
    * one keyed join assembles the report. Scale: the wedge join is the
    * g62 cost (bounded by Σdeg² of the oriented list); everything after
    * is keyed aggregates over node-sized tables.
    */
  val g71ClusteringCoef: Q = Q(
    "g71_clustering_coef",
    (s, dir) => {
      val lp = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val e0 = lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("x"), col("b.p").as("y"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .select(col("x"), col("y"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tris = e0.as("e1")
        .join(e0.as("e2"), col("e1.y") === col("e2.x"))
        .join(e0.as("e3"),
          col("e1.x") === col("e3.x") && col("e2.y") === col("e3.y"))
        .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
      val credits = tris
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      val deg = e0.select(col("x").as("node"))
        .unionAll(e0.select(col("y").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val out = deg.filter(col("deg") >= 2)
        .join(credits, Seq("node"), "left")
        .select(col("node").as("p_partkey"), col("deg"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          expr("coalesce(n_triangles, 0) * 10000 div (deg * (deg - 1) div 2)")
            .as("clustering_bp"))
        .orderBy(col("p_partkey"))
      Q.materialized(out, e0)
    },
    Some("""
      WITH lp AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT a.p AS x, b.p AS y
        FROM lp a JOIN lp b ON a.ok = b.ok AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      tris AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM e0 e1
        JOIN e0 e2 ON e1.y = e2.x
        JOIN e0 e3 ON e1.x = e3.x AND e2.y = e3.y),
      credits AS (
        SELECT node, count(*) AS n_triangles FROM (
          SELECT a AS node FROM tris
          UNION ALL SELECT b FROM tris
          UNION ALL SELECT c FROM tris) t
        GROUP BY node),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT x AS node FROM e0 UNION ALL SELECT y FROM e0) t
        GROUP BY node)
      SELECT d.node AS p_partkey, d.deg,
        CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles,
        CAST(coalesce(c.n_triangles, 0) AS BIGINT) * 10000
          // (d.deg * (d.deg - 1) // 2) AS clustering_bp
      FROM deg d LEFT JOIN credits c USING (node)
      WHERE d.deg >= 2
      ORDER BY p_partkey"""))

  val SsspRounds = 4

  /** Weighted single-source shortest paths, Bellman–Ford horizon
    * `rounds`, over (src, dst, len) edges from (src, d=0) seeds.
    *
    * The dist table only ever holds REACHED nodes (no ∞ sentinel
    * arithmetic), and each round relaxes only from the FRONTIER — nodes
    * whose distance improved last round. A settled node's contributions
    * were already min-merged the round it settled, so frontier relaxation
    * provably yields the same table as re-relaxing everything (the
    * oracle replays the naive union-relax form and the hash must agree)
    * while moving O(frontier·deg) instead of O(reached·deg) rows per
    * round. Edges are cached hash-partitioned on src once (the g60 loop
    * contract); round state is eagerly checkpointed, ≤2 tables live.
    */
  def sssp(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val ew = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col("node"), col("d")).localCheckpoint(true)
    var frontier = dist
    for (_ <- 1 to rounds) {
      val contribs = frontier
        .join(ew.withColumnRenamed("src", "node").hint("shuffle_hash"), "node")
        .select(col("dst").as("node"), (col("d") + col("len")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val merged = dist.join(contribs, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("d"), col("nd")), coalesce(col("nd"), col("d")))
            .as("d"),
          (col("d").isNull || col("nd") < col("d")).as("improved"))
        .localCheckpoint(true)
      Q.releaseBlocks(dist)
      dist = merged.select(col("node"), col("d"))
      frontier = merged.filter(col("improved")).select(col("node"), col("d"))
    }
    ew.unpersist()
    dist
  }

  /** g69: WEIGHTED SHORTEST PATHS from the best-connected customer —
    * edge length = 10⁶ div (shared-order count) + 1, so strong trade
    * ties are short hops and the distances read as "relationship
    * closeness" (the supply-chain-proximity query; g64 is its unweighted
    * hop twin). Integer lengths end-to-end; `SsspRounds` Bellman–Ford
    * rounds bound the horizon so the oracle can replay the recurrence
    * through unrolled MATERIALIZED CTEs.
    */
  val g69Sssp: Q = Q(
    "g69_sssp",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val po = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"),
          col("o_orderkey"))
        .distinct()
        .groupBy(col("c"), col("s")).agg(count(lit(1)).as("w"))
      val wpairs = po.select(col("c"), col("s"),
        (expr("1000000 div w") + 1).as("len"))
      val edges = wpairs.select(col("c").as("src"), col("s").as("dst"), col("len"))
        .unionAll(wpairs.select(col("s").as("src"), col("c").as("dst"), col("len")))
      // source: the customer carrying the most distinct trade edges,
      // ties → smallest key (packed argmax, one row broadcast)
      val src = po.groupBy(col("c")).agg(count(lit(1)).as("deg"))
        .agg(min((lit(1048576L) - col("deg")) * 4294967296L + col("c")).as("p"))
        .select((col("p") % 4294967296L).as("node"), lit(0L).as("d"))
      sssp(edges, src, SsspRounds)
        .select(
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          expr("node div 2").as("key"), col("d").as("dist"))
        .orderBy(col("kind"), col("key"))
    },
    Some {
      val rounds = (1 to SsspRounds).map { i =>
        s"""
      d$i AS MATERIALIZED (
        SELECT node, min(d) AS d FROM (
          SELECT e.dst AS node, p.d + e.len AS d
          FROM d${i - 1} p JOIN edges e ON e.src = p.node
          UNION ALL SELECT node, d FROM d${i - 1}) u
        GROUP BY node)"""
      }.mkString(",")
      s"""
      WITH po AS MATERIALIZED (
        SELECT c, s, count(*) AS w FROM (
          SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
            o_orderkey
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey) t
        GROUP BY c, s),
      wpairs AS (SELECT c, s, 1000000 // w + 1 AS len FROM po),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst, len FROM wpairs
        UNION ALL SELECT s AS src, c AS dst, len FROM wpairs),
      d0 AS (
        SELECT CAST(min((1048576 - deg) * 4294967296 + c) % 4294967296
                    AS BIGINT) AS node,
          CAST(0 AS BIGINT) AS d
        FROM (SELECT c, count(*) AS deg FROM po GROUP BY c) t),$rounds
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, CAST(d AS BIGINT) AS dist
      FROM d$SsspRounds
      ORDER BY kind, key"""
    })

  /** g70: DEGREE ASSORTATIVITY — the Pearson correlation of endpoint
    * degrees over every (directed, symmetrized) edge: do well-connected
    * customers trade with well-connected suppliers (r>0) or with the
    * periphery (r<0)? One number summarizing topology shape (Newman
    * 2002); bipartite trade graphs typically come out disassortative.
    *
    * Exactness: degrees are integers, so every moment (Σx, Σx², Σxy, M)
    * accumulates in DECIMAL(38,0) — order-independent, overflow-proof at
    * any edge count — and only the final Pearson assembly touches
    * doubles (casts of exact integers + IEEE ·/−/sqrt/÷, identical in
    * both engines). Plan: one keyed degree count, one keyed join to put
    * degrees on both endpoints, one global aggregate row.
    */
  val g70Assortativity: Q = Q(
    "g70_assortativity",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val xy = edges
        .join(deg.hint("shuffle_hash"), "src")
        .withColumnRenamed("deg", "x")
        .join(deg.withColumnRenamed("src", "dst").hint("shuffle_hash"), "dst")
        .withColumnRenamed("deg", "y")
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      xy.agg(
        count(lit(1)).as("m"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
        .select(col("m"),
          ((col("m").cast(d38) * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("m").cast(d38) * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("m").cast(d38) * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("assortativity"))
    },
    Some("""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s AS src, c AS dst FROM pairs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      xy AS (
        SELECT dx.deg AS x, dy.deg AS y
        FROM edges e
        JOIN deg dx ON dx.src = e.src
        JOIN deg dy ON dy.src = e.dst),
      mo AS (
        SELECT count(*) AS m,
          sum(CAST(x AS DECIMAL(38,0))) AS sx,
          sum(CAST(y AS DECIMAL(38,0))) AS sy,
          sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
          sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
          sum(CAST(y * y AS DECIMAL(38,0))) AS syy
        FROM xy)
      SELECT m,
        CAST(CAST(m AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) /
          (sqrt(CAST(CAST(m AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)) *
           sqrt(CAST(CAST(m AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)))
          AS assortativity
      FROM mo"""))
}
