package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** Graph analytics, fifth wave: sampled shortest-path centrality — the
  * classic Brandes dataflow (forward shortest-path counting + backward
  * dependency accumulation over the shortest-path DAG) run from k
  * deterministic hash-picked sources, the standard way betweenness-family
  * scores are estimated when all-pairs is unaffordable.
  */
object Graph5 {

  def pack: Seq[Q] = Seq(g82SampledBetweenness)

  /** Horizon (BFS levels) and sample size. 3 levels keeps every σ·g
    * product far inside BIGINT on the dense trade graph (path counts grow
    * multiplicatively per level — the same reason g73 bounds its sweeps);
    * distances beyond the horizon contribute nothing, the g73 convention.
    */
  val BtwRounds = 3
  val BtwSources = 4

  /** Both Brandes passes for k sources SIMULTANEOUSLY, keyed by (sid,
    * node) — one fused dataflow instead of k sequential BFS runs.
    *
    * Forward: level-synchronous BFS where a node's σ (number of shortest
    * paths from sid) is the SUM of its previous-level predecessors' σ —
    * first arrivals only (anti-join against the reached set), so levels
    * partition the reached nodes per source. Backward: over the implied
    * shortest-path DAG (edges level d → d+1), g(v) = Σ_succ (g(w) + 1)
    * counts the DAG path COMPLETIONS below v, processed one level at a
    * time from the deepest. The per-node score σ(v)·g(v) is then the
    * number of shortest paths from sid THROUGH v — Brandes' stress-
    * centrality variant (Brandes 2008, "On variants of shortest-path
    * betweenness"), which this engine reports instead of the σ_st(v)/σ_st
    * fraction because it is INTEGER-exact: the fractional δ recursion
    * sums engine-ordered float divisions that no decimal staging can make
    * bit-stable across engines, while the path-count twin hash-oracles
    * (the e58/e63 integer-twin convention). On unit-σ graphs (trees) the
    * two are equal — `Graph5Spec` pins that on a path graph.
    *
    * Scale shape: edges cached hash-partitioned on src once (the g60
    * loop contract); every join is (sid, node)-keyed; per-level state is
    * eagerly checkpointed; nothing global, nothing all-pairs —
    * O(k·E) per level, k constant.
    *
    * Returns (sid, node, sigma, g, stress) for every non-source reached
    * node. `seeds`: one `sid` column; `edges`: (src, dst), symmetric.
    */
  def sampledStress(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val ew = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val f0 = seeds.select(col("sid"), col("sid").as("node"),
      lit(1L).as("sigma")).localCheckpoint(true)
    var levels = Vector(f0)
    var dist = f0.select(col("sid"), col("node"))
    for (_ <- 1 to rounds) {
      val contrib = levels.last
        .join(ew.withColumnRenamed("src", "node").hint("shuffle_hash"), "node")
        .groupBy(col("sid"), col("dst"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("sid"), col("dst").as("node"), col("sigma"))
      val fresh = contrib
        .join(dist.withColumn("seen", lit(1)), Seq("sid", "node"), "left")
        .filter(col("seen").isNull).drop("seen")
        .localCheckpoint(true)
      levels = levels :+ fresh
      dist = dist.unionByName(fresh.select(col("sid"), col("node")))
    }
    // backward: g over the DAG, deepest level up; level `rounds` has no
    // successors within the horizon, so its g is the implicit 0
    var g: Option[DataFrame] = None
    var scored: DataFrame = null
    for (lvl <- (rounds - 1) to 0 by -1) {
      val v = levels(lvl).select(col("sid"), col("node"), col("sigma"))
      val w = levels(lvl + 1).select(col("sid").as("w_sid"),
        col("node").as("w_node"))
      val dag = v
        .join(ew.withColumnRenamed("src", "node").hint("shuffle_hash"), "node")
        .join(w, col("sid") === col("w_sid") && col("dst") === col("w_node"))
      val withG = g match {
        case Some(gdf) => dag.join(
          gdf.select(col("sid").as("g_sid"), col("node").as("g_node"),
            col("g")),
          col("w_sid") === col("g_sid") && col("w_node") === col("g_node"),
          "left")
        case None => dag.withColumn("g", lit(null).cast("long"))
      }
      val gcur = withG
        .groupBy(col("sid"), col("node"), col("sigma"))
        .agg(sum(coalesce(col("g"), lit(0L)) + 1L).as("g"))
        .localCheckpoint(true)
      g = Some(gcur.select(col("sid"), col("node"), col("g")))
      val lvlScore = levels(lvl)
        .join(gcur.select(col("sid"), col("node"), col("g")),
          Seq("sid", "node"), "left")
        .select(col("sid"), col("node"), col("sigma"),
          coalesce(col("g"), lit(0L)).as("g"))
      if (lvl > 0)
        scored = if (scored == null) lvlScore else scored.unionByName(lvlScore)
    }
    // the deepest level scores too (g = 0): reached, but no paths continue
    val deepest = levels(rounds)
      .select(col("sid"), col("node"), col("sigma"), lit(0L).as("g"))
    val all = (if (scored == null) deepest else scored.unionByName(deepest))
    val res = all.select(col("sid"), col("node"), col("sigma"), col("g"),
      (col("sigma") * col("g")).as("stress"))
    ew.unpersist()
    res
  }

  /** g82: SAMPLED BETWEENNESS (stress form) over the customer↔supplier
    * trade graph — [[sampledStress]] from [[BtwSources]] md5-hash-picked
    * sources, totalled per node: which customers/suppliers sit on the
    * most shortest trade paths? Top-20 by total through-traffic with the
    * number of sampled sources that route through each. Fully
    * hash-oracled: σ, g, and σ·g are integers end-to-end, and the oracle
    * replays both passes as unrolled MATERIALIZED CTEs (the g73
    * precedent).
    */
  val g82SampledBetweenness: Q = Q(
    "g82_sampled_betweenness",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val seeds = edges.select(col("src").as("node")).distinct()
        .orderBy(Dedup.mh60(col("node").cast("string")), col("node"))
        .limit(BtwSources)
        .select(col("node").as("sid"))
        .localCheckpoint(true)
      val perSid = sampledStress(edges, seeds, BtwRounds)
      val out = perSid
        .groupBy(col("node"))
        .agg(sum(col("stress")).as("stress"),
          sum(when(col("stress") > 0, 1L).otherwise(0L)).as("n_sources"))
        .select(
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          expr("node div 2").as("key"), col("stress"), col("n_sources"))
        .orderBy(col("stress").desc, col("kind"), col("key"))
        .limit(20)
      Q.materialized(out, edges)
    },
    Some {
      val fwd = (1 to BtwRounds).map { i =>
        s"""
      f$i AS MATERIALIZED (
        SELECT p.sid, e.dst AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
        FROM f${i - 1} p JOIN edges e ON e.src = p.node
        WHERE NOT EXISTS (SELECT 1 FROM dist${i - 1} d
                          WHERE d.sid = p.sid AND d.node = e.dst)
        GROUP BY p.sid, e.dst),
      dist$i AS MATERIALIZED (
        SELECT * FROM dist${i - 1}
        UNION ALL SELECT sid, node FROM f$i)"""
      }.mkString(",")
      val bwd = ((BtwRounds - 1) to 1 by -1).map { lvl =>
        val succG =
          if (lvl == BtwRounds - 1) "CAST(0 AS BIGINT)"
          else s"coalesce(b${lvl + 1}.g, 0)"
        val gJoin =
          if (lvl == BtwRounds - 1) ""
          else s"\n        LEFT JOIN b${lvl + 1} ON b${lvl + 1}.sid = w.sid AND b${lvl + 1}.node = w.node"
        s"""
      b$lvl AS MATERIALIZED (
        SELECT v.sid, v.node, CAST(sum($succG + 1) AS BIGINT) AS g
        FROM f$lvl v JOIN edges e ON e.src = v.node
        JOIN f${lvl + 1} w ON w.sid = v.sid AND w.node = e.dst$gJoin
        GROUP BY v.sid, v.node)"""
      }.mkString(",")
      val xLevels = (1 to BtwRounds)
        .map(i => s"SELECT sid, node, sigma FROM f$i").mkString("\n          UNION ALL ")
      val bLevels = (1 to (BtwRounds - 1))
        .map(l => s"SELECT sid, node, g FROM b$l").mkString("\n          UNION ALL ")
      s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS MATERIALIZED (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s AS src, c AS dst FROM pairs),
      f0 AS MATERIALIZED (
        SELECT node AS sid, node, CAST(1 AS BIGINT) AS sigma FROM (
          SELECT DISTINCT src AS node FROM edges
          ORDER BY ${Dedup.sqlMh("CAST(node AS VARCHAR)")}, node
          LIMIT $BtwSources) t),
      dist0 AS MATERIALIZED (SELECT sid, node FROM f0),$fwd,$bwd,
      scored AS (
        SELECT x.sid, x.node, x.sigma * coalesce(b.g, 0) AS stress
        FROM ($xLevels) x
        LEFT JOIN ($bLevels) b ON b.sid = x.sid AND b.node = x.node)
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key,
        CAST(sum(stress) AS BIGINT) AS stress,
        CAST(sum(CASE WHEN stress > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sources
      FROM scored
      GROUP BY node
      ORDER BY stress DESC, kind, key
      LIMIT 20"""
    })
}
