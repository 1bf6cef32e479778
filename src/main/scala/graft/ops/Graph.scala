package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** Graph analytics over relationship edges derived from the relational
  * tables — the companion to [[Clustering]]'s connected components: d46
  * answers "which nodes form one group", PageRank answers "which nodes
  * matter". The iterative shape is the same GraphX-style join+aggregate
  * loop, driver-controlled but with all data distributed.
  */
object Graph {

  def pack: Seq[Q] = Seq(g60PageRank)

  /** Fixed-point scale for integer PageRank: every rank is a BIGINT in
    * units of 10⁻¹², and every step (damping multiply, out-degree divide)
    * is integer arithmetic — Spark's `div` and DuckDB's `//` agree on all
    * positive operands, so a 5-iteration rank vector compares bit-exact
    * across engines with zero float/ulp surface. 85·r stays ≤ 8.5×10¹³,
    * far inside BIGINT.
    */
  val Scale = 1000000000000L
  val Iters = 5

  /** Integer-scaled PageRank over a symmetric (src, dst) edge list:
    * r₀(v) = SCALE÷N, then `Iters` rounds of
    * r'(v) = (15·SCALE÷100)÷N + Σ_{u→v} (85·r(u)÷100)÷deg(u)
    * (all ÷ integer). The graph is undirected (edges appear both ways), so
    * every node has out-degree ≥ 1 and no dangling-mass term is needed.
    *
    * Scale design: degrees are joined to the edge list ONCE outside the
    * loop, and that cached edge table is ALREADY hash-partitioned on
    * `src` (its build join shuffled it there) — so each round's
    * edges ⋈ ranks is a shuffled-hash join that moves ONLY the O(nodes)
    * rank table to the edges, never the O(edges) big side and never a
    * per-round O(nodes) broadcast (which OOMs executors once the node
    * set outgrows broadcast size). The `shuffle_hash` hints also keep the
    * cached edge partitions from being re-sorted every round. Round state
    * is eagerly localCheckpoint'ed (flat plans, see [[Clustering]]) and
    * superseded rounds are released, so the loop holds ≤ 2 rank tables.
    * The only broadcast anywhere is the one-row node count; a FIXED
    * iteration count means no per-round driver action beyond the
    * checkpoint itself. On a real cluster swap `checkpoint()` for durable
    * lineage cuts.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val (e, deg, ew, ncnt) = edgeState(edges)
    var ranks = deg.crossJoin(broadcast(ncnt))
      .select(col("src").as("node"), expr(s"$Scale div n").as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val next = round(ew, deg, ncnt, ranks).localCheckpoint(true)
      Q.releaseBlocks(ranks)
      ranks = next
    }
    ew.unpersist()
    deg.unpersist()
    e.unpersist()
    ranks
  }

  /** Immutable loop state shared by [[pageRank]] and the plan-audit spec:
    * cached edges, cached out-degrees, the degree-joined edge table
    * EXPLICITLY hash-partitioned on `src` before caching (its build join
    * may broadcast the degree side, which would otherwise leave the cache
    * with the raw input's partitioning and force a per-round exchange of
    * the O(edges) side), and the one-row node count.
    */
  def edgeState(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ew = e.join(deg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ncnt = deg.agg(count(lit(1)).as("n"))
    (e, deg, ew, ncnt)
  }

  /** One LAZY power-iteration round over the prepared loop state —
    * exposed so [[graft.ops]] specs can assert the per-round plan shape:
    * the cached `ew` feeds its join with no exchange above it, and the
    * only broadcast in the round is the one-row node count.
    */
  def round(ew: DataFrame, deg: DataFrame, ncnt: DataFrame,
      ranks: DataFrame): DataFrame = {
    // build the hash map on the rank side (O(nodes) rows of (key, long));
    // the stream side is the cached hash(src)-partitioned edge table
    val contribs = ew
      .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
      .select(col("dst"), expr("((85 * r) div 100) div deg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    deg.crossJoin(broadcast(ncnt))
      .join(contribs.hint("shuffle_hash"), col("src") === col("dst"), "left")
      .select(col("src").as("node"),
        (expr(s"((15 * $Scale) div 100) div n") +
          coalesce(col("s"), lit(0L))).as("r"))
  }

  private def iterSql(i: Int): String = s"""
      r$i AS (
        SELECT d.src AS node,
          ((15 * $Scale) // 100) // (SELECT n FROM n) +
            coalesce(CAST(c.s AS BIGINT), 0) AS r
        FROM deg d LEFT JOIN (
          SELECT e.dst, sum(((85 * p.r) // 100) // dg.deg) AS s
          FROM edges e JOIN r${i - 1} p ON e.src = p.node
            JOIN deg dg ON e.src = dg.src
          GROUP BY e.dst) c ON d.src = c.dst)"""

  /** g60: PageRank over the customer↔supplier trade graph (an edge per
    * distinct customer–supplier pair that shares an order line; node ids
    * parity-encoded — even=customer 2k, odd=supplier 2k+1 — so one id
    * space carries both sides collision-free). High-rank suppliers are the
    * ones central to many well-connected customers — the influence query
    * every marketplace/fraud team runs. The oracle replays the identical
    * integer recurrence through `Iters` unrolled CTEs.
    */
  val g60PageRank: Q = Q(
    "g60_pagerank",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      pageRank(edges, Iters)
        .select(
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          expr("node div 2").as("key"),
          col("r").as("rank_scaled"))
        .orderBy(col("kind"), col("key"))
    },
    Some(s"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL SELECT s, c FROM pairs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      n AS (SELECT count(*) AS n FROM deg),
      r0 AS (SELECT src AS node, $Scale // (SELECT n FROM n) AS r FROM deg),
      ${(1 to Iters).map(iterSql).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
          AS kind,
        node // 2 AS key, r AS rank_scaled
      FROM r$Iters ORDER BY kind, key"""))
}
