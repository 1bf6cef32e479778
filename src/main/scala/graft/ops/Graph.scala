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

  def pack: Seq[Q] = Seq(g60PageRank, g61CcStar)

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

  // ------------------------------------------- star-contraction components

  /** Connected components by ALTERNATING STAR CONTRACTION — the two-phase
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SoCC 2014). Where [[Clustering]]'s
    * min-label propagation (d46) needs O(diameter) rounds and carries a
    * separate O(nodes) label table through every round, star contraction
    * rewrites the EDGE SET ITSELF and converges in O(log n) rounds on any
    * topology — long chains included — with per-round state that only
    * shrinks. Each round is two keyed aggregates + two keyed joins; no
    * broadcasts, no global structures, nothing proportional to a component.
    * That is the 100 TB CC shape: a trillion-edge graph never holds more
    * than the (monotonically collapsing) edge list, hash-partitioned.
    *
    *  - large-star(u): m = min(Γ(u) ∪ u); connect every neighbor v > u
    *    to m. (Big neighbors hop toward the local minimum.)
    *  - small-star(u): over edges kept as canonical (big=a, small=b)
    *    pairs, per node a: m = min of its smaller neighbors; connect a and
    *    each of those neighbors to m.
    *
    * Fixpoints are exactly star forests (every node linked directly to its
    * component minimum), so the converged edge set IS the answer. Returns
    * (labels, rounds); labels = (node, lbl=component min) for every node
    * that appears in any input pair.
    */
  def ccStarContraction(pairs: DataFrame, maxIters: Int = 30)
      : (DataFrame, Int) = {
    var cur = pairs
      .select(greatest(col("d1"), col("d2")).as("a"),
        least(col("d1"), col("d2")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var curCount = cur.count()
    var stable = false
    var iter = 0
    while (!stable && iter < maxIters) {
      // large-star over the symmetric view; v > u ≥ m, so (v, m) is
      // already canonical (bigger first)
      val sym = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")).distinct()
        .localCheckpoint(true)
      // small-star on the canonical (a > b) large-star output: per a,
      // m = min(smaller neighbors); re-link a and each smaller neighbor
      // to m. b = m self-links drop; (b, m) needs re-canonicalizing
      // (two smaller neighbors are not ordered relative to each other).
      val minsS = ls.groupBy(col("a")).agg(min(col("b")).as("m"))
      val next = ls.join(minsS, "a")
        .select(col("b").as("n"), col("m"))
        .unionAll(minsS.select(col("a").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("a"),
          least(col("n"), col("m")).as("b"))
        .distinct()
        .localCheckpoint(true)
      // set equality: both sides are distinct, so equal counts + empty
      // one-way except ⇒ identical edge sets (two narrow keyed passes;
      // at warehouse scale swap in a count + order-free checksum compare)
      val nextCount = next.count()
      stable = nextCount == curCount && next.except(cur).isEmpty
      Q.releaseBlocks(cur)
      Q.releaseBlocks(ls)
      cur = next
      curCount = nextCount
      iter += 1
    }
    require(stable,
      s"star contraction did not converge within $maxIters rounds — " +
        "raise maxIters (expected O(log n) rounds)")
    // converged star forest: children label with their root; roots (never
    // on the big side) label themselves
    val childLabels = cur.groupBy(col("a")).agg(min(col("b")).as("lbl"))
      .select(col("a").as("node"), col("lbl"))
    val rootLabels = cur.select(col("b")).except(cur.select(col("a")))
      .select(col("b").as("node"), col("b").as("lbl"))
    (childLabels.unionAll(rootLabels), iter)
  }

  /** g61: the d46 clustering deliverable — near-dup pairs → components →
    * min-id representative election — recomputed through star contraction
    * instead of label propagation. Same edge semantics (the d41 shingle
    * pairs) and same output contract, so the d46 recursive-CTE oracle pins
    * this algorithm's correctness too: two independent distributed CC
    * implementations against one engine-independent fixpoint definition.
    */
  val g61CcStar: Q = Q(
    "g61_cc_starcontract",
    (s, dir) => {
      val pairs = Dedup.d41ShingleJaccard.run(s, dir)
        .select(col("d1"), col("d2"))
      val (cc, _) = ccStarContraction(pairs)
      Q.releaseBlocks(pairs)
      cc.select(col("node").as("doc_id"), col("lbl").as("cluster"),
          (col("node") === col("lbl")).as("is_kept"))
        .orderBy(col("doc_id"))
    },
    Clustering.d46DedupClusters.oracle)
}
