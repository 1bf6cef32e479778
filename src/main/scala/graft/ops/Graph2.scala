package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel
import Q.t

/** Graph analytics, round 6 (second continuation): community detection by
  * label propagation and common-neighbor link prediction — the two
  * workhorse graph queries this engine had not yet expressed.
  */
object Graph2 {

  def pack: Seq[Q] = Seq(g67LabelProp, g68LinkPred)

  /** Packing constants for the deterministic LPA vote argmax: minimize
    * (MaxCnt − count)·P + label, i.e. "highest count, then lowest label".
    * All operands stay non-negative (Spark `div`/`%` and DuckDB `//`/`%`
    * agree only there), products stay ≤ 2⁵², and the vote building
    * raise_errors LOUDLY if a label ever reaches P or a count MaxCnt
    * rather than silently mis-ranking.
    */
  val LabelPackP = 4294967296L // 2^32 > any parity-encoded node id here
  val MaxCnt = 1048576L        // 2^20 > any per-(node,label) vote count here
  val LpaIters = 3

  /** Synchronous LABEL PROPAGATION over a symmetric (src, dst) edge list:
    * every node starts labeled with its own id; each round it adopts its
    * neighbors' most frequent label (ties → smallest label — the
    * deterministic variant, so both engines and every rerun agree).
    *
    * Scale shape is the [[Graph.pageRank]] loop: edges cached and hash-
    * partitioned on src once, each round shuffles ONLY the O(nodes) label
    * table to the edges (`shuffle_hash` hints — never a per-round
    * broadcast of node state, never a re-shuffle of the edge side), vote
    * counting is a keyed aggregate, the argmax is a second keyed
    * aggregate over one packed integer, and round state is eagerly
    * checkpointed so the loop holds ≤ 2 label tables (identical per-round
    * plans hit the codegen cache — measured faster than lazy round
    * composition, see [[Graph.pageRank]]).
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val ep = e.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val next = lpaRound(ep, labels).localCheckpoint(true)
      Q.releaseBlocks(labels)
      labels = next
    }
    ep.unpersist()
    e.unpersist()
    labels
  }

  /** One LAZY LPA round — exposed for plan-audit specs. */
  def lpaRound(ep: DataFrame, labels: DataFrame): DataFrame = {
    val votes = ep
      .join(labels.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
    votes
      .select(col("dst"),
        when(col("label") >= LabelPackP or col("c") >= MaxCnt,
          raise_error(lit("lpa pack bound exceeded")))
          .otherwise((lit(MaxCnt) - col("c")) * LabelPackP + col("label"))
          .as("packed"))
      .groupBy(col("dst")).agg(min(col("packed")).as("p"))
      .select(col("dst").as("node"), (col("p") % LabelPackP).as("label"))
  }

  /** g67: COMMUNITIES BY LABEL PROPAGATION on the customer↔supplier trade
    * graph (same parity-encoded bipartite edges as g60). Connected
    * components (g61) answer "who is reachable"; LPA's vote dynamics
    * split a component along its DENSE regions — the near-linear-time
    * community baseline. `LpaIters` synchronous rounds, then the label
    * histogram joined back so every node carries its community and the
    * community's size. The oracle replays the identical packed-integer
    * recurrence through unrolled MATERIALIZED CTEs.
    */
  val g67LabelProp: Q = Q(
    "g67_label_prop",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      val labels = labelPropagation(edges, LpaIters)
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("community_size"))
      labels.join(broadcast(sizes), "label")
        .select(
          when(col("node") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          expr("node div 2").as("key"),
          col("label").as("community"), col("community_size"))
        .orderBy(col("kind"), col("key"))
    },
    Some {
      val rounds = (1 to LpaIters).map { i =>
        s"""
      l$i AS MATERIALIZED (
        SELECT dst AS node,
          CAST(min(($MaxCnt - c) * $LabelPackP + label) % $LabelPackP
               AS BIGINT) AS label
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
      sizes AS (
        SELECT label, count(*) AS community_size FROM l$LpaIters GROUP BY 1)
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        node // 2 AS key, label AS community, community_size
      FROM l$LpaIters JOIN sizes USING (label)
      ORDER BY kind, key"""
    })

  /** Hub cap for g68 candidate generation: a customer linked to H
    * suppliers emits H² candidate pairs, so one promiscuous hub would
    * quadratically dominate the pair join at scale. Customers above the
    * cap are excluded from PAIR GENERATION but still count in every
    * supplier's true neighbor-set size — the d41 stop-shingle trade,
    * mirrored exactly in the oracle. At the driver's scales nothing is
    * pruned (max degree 67 at sf0.01).
    */
  val MaxCustDeg = 256

  /** g68: LINK PREDICTION between suppliers — for every supplier pair,
    * common-neighbor evidence over shared customers: common count,
    * Jaccard of customer sets (integer basis points), and Adamic–Adar
    * (Σ 1/ln deg(c) — rare shared customers weigh more than promiscuous
    * ones). The ranked pair list is the "these two will trade next"
    * recommender baseline.
    *
    * Scale shape: candidate pairs come from a CUSTOMER-keyed self-join of
    * the bipartite incidence list — never suppliers × suppliers — with
    * per-customer amplification bounded by [[MaxCustDeg]]². Adamic–Adar
    * terms are ln of INTEGER degrees, decimal-staged so the sum is
    * order-independent, rounded to 6dp (the d52 libm-parity playbook).
    */
  val g68LinkPred: Q = Q(
    "g68_link_pred",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cdeg = cs.groupBy(col("cust")).agg(count(lit(1)).as("cdeg"))
      val sdeg = cs.groupBy(col("supp")).agg(count(lit(1)).as("n"))
      // the AA term is a function of the CUSTOMER alone: stage it once per
      // incidence row (O(|cs|)) so the pair join aggregates a ready column
      // instead of running ln+÷+cast once per PAIR row (O(Σdeg²) — 45×
      // more rows at sf0.1). The 12dp-quantized term is carried as exact
      // integer PICOUNITS and summed as a LONG — the pair aggregate is the
      // O(Σdeg²) hot loop, and a codegen long sum beats a decimal sum
      // several-fold there (measured 5.2→4.0 s at sf0.1). A pair group
      // sums `common` terms of ≤ ⌈1e12/ln 2⌉: the long sum is exact below
      // ~6.4e6 shared customers per pair (overflow bound), and the final
      // long→double cast is the same IEEE value in BOTH engines at any
      // count — cross-engine parity never depends on the 2⁵³ limit; only
      // agreement with the pre-r10 decimal-sum form needs common ≲ 6e3,
      // far above any real supplier pair here (≤ a few hundred).
      // cdeg ≥ 2 both protects the hoisted 1/ln(cdeg) from ln(1)=0 (ANSI
      // divide-by-zero) AND drops rows that could never form a pair — a
      // deg-1 customer has no second supplier to co-occur with
      val inc = cs.join(
        cdeg.filter(col("cdeg") <= MaxCustDeg && col("cdeg") >= 2), "cust")
        .withColumn("aa_pico",
          ((lit(1.0) / log(col("cdeg").cast("double")))
            .cast(DecimalType(18, 12)) * lit(1000000000000L)).cast("long"))
      val pairs = inc.as("a")
        .join(inc.as("b"),
          col("a.cust") === col("b.cust") && col("a.supp") < col("b.supp"))
        .groupBy(col("a.supp").as("s_a"), col("b.supp").as("s_b"))
        .agg(count(lit(1)).as("common"),
          sum(col("a.aa_pico")).as("aa_pico"))
      val out = pairs.filter(col("common") >= 2)
        .join(broadcast(sdeg.withColumnRenamed("supp", "s_a")
          .withColumnRenamed("n", "n_a")), "s_a")
        .join(broadcast(sdeg.withColumnRenamed("supp", "s_b")
          .withColumnRenamed("n", "n_b")), "s_b")
        .select(col("s_a"), col("s_b"), col("common"), col("n_a"), col("n_b"),
          expr("common * 10000 div (n_a + n_b - common)").as("jaccard_bp"),
          round(col("aa_pico").cast("double") / 1e12, 6).as("adamic_adar"))
        .orderBy(col("s_a"), col("s_b"))
      Q.materialized(out, cs)
    },
    Some(s"""
      WITH cs AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      cdeg AS (SELECT cust, count(*) AS cdeg FROM cs GROUP BY 1),
      sdeg AS (SELECT supp, count(*) AS n FROM cs GROUP BY 1),
      inc AS (
        SELECT cs.cust, cs.supp, cdeg.cdeg
        FROM cs JOIN cdeg USING (cust) WHERE cdeg <= $MaxCustDeg),
      pairs AS (
        SELECT a.supp AS s_a, b.supp AS s_b, count(*) AS common,
          CAST(sum(CAST(CAST(1.0 / ln(a.cdeg) AS DECIMAL(18,12))
                        * 1000000000000 AS BIGINT)) AS BIGINT) AS aa_pico
        FROM inc a JOIN inc b ON a.cust = b.cust AND a.supp < b.supp
        GROUP BY 1, 2)
      SELECT s_a, s_b, common, sa.n AS n_a, sb.n AS n_b,
        common * 10000 // (sa.n + sb.n - common) AS jaccard_bp,
        round(CAST(aa_pico AS DOUBLE) / 1e12, 6) AS adamic_adar
      FROM pairs
      JOIN sdeg sa ON sa.supp = s_a
      JOIN sdeg sb ON sb.supp = s_b
      WHERE common >= 2
      ORDER BY s_a, s_b"""))
}
