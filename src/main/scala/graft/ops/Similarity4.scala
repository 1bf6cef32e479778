package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions
import Q.t

/** Vector-search additions, round 6 (second continuation): NN-Descent
  * kNN-graph refinement and MMR-diversified retrieval — the graph-ANN
  * construction step and the post-retrieval diversification step of a
  * production vector pipeline.
  */
object Similarity4 {

  def pack: Seq[Q] = Seq(e73NnDescent, e74MmrSelect)

  private val K0 = 4 // initial neighbors per node (the "random init" stand-in)
  private val K = 4  // neighbors kept after the refinement round

  /** e73: one NN-DESCENT ROUND (Dong et al. 2011) — the local-join
    * refinement that builds kNN graphs for graph-ANN indexes (HNSW/NSG
    * construction at corpus scale). Start from a deterministic stand-in
    * for the random initial graph (each node linked to the next K0 ids
    * mod N), then apply the NN-descent induction: a node's improved
    * neighbors hide among its NEIGHBORS' NEIGHBORS. Candidates = for each
    * pivot w, all ordered pairs of w's (in- or out-) neighbors, union the
    * initial edges; score every candidate pair by cosine; keep each
    * node's top-K.
    *
    * Scale shape: the local join is keyed by PIVOT — per-pivot
    * amplification is structurally ≤ (2K0)², never corpus-quadratic —
    * and candidate scoring joins vectors by key on BOTH sides (no
    * corpus-wide broadcast). Bulk scoring is the native codegen cosine;
    * the exact-decimal scorer re-touches only rank-boundary survivors
    * (the e50 two-pass), so the oracle compares bit-exact.
    */
  val e73NnDescent: Q = Q(
    "e73_nn_descent",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val n1 = emb.agg(count(lit(1)).as("n"))
      val offs = s.range(1, K0 + 1).toDF("d")
      val g0 = Q.spread(emb.select(col("vec_id")), "vec_id")
        .crossJoin(broadcast(offs)).crossJoin(broadcast(n1))
        .select(col("vec_id").as("src"),
          pmod(col("vec_id") + col("d"), col("n")).as("dst"))
      val base = g0.unionAll(g0.select(col("dst").as("src"), col("src").as("dst")))
      val cands = base.as("a")
        .join(base.as("b"),
          col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
        .select(col("a.dst").as("src"), col("b.dst").as("dst"))
        .unionAll(base)
        .distinct()
      val sv = emb.select(col("vec_id").as("src"), col("embedding").as("svec"))
      val dv = emb.select(col("vec_id").as("dst"), col("embedding").as("dvec"))
      val fast = cands.join(sv, "src").join(dv, "dst")
        .select(col("src").as("qid"), col("dst").as("cid"),
          Similarity.cosNative(col("svec"), col("dvec")).as("cosf"))
      // exactRerank's math, but with KEYED vector joins on the survivor
      // rescore (its broadcast(queries) assumes few queries; here every
      // node is a query, so both lookup sides must shuffle-join)
      val wOrd = Window.partitionBy(col("qid")).orderBy(col("cosf").desc, col("cid"))
      val wAll = Window.partitionBy(col("qid"))
      val surv = fast
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("kth", max(when(col("rk") === K, col("cosf"))).over(wAll))
        .filter(col("rk") <= K || col("cosf") >= col("kth") - Similarity.Eps)
        .select(col("qid"), col("cid"))
      val exact = surv
        .join(sv.withColumnRenamed("src", "qid"), "qid")
        .join(dv.withColumnRenamed("dst", "cid"), "cid")
        .select(col("qid"), col("cid"),
          Similarity.cosExact(col("svec"), col("dvec")).as("cos"))
      Similarity.rankTopK(exact, K)
    },
    Some(s"""
      WITH n AS (SELECT count(*) AS n FROM embeddings),
      g0 AS MATERIALIZED (
        SELECT vec_id AS src, (vec_id + d) % (SELECT n FROM n) AS dst
        FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${K0 + 1})) AS d) ds),
      base AS MATERIALIZED (
        SELECT src, dst FROM g0 UNION ALL SELECT dst, src FROM g0),
      cands AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT a.dst AS src, b.dst AS dst
          FROM base a JOIN base b ON a.src = b.src AND a.dst <> b.dst
          UNION ALL SELECT src, dst FROM base) u),
      vn AS (
        SELECT vec_id,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
                            AS DECIMAL(20,15))) AS DOUBLE)) AS nrm
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id),
      dots AS (
        SELECT src AS qid, dst AS cid,
          CAST(sum(CAST(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE)
                        AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT c.src, c.dst,
                unnest(ea.embedding) AS xa, unnest(eb.embedding) AS xb
              FROM cands c
              JOIN embeddings ea ON ea.vec_id = c.src
              JOIN embeddings eb ON eb.vec_id = c.dst) p
        GROUP BY src, dst)
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM (
        SELECT d.qid, d.cid, d.dot/(na.nrm*nb.nrm) AS cos,
          CAST(row_number() OVER (PARTITION BY d.qid
                 ORDER BY d.dot/(na.nrm*nb.nrm) DESC, d.cid) AS INT) AS rank
        FROM dots d
        JOIN vn na ON na.vec_id = d.qid
        JOIN vn nb ON nb.vec_id = d.cid) t
      WHERE rank <= $K ORDER BY qid, rank"""))

  private val C = 10       // candidate pool per query fed to the MMR stage
  private val Picks = 5    // results selected per query
  private val P = 4294967296L // 2^32 argmin pack factor (> any vec_id here)

  /** e74: MAXIMAL MARGINAL RELEVANCE — greedy diversified top-k: each
    * round picks the candidate maximizing 2·rel − max-sim-to-selected
    * (λ=2/3 in MMR terms), so near-duplicate results can't crowd the
    * list. This is the post-retrieval diversification stage of every
    * RAG/search stack (Carbonell & Goldstein 1998).
    *
    * Scale shape: the DISTRIBUTED work is the e50 retrieval producing C
    * candidates per query plus one C²-per-query pairwise-similarity
    * table; the greedy loop then runs `Picks` fixed rounds over frames
    * bounded by #queries·C rows — never corpus-sized. All selection
    * arithmetic is integer (cosines on the 6dp grid → µ-units, packed
    * argmax with min-id tie-break), so both engines pick identical sets;
    * the oracle replays the loop through unrolled MATERIALIZED CTEs.
    */
  val e74MmrSelect: Q = Q(
    "e74_mmr_select",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
      val cand = Similarity.exactRerank(fast, q, c, k = C)
        .select(col("qid"), col("cid"),
          round(col("cos") * 1000000).cast("long").as("rel"))
      val cvv = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val cc = cand.select(col("qid"), col("cid")).join(cvv, "cid")
      val sims = cc.as("a")
        .join(cc.as("b"),
          col("a.qid") === col("b.qid") && col("a.cid") =!= col("b.cid"))
        .select(col("a.qid").as("qid"), col("a.cid").as("a"),
          col("b.cid").as("b"),
          round(Similarity.cosExact(col("a.cv"), col("b.cv")) * 1000000)
            .cast("long").as("sim"))
        .localCheckpoint(true)
      val candM = cand.localCheckpoint(true)
      var sel: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to Picks) {
        val rem =
          if (sel == null) candM
          else candM.join(sel.select(col("qid"), col("cid")),
            Seq("qid", "cid"), "left_anti")
        val withM =
          if (sel == null) rem.withColumn("msim", lit(0L))
          else rem.join(
            sims.join(sel.select(col("qid"), col("cid").as("b")), Seq("qid", "b"))
              .groupBy(col("qid"), col("a").as("cid"))
              .agg(max(col("sim")).as("msim")),
            Seq("qid", "cid"), "left").na.fill(0L, Seq("msim"))
        val pick = withM
          .select(col("qid"),
            ((lit(6000001L) - (col("rel") * 2 - col("msim"))) * P + col("cid"))
              .as("packed"))
          .groupBy(col("qid")).agg(min(col("packed")).as("p"))
          .select(col("qid"), (col("p") % P).as("cid"),
            lit(r).as("pick"))
        sel = if (sel == null) pick else sel.unionAll(pick)
      }
      val out = sel.join(candM, Seq("qid", "cid"))
        .select(col("qid"), col("pick"), col("cid"), col("rel").as("rel_u"))
        .orderBy(col("qid"), col("pick"))
      Q.materialized(out, sims, candM)
    },
    Some {
      val rounds = (1 to Picks).map { r =>
        val prev = if (r == 1) "sel0" else s"sel${r - 1}"
        s"""
      p$r AS MATERIALIZED (
        SELECT qid,
          CAST(min((6000001 - (2*rel - msim)) * $P + cid) % $P AS BIGINT)
            AS cid
        FROM (
          SELECT cd.qid, cd.cid, cd.rel, coalesce(m.msim, 0) AS msim
          FROM cand cd
          LEFT JOIN (
            SELECT s.qid, s.a, max(s.sim) AS msim
            FROM sims s JOIN $prev p ON s.qid = p.qid AND s.b = p.cid
            GROUP BY s.qid, s.a) m ON m.qid = cd.qid AND m.a = cd.cid
          WHERE NOT EXISTS (SELECT 1 FROM $prev p
                            WHERE p.qid = cd.qid AND p.cid = cd.cid)) t
        GROUP BY qid),
      sel$r AS MATERIALIZED (
        SELECT qid, cid, $r AS pick FROM p$r
        UNION ALL SELECT qid, cid, pick FROM $prev)"""
      }.mkString(",")
      s"""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 5),
      qn AS (
        SELECT qid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS qnorm
        FROM (SELECT qid, unnest(qv) AS x FROM q) t GROUP BY qid),
      cn AS (
        SELECT cid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS cnorm
        FROM (SELECT cid, unnest(cv) AS x FROM c) t GROUP BY cid),
      dots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid),
      cand AS MATERIALIZED (
        SELECT qid, cid,
          CAST(round(round(cos, 6) * 1000000) AS BIGINT) AS rel
        FROM (
          SELECT d.qid, d.cid, d.dot/(qn.qnorm*cn.cnorm) AS cos,
            row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS rank
          FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= $C),
      cpairs AS (
        SELECT a.qid, a.cid AS a, b.cid AS b
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid),
      pdots AS (
        SELECT qid, a, b,
          CAST(sum(CAST(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT p.qid, p.a, p.b,
                unnest(ea.embedding) AS xa, unnest(eb.embedding) AS xb
              FROM cpairs p
              JOIN embeddings ea ON ea.vec_id = p.a
              JOIN embeddings eb ON eb.vec_id = p.b) t
        GROUP BY qid, a, b),
      sims AS MATERIALIZED (
        SELECT p.qid, p.a, p.b,
          CAST(round(p.dot/(na.cnorm*nb.cnorm) * 1000000) AS BIGINT) AS sim
        FROM pdots p
        JOIN cn na ON na.cid = p.a
        JOIN cn nb ON nb.cid = p.b),
      sel0 AS (SELECT qid, cid, 0 AS pick FROM cand WHERE false),$rounds
      SELECT s.qid, s.pick, s.cid, cd.rel AS rel_u
      FROM sel$Picks s JOIN cand cd ON s.qid = cd.qid AND s.cid = cd.cid
      ORDER BY s.qid, s.pick"""
    })
}
