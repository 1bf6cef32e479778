package graft.ops

import graft.expr.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Vector-compression operators, round 4: product quantization (the
  * IVF-PQ building block every billion-vector ANN index ships) and a
  * Matryoshka-style truncation audit. Companion to e54's scalar int8
  * quantization and the e51/e53 ANN family in [[Similarity]].
  */
object Similarity2 {

  def pack: Seq[Q] = Seq(e57PqCodes, e58MatryoshkaRecall)

  /** Integer grid step for PQ: 512 = 2⁹, so float×512 is an EXACT double
    * product and reconstruction divides by the exact power-of-two 2²⁴ —
    * the whole pipeline is integer arithmetic with zero cross-engine ulp
    * surface (both engines round .5 away from zero; see e54).
    */
  private val Grid = 512L
  private val M = 8       // subspaces
  private val SubDim = 8  // dims per subspace (8×8 = the 64-dim embedding)
  private val K = 16      // centroids per subspace

  /** e57: product-quantization encode + reconstruction audit. Each vector
    * is snapped to a 1/512 integer grid, split into M=8 subvectors of 8
    * dims, and each subvector is assigned its nearest of K=16 codebook
    * centroids by squared L2 — emitting the 8 code bytes plus the exact
    * reconstruction MSE. The codebook is the (deterministic) first-K
    * vectors' subvectors — a real index would Lloyd-train it (e56 is that
    * step); the ENCODE dataflow is identical either way.
    *
    * The argmin is computed as `min(dist·K + cid)` — distances are
    * integers, so the pack is exact and ties break to the lowest centroid
    * id in both engines with no argmin/arg_min tie-break semantics in
    * play. Scale shape: codebook is O(M·K) and broadcast; the encode is
    * one narrow pass (corpus × K candidate rows per subspace, map-side
    * min) — corpus never shuffles; output is O(corpus) code rows.
    */
  /** The e57 transform over any (vec_id, embedding) frame — exposed for
    * planted-corpus specs.
    */
  def pqCodes(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val qv = Q.spread(emb, "vec_id")
      .select(col("vec_id"),
        // interpreted HOF, but O(64) per row ONCE, ahead of the join fan-out
        transform(col("embedding"),
          x => round(x.cast("double") * Grid).cast("long")).as("qv"))
    val cents = qv.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("qv").as("qc"))
    val joined = qv.crossJoin(broadcast(cents))
    val packAggs = (0 until M).map { m =>
      // flat codegen 8-term integer sum per subspace — no HOF in the hot path
      val dist = (0 until SubDim).map { j =>
        val i = m * SubDim + j + 1 // element_at is 1-based
        val d = element_at(col("qv"), i) - element_at(col("qc"), i)
        d * d
      }.reduce(_ + _)
      min(dist * lit(K.toLong) + col("cid")).as(s"p$m")
    }
    val packs = joined.groupBy(col("vec_id"))
      .agg(packAggs.head, packAggs.tail: _*)
    val codeCols = (0 until M).map(m =>
      (col(s"p$m") % K).cast("int").as(s"code$m"))
    val distTotal = (0 until M).map(m => expr(s"p$m div $K")).reduce(_ + _)
    packs.select(col("vec_id") +: codeCols :+
        (distTotal.cast("double") /
          lit((M * SubDim * Grid * Grid).toDouble)).as("mse"): _*)
      .orderBy(col("vec_id"))
  }

  val e57PqCodes: Q = Q(
    "e57_pq_codes",
    (s, dir) => pqCodes(t(s, dir, "embeddings")),
    Some {
      val dists = (0 until M).map { m =>
        val terms = (0 until SubDim).map { j =>
          val i = m * SubDim + j + 1
          s"(v.qv[$i]-c.qc[$i])*(v.qv[$i]-c.qc[$i])"
        }.mkString(" + ")
        s"($terms) AS d$m"
      }.mkString(",\n          ")
      val packMins = (0 until M)
        .map(m => s"min(d$m*$K+cid) AS p$m").mkString(", ")
      val codes = (0 until M)
        .map(m => s"CAST(p$m % $K AS INT) AS code$m").mkString(", ")
      val distSum = (0 until M).map(m => s"(p$m // $K)").mkString(" + ")
      s"""
      WITH qv AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS qv
        FROM embeddings),
      cents AS (SELECT vec_id AS cid, qv AS qc FROM qv WHERE vec_id < $K),
      dist AS (
        SELECT v.vec_id, c.cid,
          $dists
        FROM qv v CROSS JOIN cents c),
      packs AS (SELECT vec_id, $packMins FROM dist GROUP BY vec_id)
      SELECT vec_id, $codes,
        CAST($distSum AS DOUBLE) / ${M * SubDim * Grid * Grid}.0 AS mse
      FROM packs ORDER BY vec_id"""
    })

  /** e58: Matryoshka truncation audit — score the corpus by full-width
    * cosine AND by the first-16-dims truncated cosine in ONE pass, rank
    * both, and report per-query top-10 overlap (recall@10) plus whether
    * the top-1 survives. The question a Matryoshka/dimension-truncation
    * deployment asks before shipping the cheap prefix index. No oracle
    * (rank-overlap of engine-native doubles); `SketchAuditSpec` pins the
    * recall floor. Both scorings ride the same narrow corpus scan — the
    * window shuffles only (qid, cid, two doubles).
    */
  /** The e58 transform over any (vec_id, embedding) frame (queries =
    * vec_id < 5, corpus = rest, like e50) — exposed for planted-corpus
    * specs. Caller must GraftFunctions.register the session.
    */
  def matryoshkaRecall(emb: org.apache.spark.sql.DataFrame,
      truncDim: Int): org.apache.spark.sql.DataFrame = {
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cos_full"),
          Similarity.cosNative(
            slice(col("qv"), 1, truncDim), slice(col("cv"), 1, truncDim))
            .as("cos_trunc"))
      val wF = Window.partitionBy(col("qid"))
        .orderBy(col("cos_full").desc, col("cid"))
      val wT = Window.partitionBy(col("qid"))
        .orderBy(col("cos_trunc").desc, col("cid"))
      scored
        .withColumn("rf", row_number().over(wF))
        .withColumn("rt", row_number().over(wT))
        .filter(col("rf") <= 10 || col("rt") <= 10)
        .groupBy(col("qid"))
        .agg(
          // rows with rf ≤ 10 count least(10, corpus size) exactly — the
          // honest recall denominator when the corpus is smaller than k
          sum(when(col("rf") <= 10, 1).otherwise(0)).cast("long").as("n_topk"),
          sum(when(col("rf") <= 10 && col("rt") <= 10, 1).otherwise(0))
            .cast("long").as("n_overlap"),
          max(when(col("rf") === 1, col("cid"))).as("top1_full"),
          max(when(col("rt") === 1, col("cid"))).as("top1_trunc"))
        .select(col("qid"), col("n_topk"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_topk").cast("double"))
            .as("recall_at_10"),
          (col("top1_full") === col("top1_trunc")).as("top1_match"))
        .orderBy(col("qid"))
  }

  val e58MatryoshkaRecall: Q = Q(
    "e58_matryoshka_recall",
    (s, dir) => {
      GraftFunctions.register(s)
      matryoshkaRecall(t(s, dir, "embeddings"), truncDim = 16)
    },
    None)
}
