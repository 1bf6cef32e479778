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

  def pack: Seq[Q] =
    Seq(e57PqCodes, e58MatryoshkaRecall, e59HammingTopK, e59bHammingRecall,
      e63MatryoshkaGrid, e64AsymmetricTopK, e66FilteredTopK, e67RrfFusion)

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

  /** e63: the e58 Matryoshka truncation audit made HASH-ORACLED — both
    * rankings run on the 1/512 integer grid (full-width integer L2 vs
    * first-16-dims integer L2), so the per-query overlap and top-1
    * survival are pure-integer claims the driver pins bit-exact, where e58
    * (engine-native double cosine) is rows-only. The e59b pattern applied
    * to the dimension-truncation family: the ACCURACY of the cheap prefix
    * index is what the oracle checks. One broadcast-queries corpus pass
    * scores both widths; the windows shuffle only (qid, cid, two BIGINTs).
    */
  val e63MatryoshkaGrid: Q = {
    val truncDim = 16
    def l2(n: Int) = (1 to n).map { i =>
      val d = element_at(col("qv"), i) - element_at(col("cv"), i)
      d * d
    }.reduce(_ + _)
    def sqlL2(n: Int) =
      (1 to n).map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])").mkString("+")
    Q(
      "e63_matryoshka_grid",
      (s, dir) => {
        val gv = Q.spread(t(s, dir, "embeddings"), "vec_id")
          .select(col("vec_id"),
            transform(col("embedding"),
              x => round(x.cast("double") * Grid).cast("long")).as("gv"))
        val q = gv.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("gv").as("qv"))
        val c = gv.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("gv").as("cv"))
        val scored = c.crossJoin(broadcast(q))
          .select(col("qid"), col("cid"),
            l2(64).as("df"), l2(truncDim).as("dt"))
        val wF = Window.partitionBy(col("qid")).orderBy(col("df"), col("cid"))
        val wT = Window.partitionBy(col("qid")).orderBy(col("dt"), col("cid"))
        scored
          .withColumn("rf", row_number().over(wF))
          .withColumn("rt", row_number().over(wT))
          .filter(col("rf") <= 10 || col("rt") <= 10)
          .groupBy(col("qid"))
          .agg(
            sum(when(col("rf") <= 10, 1).otherwise(0)).cast("long").as("n_topk"),
            sum(when(col("rf") <= 10 && col("rt") <= 10, 1).otherwise(0))
              .cast("long").as("n_overlap"),
            max(when(col("rf") === 1, col("cid"))).as("top1_full"),
            max(when(col("rt") === 1, col("cid"))).as("top1_trunc"))
          .select(col("qid"), col("n_topk"), col("n_overlap"),
            round(col("n_overlap").cast("double") /
              col("n_topk").cast("double"), 6).as("recall_at_10"),
            col("top1_full"), col("top1_trunc"),
            (col("top1_full") === col("top1_trunc")).as("top1_match"))
          .orderBy(col("qid"))
      },
      Some(s"""
      WITH gv AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, gv AS qv FROM gv WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, gv AS cv FROM gv WHERE vec_id >= 5),
      scored AS (
        SELECT qid, cid, ${sqlL2(64)} AS df, ${sqlL2(truncDim)} AS dt
        FROM c CROSS JOIN q),
      ranked AS (
        SELECT qid, cid,
          row_number() OVER (PARTITION BY qid ORDER BY df, cid) AS rf,
          row_number() OVER (PARTITION BY qid ORDER BY dt, cid) AS rt
        FROM scored)
      SELECT qid,
        CAST(sum(CASE WHEN rf <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_topk,
        CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_overlap,
        round(CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END)
            AS DOUBLE) / sum(CASE WHEN rf <= 10 THEN 1 ELSE 0 END), 6)
          AS recall_at_10,
        max(CASE WHEN rf = 1 THEN cid END) AS top1_full,
        max(CASE WHEN rt = 1 THEN cid END) AS top1_trunc,
        max(CASE WHEN rf = 1 THEN cid END) = max(CASE WHEN rt = 1 THEN cid END)
          AS top1_match
      FROM ranked WHERE rf <= 10 OR rt <= 10
      GROUP BY qid ORDER BY qid"""))
  }

  /** e66: FILTERED vector search — top-k nearest neighbors constrained to
    * candidates sharing the query's `label` (the attribute-constrained
    * search every vector store ships: "nearest items in MY category").
    * The constraint is PRE-FILTER, pushed into candidate generation: the
    * corpus joins the broadcast query set ON the attribute, so scoring
    * touches only the label's slice — a query never pays the unfiltered
    * corpus and recall within the slice is exact, where post-filtering a
    * global top-k would return fewer than k (or miss entirely) for rare
    * labels. Integer-grid L2 end to end, hash-oracled; `GridLshSpec`
    * asserts the plan is a hash join on label, not a filtered cross join.
    */
  val e66FilteredTopK: Q = {
    def sqlL2 =
      (1 to 64).map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])").mkString("+")
    Q(
      "e66_filtered_topk",
      (s, dir) => filteredTopK(t(s, dir, "embeddings"), k = 10),
      Some(s"""
      WITH gv AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, label, gv AS qv FROM gv WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, label, gv AS cv FROM gv WHERE vec_id >= 5),
      scored AS (
        SELECT q.qid, q.label, c.cid, $sqlL2 AS dist
        FROM c JOIN q ON c.label = q.label)
      SELECT qid, label, cid, dist, rank FROM (
        SELECT qid, label, cid, dist,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY dist, cid) AS INT) AS rank
        FROM scored) t
      WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  /** The e66 transform over any (vec_id, label, embedding) frame —
    * exposed LAZY for the plan-audit spec.
    */
  def filteredTopK(emb: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val gv = Q.spread(emb, "vec_id")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * Grid).cast("long")).as("gv"))
    val q = gv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label"), col("gv").as("qv"))
    val c = gv.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("label"), col("gv").as("cv"))
    val dist = (1 to 64).map { i =>
      val d = element_at(col("qv"), i) - element_at(col("cv"), i)
      d * d
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    c.join(broadcast(q), "label")
      .select(col("qid"), col("label"), col("cid"), dist.as("dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** Sign-bit binary quantization of the 64-dim embedding: two 32-bit
    * halves packed into BIGINTs (never bit 63 — a set sign bit would make
    * the packed word negative and its SUM overflow-prone; two halves keep
    * every intermediate comfortably positive in both engines). The pack is
    * a flat 64-term codegen sum — no HOF, no shuffle, one narrow pass.
    */
  private val HalfBits = 32

  /** (id, w0, w1) sign-bit words for any (idCol named `id`, `embedding`)
    * projection.
    */
  private def signHalf(offset: Int) = (0 until HalfBits)
    .map(i => when(element_at(col("embedding"), offset + i + 1) >= 0,
      lit(1L << i)).otherwise(lit(0L)))
    .reduce(_ + _)

  def signWords(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.select(col("vec_id"), signHalf(0).as("w0"), signHalf(HalfBits).as("w1"))

  private def sqlSignWords(alias: String): String = {
    def half(offset: Int) = (0 until HalfBits)
      .map(i => s"CASE WHEN embedding[${offset + i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"SELECT vec_id, CAST(${half(0)} AS BIGINT) AS w0, " +
      s"CAST(${half(HalfBits)} AS BIGINT) AS w1 FROM $alias"
  }

  /** Spark-side Hamming distance between two packed (w0, w1) pairs. */
  private def hamming(a0: org.apache.spark.sql.Column, a1: org.apache.spark.sql.Column,
      b0: org.apache.spark.sql.Column, b1: org.apache.spark.sql.Column) =
    (bit_count(a0.bitwiseXOR(b0)) + bit_count(a1.bitwiseXOR(b1))).cast("int")

  /** e59: binary-quantized (sign-bit) Hamming top-k — the 64×-compression
    * ANN path every billion-vector index ships as its first-stage filter:
    * a 64-dim float vector becomes 64 BITS, and candidate scoring is two
    * XOR+popcount instructions. Queries are vec_id < 5 (mirroring e50), the
    * corpus is everything else; ties break on candidate id. Everything is
    * integer, so the oracle compare is exact with zero float surface.
    *
    * Scale shape: the packed corpus is a narrow (id, 16 bytes) table — the
    * index for 10⁹ vectors fits in ~16 GB where the float corpus is 256 GB;
    * queries broadcast, the corpus never shuffles, and the per-query scan
    * is map-side top-k through the rank window exactly like e50.
    */
  /** The e59 transform over any (vec_id, embedding) frame (queries =
    * vec_id < 5, corpus = rest, like e50) — exposed for planted-corpus
    * specs.
    */
  def hammingTopK(emb: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val bits = signWords(Q.spread(emb, "vec_id"))
    val q = bits.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
    val c = bits.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("w0").as("cw0"), col("w1").as("cw1"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        hamming(col("qw0"), col("qw1"), col("cw0"), col("cw1")).as("hamming"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  val e59HammingTopK: Q = Q(
    "e59_hamming_topk",
    (s, dir) => hammingTopK(t(s, dir, "embeddings"), k = 10),
    Some(s"""
      WITH bits AS (${sqlSignWords("embeddings")}),
      q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM bits WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, w0 AS cw0, w1 AS cw1 FROM bits WHERE vec_id >= 5)
      SELECT qid, cid, hamming, rank FROM (
        SELECT qid, cid,
          CAST(bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)) AS INT)
            AS hamming,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)), cid)
            AS INT) AS rank
        FROM c CROSS JOIN q) t
      WHERE rank <= 10 ORDER BY qid, rank"""))

  /** e64: ASYMMETRIC binary search over the e59 sign-bit index — the
    * corpus stays 64 bits/vector (two packed BIGINT words, 16 bytes), but
    * the QUERY keeps full precision and scores against each candidate's
    * ±1 sign pattern: score = Σᵢ qᵢ·(2·bitᵢ−1), unpacked per-bit by
    * shift/mask straight from the stored words. Asymmetric distance
    * computation is the standard recall-per-byte upgrade over symmetric
    * Hamming (quantizing only ONE side halves the quantization error —
    * the same argument ADC makes for PQ in e60): e59 collapses query
    * magnitudes to signs, e64 weights each agreeing/disagreeing dimension
    * by how much the query actually cares. Grid queries × integer signs →
    * all-BIGINT scores, hash-oracled; same narrow scale shape as e59 (the
    * 16-byte index scans, queries broadcast, map-side top-k).
    */
  val e64AsymmetricTopK: Q = {
    def score(w: String) = (0 until 2 * HalfBits).map { i =>
      val (word, j) = if (i < HalfBits) (s"${w}0", i) else (s"${w}1", i - HalfBits)
      element_at(col("qv"), i + 1) *
        (shiftright(col(word), j).bitwiseAND(lit(1L)) * 2 - 1)
    }.reduce(_ + _)
    def sqlScore(w: String) = (0 until 2 * HalfBits).map { i =>
      val (word, j) = if (i < HalfBits) (s"${w}0", i) else (s"${w}1", i - HalfBits)
      s"qv[${i + 1}]*(((($word >> $j) & 1) * 2) - 1)"
    }.mkString(" + ")
    Q(
      "e64_asymmetric_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Q.spread(emb.filter(col("vec_id") < 5), "vec_id")
          .select(col("vec_id").as("qid"),
            transform(col("embedding"),
              x => round(x.cast("double") * Grid).cast("long")).as("qv"))
        val cb = signWords(Q.spread(emb.filter(col("vec_id") >= 5), "vec_id"))
          .select(col("vec_id").as("cid"), col("w0").as("cw0"), col("w1").as("cw1"))
        val scored = cb.crossJoin(broadcast(q))
          .select(col("qid"), col("cid"), score("cw").as("score"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("cid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
      WITH bits AS (${sqlSignWords("embeddings")}),
      q AS (
        SELECT vec_id AS qid,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, w0 AS cw0, w1 AS cw1 FROM bits
            WHERE vec_id >= 5),
      scored AS (
        SELECT qid, cid, ${sqlScore("cw")} AS score
        FROM c CROSS JOIN q)
      SELECT qid, cid, score, rank FROM (
        SELECT qid, cid, score,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY score DESC, cid) AS INT) AS rank
        FROM scored) t
      WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  /** e59b: Hamming-vs-exact recall@10, FULLY ORACLED — the FIRST recall
    * audit made cross-engine deterministic (r10 extended the pattern to
    * d42b/d43b/e51b, leaving only e58 rows-only): the Hamming ranking is
    * pure integer and the exact side is e50's decimal-staged cosine, so
    * the driver hash-pins the ACCURACY claim itself, not just the output
    * shape. One corpus pass scores both rankings; the window shuffles only
    * narrow (qid, cid, score) rows.
    */
  /** e67: RECIPROCAL RANK FUSION — the hybrid-search combiner (Cormack et
    * al. SIGIR'09; what every lexical+vector "hybrid" endpoint runs):
    * two independent rankings of the same corpus — the 16-byte Hamming
    * index (e59) and exact integer-grid L2 — fuse per candidate as
    * Σ 1/(60+rank) over the lists that shortlisted it, and the fused
    * order is the answer. Ranks are integers and the fusion is computed
    * as 10⁹ div (60+rank), so the WHOLE hybrid pipeline — both rankings,
    * the shortlist cut, the fused scores, the final order — hash-matches
    * DuckDB with zero float surface.
    *
    * Scale shape: one broadcast-queries corpus pass computes both scores
    * (the 64-term L2 and the 2-word Hamming share the row), the rank
    * windows shuffle only narrow (qid, cid, 2×BIGINT) rows, and the
    * shortlist cut (rank ≤ L per list) bounds the fusion input to
    * O(queries·L) regardless of corpus size — the fused re-rank never
    * sees the corpus.
    */
  private val RrfL = 50           // per-list shortlist depth
  private val RrfK = 60           // the standard RRF damping constant
  private val RrfS = 1000000000L  // integer fusion scale

  /** The e67 dataflow over any (vec_id, embedding) frame (queries =
    * vec_id < 5, corpus = rest) — exposed for planted-disagreement specs.
    */
  def rrfFusion(emb: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    def l2 = (1 to 2 * HalfBits).map { i =>
      val d = element_at(col("qv"), i) - element_at(col("cv"), i)
      d * d
    }.reduce(_ + _)
    val packed = Q.spread(emb, "vec_id")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * Grid).cast("long")).as("gv"),
        signHalf(0).as("w0"), signHalf(HalfBits).as("w1"))
    val q = packed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("gv").as("qv"),
        col("w0").as("qw0"), col("w1").as("qw1"))
    val c = packed.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("gv").as("cv"),
        col("w0").as("cw0"), col("w1").as("cw1"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        hamming(col("qw0"), col("qw1"), col("cw0"), col("cw1")).as("ham"),
        l2.as("dl2"))
    val wH = Window.partitionBy(col("qid")).orderBy(col("ham"), col("cid"))
    val wL = Window.partitionBy(col("qid")).orderBy(col("dl2"), col("cid"))
    val fused = scored
      .withColumn("hamming_rank", row_number().over(wH))
      .withColumn("l2_rank", row_number().over(wL))
      .filter(col("hamming_rank") <= RrfL || col("l2_rank") <= RrfL)
      .withColumn("rrf_scaled",
        when(col("hamming_rank") <= RrfL,
          expr(s"$RrfS div ($RrfK + hamming_rank)")).otherwise(0L) +
        when(col("l2_rank") <= RrfL,
          expr(s"$RrfS div ($RrfK + l2_rank)")).otherwise(0L))
    val wF = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_scaled").desc, col("cid"))
    fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("hamming_rank"), col("l2_rank"),
        col("rrf_scaled"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  val e67RrfFusion: Q = {
    val L = RrfL
    val S = RrfS
    def sqlL2 =
      (1 to 2 * HalfBits)
        .map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])").mkString("+")
    Q(
      "e67_rrf_fusion",
      (s, dir) => rrfFusion(t(s, dir, "embeddings"), k = 10),
      Some(s"""
      WITH packed AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv,
          ${(0 until HalfBits).map(i =>
            s"CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
            .mkString("CAST(", " + ", " AS BIGINT) AS w0")},
          ${(0 until HalfBits).map(i =>
            s"CASE WHEN embedding[${HalfBits + i + 1}] >= 0 THEN ${1L << i} ELSE 0 END")
            .mkString("CAST(", " + ", " AS BIGINT) AS w1")}
        FROM embeddings),
      q AS (SELECT vec_id AS qid, gv AS qv, w0 AS qw0, w1 AS qw1
            FROM packed WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, gv AS cv, w0 AS cw0, w1 AS cw1
            FROM packed WHERE vec_id >= 5),
      scored AS (
        SELECT qid, cid,
          bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)) AS ham,
          $sqlL2 AS dl2
        FROM c CROSS JOIN q),
      ranked AS (
        SELECT qid, cid,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY ham, cid)
            AS INT) AS hamming_rank,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY dl2, cid)
            AS INT) AS l2_rank
        FROM scored),
      fused AS (
        SELECT qid, cid, hamming_rank, l2_rank,
          CAST(CASE WHEN hamming_rank <= $L
              THEN $S // ($RrfK + hamming_rank) ELSE 0 END
            + CASE WHEN l2_rank <= $L
              THEN $S // ($RrfK + l2_rank) ELSE 0 END AS BIGINT) AS rrf_scaled
        FROM ranked WHERE hamming_rank <= $L OR l2_rank <= $L)
      SELECT qid, cid, hamming_rank, l2_rank, rrf_scaled, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY qid
          ORDER BY rrf_scaled DESC, cid) AS INT) AS rank FROM fused) t
      WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  val e59bHammingRecall: Q = Q(
    "e59b_hamming_recall",
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
      val exact = Similarity.exactRerank(fast, q, c, k = 10)
        .select(col("qid"), col("cid"))
      val bits = signWords(emb)
      val qb = bits.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("w0").as("qw0"), col("w1").as("qw1"))
      val cb = bits.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("w0").as("cw0"), col("w1").as("cw1"))
      val wH = Window.partitionBy(col("qid"))
        .orderBy(col("hamming"), col("cid"))
      val ham = cb.crossJoin(broadcast(qb))
        .select(col("qid"), col("cid"),
          hamming(col("qw0"), col("qw1"), col("cw0"), col("cw1")).as("hamming"))
        .withColumn("rank", row_number().over(wH))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("cid"), lit(1).as("hit"))
      exact.join(ham, Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .select(col("qid"), col("n_exact"), col("n_overlap"),
          round(col("n_overlap").cast("double") /
            col("n_exact").cast("double"), 6).as("recall_at_10"))
        .orderBy(col("qid"))
    },
    Some(s"""
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
      exact AS (
        SELECT qid, cid FROM (
          SELECT d.qid, d.cid,
            row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS rank
          FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= 10),
      bits AS (${sqlSignWords("embeddings")}),
      qb AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM bits WHERE vec_id < 5),
      cb AS (SELECT vec_id AS cid, w0 AS cw0, w1 AS cw1 FROM bits WHERE vec_id >= 5),
      ham AS (
        SELECT qid, cid, 1 AS hit FROM (
          SELECT qid, cid,
            row_number() OVER (PARTITION BY qid
              ORDER BY bit_count(xor(qw0, cw0)) + bit_count(xor(qw1, cw1)), cid)
              AS rank
          FROM cb CROSS JOIN qb) t
        WHERE rank <= 10)
      SELECT e.qid, count(*) AS n_exact,
        CAST(sum(coalesce(h.hit, 0)) AS BIGINT) AS n_overlap,
        round(CAST(sum(coalesce(h.hit, 0)) AS DOUBLE) / count(*), 6)
          AS recall_at_10
      FROM exact e LEFT JOIN ham h ON e.qid = h.qid AND e.cid = h.cid
      GROUP BY e.qid ORDER BY e.qid"""))
}
