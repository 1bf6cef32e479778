package graft.ops

import graft.expr.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Scalar-quantized (int8 SQ) similarity search — the compression tier
  * between full-precision brute force (e50) and product quantization
  * (e60/e62): every vector is stored as per-vector-scaled int8 codes (4×
  * smaller than float32, the Lucene/FAISS `SQ8` layout), candidates are
  * scored with an INTEGER dot product over the codes, and only a bounded
  * shortlist is re-ranked with the exact full-precision cosine.
  *
  * e54 audits exactly this quantizer's reconstruction error; e85 is the
  * serving path built on it, and e85b measures the recall it buys.
  *
  * Scale design: codes are built in one narrow pass per side (no shuffle);
  * the scoring pass is the e50 broadcast-queries shape but reads 64 bytes
  * per vector instead of 256 — at 100 TB the scan is the cost, so SQ8 cuts
  * the dominant term 4× while the exact re-rank touches only
  * `Cand`·queries full vectors. Determinism: scales are one IEEE divide of
  * an exact max; codes are the e54 round-clamp (bit-identical across
  * engines); code dot products are integer-valued (|code|≤127, 64 dims →
  * |sum| ≤ 1,032,256, exact in the native dot_product's double
  * accumulator); the shortlist rank key `cscale·intdot` is one more IEEE
  * multiply — so the whole candidate set, and hence the output, is
  * hash-oracled (the e51 discipline).
  */
object Similarity7 {

  def pack: Seq[Q] = Seq(e85SqSearch, e85bSqRecall, e86SqRefineSweep)

  /** Shortlist size per query kept from the int8 pass (4× the final k —
    * the standard SQ rerank refinement factor).
    */
  private val Cand = 40

  /** Query-set size and final k of the registered Qs — named so the Spark
    * defaults and the generated oracle CTEs share ONE source of truth and
    * cannot desynchronize (the Cand/OracleDim convention).
    */
  private val NQueries = 5
  private val K = 10

  /** The embedding width the generated oracles unroll (`range(0, 64)`);
    * the testdata width, same pinning convention as e51's plane family.
    */
  private val OracleDim = 64

  /** (.., scale, codes): symmetric int8 quantization of `vCol` — e54's
    * audit formula (scale = max|x|/127, codes round-clamped to ±127),
    * codes stored as `array<float>` so the native `dot_product`
    * expression scores a code pair in one codegen loop (float holds ±127
    * exactly). All-zero vectors (scale 0) are dropped: they quantize to
    * nothing and cosine is undefined on them (e54 excludes them the same
    * way).
    */
  private def quantize(df: DataFrame, vCol: String): DataFrame =
    df.withColumn("scale",
        array_max(transform(col(vCol), x => abs(x.cast("double")))) / 127)
      .filter(col("scale") > 0)
      .withColumn("codes", transform(col(vCol), x =>
        least(greatest(round(x.cast("double") / col("scale")), lit(-127.0)),
          lit(127.0)).cast("float")))

  /** SQ8 top-k: int8-code dot products shortlist `Cand` candidates per
    * query (rank key `cscale·intdot` — the query's own scale is a
    * positive per-query constant, so dropping it cannot reorder a
    * query's candidates), then the exact-decimal cosine ranks the
    * shortlist. Queries broadcast; the corpus is never shuffled.
    */
  def sqTopK(emb: DataFrame, nQueries: Int = NQueries, k: Int = K): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val queries = quantize(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")), "qv")
      .select(col("qid"), col("qv"), col("codes").as("qcodes"))
    val corpus = quantize(
      Q.spread(emb.filter(col("vec_id") >= nQueries), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv")), "cv")
      .select(col("cid"), col("cv"), col("scale").as("cscale"),
        col("codes").as("ccodes"))
    val approx = corpus.crossJoin(broadcast(queries.select(col("qid"), col("qcodes"))))
      .select(col("qid"), col("cid"),
        (col("cscale") * Similarity.dotNative(col("qcodes"), col("ccodes")))
          .as("approxs"))
    val shortlist = approx
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("approxs").desc, col("cid"))))
      .filter(col("rn") <= Cand)
      .select(col("qid"), col("cid"))
    Similarity.rankTopK(
      shortlist
        .join(corpus.select(col("cid"), col("cv")), "cid")
        .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
        .select(col("qid"), col("cid"),
          Similarity.cosExact(col("qv"), col("cv")).as("cos")),
      k)
  }

  /** The SQ8 pipeline as DuckDB CTEs — quantizer, integer code dots,
    * shortlist, exact-cosine rank — mirroring the Spark arithmetic
    * step-for-step (same operation order, so every double is
    * bit-identical; the code dot is integral, hence order-independent).
    */
  private def sqCtes: String = s"""
      q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
      c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= $NQueries),
      qs AS (
        SELECT qid, max(abs(CAST(x AS DOUBLE)))/127 AS qscale
        FROM (SELECT qid, unnest(qv) AS x FROM q) t GROUP BY qid
        HAVING max(abs(CAST(x AS DOUBLE))) > 0),
      cs AS (
        SELECT cid, max(abs(CAST(x AS DOUBLE)))/127 AS cscale
        FROM (SELECT cid, unnest(cv) AS x FROM c) t GROUP BY cid
        HAVING max(abs(CAST(x AS DOUBLE))) > 0),
      qc AS (
        SELECT q.qid, r.i,
          least(greatest(round(CAST(q.qv[r.i + 1] AS DOUBLE)/qs.qscale), -127), 127) AS code
        FROM q JOIN qs USING (qid) CROSS JOIN range(0, $OracleDim) r(i)),
      cc AS (
        SELECT c.cid, r.i,
          least(greatest(round(CAST(c.cv[r.i + 1] AS DOUBLE)/cs.cscale), -127), 127) AS code
        FROM c JOIN cs USING (cid) CROSS JOIN range(0, $OracleDim) r(i)),
      sdots AS (
        SELECT qc.qid, cc.cid, sum(qc.code * cc.code) AS intdot
        FROM qc JOIN cc ON qc.i = cc.i GROUP BY qc.qid, cc.cid),
      shortlist AS (
        SELECT qid, cid FROM (
          SELECT s.qid, s.cid, row_number() OVER (PARTITION BY s.qid
            ORDER BY cs.cscale * s.intdot DESC, s.cid) AS rn
          FROM sdots s JOIN cs USING (cid)) t
        WHERE rn <= $Cand),
      qn AS (
        SELECT qid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS qnorm
        FROM (SELECT qid, unnest(qv) AS x FROM q) t GROUP BY qid),
      cn AS (
        SELECT cid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS cnorm
        FROM (SELECT cid, unnest(cv) AS x FROM c) t GROUP BY cid),
      cdots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT sl.qid, sl.cid, unnest(q.qv) AS qx, unnest(c.cv) AS cx
              FROM shortlist sl JOIN q USING (qid) JOIN c USING (cid)) t
        GROUP BY qid, cid),
      sq AS (
        SELECT d.qid, d.cid, d.dot/(qn.qnorm*cn.cnorm) AS cos,
          CAST(row_number() OVER (PARTITION BY d.qid
            ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS INT) AS rank
        FROM cdots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid)"""

  val e85SqSearch: Q = Q(
    "e85_sq_search",
    (s, dir) => sqTopK(t(s, dir, "embeddings")),
    Some(s"""
      WITH $sqCtes
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM sq
      WHERE rank <= $K ORDER BY qid, rank"""))

  /** Accuracy audit for the SQ8 search: per query, recall@10 of [[sqTopK]]
    * against the brute-force exact top-10 (e50's pipeline), computed
    * in-query — the e51b pattern, and like there the recall number ITSELF
    * is oracle-pinned because both sides are bit-stable.
    */
  val e85bSqRecall: Q = Q(
    "e85b_sq_recall",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val ann = sqTopK(emb).select(col("qid"), col("cid"))
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= NQueries), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
      val exact = Similarity.exactRerank(fast, q, c, k = K)
        .select(col("qid"), col("cid"), col("rank"))
      exact
        .join(ann.withColumn("hit", lit(1)), Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"),
          max(when(col("rank") === 1 && col("hit") === 1, 1).otherwise(0))
            .cast("long").as("hit_at_1"))
        .select(col("qid"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall_at_10"),
          col("hit_at_1"))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH $sqCtes,
      alldots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid),
      exact AS (
        SELECT qid, cid, rank FROM (
          SELECT d.qid, d.cid,
            CAST(row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS INT) AS rank
          FROM alldots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= $K),
      hits AS (SELECT qid, cid, 1 AS hit FROM sq WHERE rank <= $K)
      SELECT e.qid, CAST(count(*) AS BIGINT) AS n_exact,
        CAST(sum(coalesce(h.hit, 0)) AS BIGINT) AS n_hit,
        CAST(sum(coalesce(h.hit, 0)) AS DOUBLE) / count(*) AS recall_at_10,
        CAST(max(CASE WHEN e.rank = 1 AND h.hit = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS hit_at_1
      FROM exact e LEFT JOIN hits h ON e.qid = h.qid AND e.cid = h.cid
      GROUP BY e.qid ORDER BY e.qid"""))

  /** The refinement factors e86 sweeps — k, 2k, 4k for k = 10 (4k is
    * e85's serving setting).
    */
  private val SweepCs = Seq(K, 2 * K, 4 * K)

  /** e86: SQ REFINEMENT-FACTOR SWEEP — recall@10 as a function of the
    * int8 shortlist size C ∈ {k, 2k, 4k}: the tuning curve behind e85's
    * C = 4k choice (the e76 nprobe-sweep pattern applied to the rerank
    * knob). The int8 scores are ranked ONCE; each C is a prefix cut of
    * that one ranking, and only the distinct surviving pairs pay the
    * exact-decimal re-score — so the sweep costs one scoring pass plus
    * O(C_max · queries) decimal work, not one corpus pass per setting.
    * Monotone by construction (a larger shortlist can only add recall);
    * `Similarity7Spec` pins that, and the whole curve is hash-oracled.
    */
  val e86SqRefineSweep: Q = Q(
    "e86_sq_refine_sweep",
    (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val cGrid = SweepCs.toDF("refine_c")
      val emb = t(s, dir, "embeddings")
      val queries = quantize(
        emb.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")), "qv")
        .select(col("qid"), col("qv"), col("codes").as("qcodes"))
      val corpus = quantize(
        Q.spread(emb.filter(col("vec_id") >= NQueries), "vec_id")
          .select(col("vec_id").as("cid"), col("embedding").as("cv")), "cv")
        .select(col("cid"), col("cv"), col("scale").as("cscale"),
          col("codes").as("ccodes"))
      val ranked = corpus
        .crossJoin(broadcast(queries.select(col("qid"), col("qcodes"))))
        .select(col("qid"), col("cid"),
          (col("cscale") * Similarity.dotNative(col("qcodes"), col("ccodes")))
            .as("approxs"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("approxs").desc, col("cid"))))
        .filter(col("rn") <= SweepCs.max)
        .select(col("qid"), col("cid"), col("rn"))
      // score each surviving pair exactly ONCE, then fan out to the Cs
      val scored = ranked
        .join(corpus.select(col("cid"), col("cv")), "cid")
        .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
        .select(col("qid"), col("cid"), col("rn"),
          Similarity.cosExact(col("qv"), col("cv")).as("cos"))
      val perC = scored.crossJoin(broadcast(cGrid))
      val w10 = Window.partitionBy(col("refine_c"), col("qid"))
        .orderBy(col("cos").desc, col("cid"))
      val ann = perC.filter(col("rn") <= col("refine_c"))
        .withColumn("r10", row_number().over(w10))
        .filter(col("r10") <= K)
        .select(col("refine_c"), col("qid"), col("cid"))
      val q = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= NQueries), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
      val exact = Similarity.exactRerank(fast, q, c, k = K)
        .select(col("qid"), col("cid"))
      exact
        .crossJoin(broadcast(cGrid))
        .join(ann.withColumn("hit", lit(1)),
          Seq("refine_c", "qid", "cid"), "left")
        .groupBy(col("refine_c"), col("qid"))
        .agg(count(lit(1)).cast("long").as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
        .select(col("refine_c"), col("qid"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall_at_10"))
        .orderBy(col("refine_c"), col("qid"))
    },
    Some(s"""
      WITH $sqCtes,
      cgrid(refine_c) AS (VALUES ${SweepCs.map(c => s"($c)").mkString(", ")}),
      ranked AS (
        SELECT s.qid, s.cid, row_number() OVER (PARTITION BY s.qid
          ORDER BY cs.cscale * s.intdot DESC, s.cid) AS rn
        FROM sdots s JOIN cs USING (cid)),
      survivors AS (SELECT qid, cid, rn FROM ranked WHERE rn <= ${SweepCs.max}),
      sdots2 AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT sv.qid, sv.cid, unnest(q.qv) AS qx, unnest(c.cv) AS cx
              FROM survivors sv JOIN q USING (qid) JOIN c USING (cid)) t
        GROUP BY qid, cid),
      scored2 AS (
        SELECT sv.qid, sv.cid, sv.rn, d.dot/(qn.qnorm*cn.cnorm) AS cos
        FROM survivors sv
          JOIN sdots2 d ON sv.qid = d.qid AND sv.cid = d.cid
          JOIN qn ON sv.qid = qn.qid JOIN cn ON sv.cid = cn.cid),
      ann2 AS (
        SELECT refine_c, qid, cid FROM (
          SELECT g.refine_c, s2.qid, s2.cid,
            row_number() OVER (PARTITION BY g.refine_c, s2.qid
              ORDER BY s2.cos DESC, s2.cid) AS r10
          FROM scored2 s2 JOIN cgrid g ON s2.rn <= g.refine_c) t
        WHERE r10 <= $K),
      alldots AS (
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
          FROM alldots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= $K)
      SELECT g.refine_c, e.qid,
        CAST(count(*) AS BIGINT) AS n_exact,
        CAST(sum(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hit,
        CAST(sum(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS recall_at_10
      FROM exact e CROSS JOIN cgrid g
      LEFT JOIN ann2 a
        ON a.refine_c = g.refine_c AND a.qid = e.qid AND a.cid = e.cid
      GROUP BY g.refine_c, e.qid
      ORDER BY g.refine_c, e.qid"""))
}
