package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Sixth similarity pack: lexical retrieval. The vector packs (e50-e79)
  * cover the dense side of a retrieval stack; production search is hybrid,
  * and the lexical half of e67's fusion deserves a first-class, scoreable
  * operator: BM25. Reference scope: the engine's retrieval closure
  * (SURVEY.md §2-B similarity row) — the reference itself has no search
  * surface (`/root/reference/spotifytransform.py:1-80` is projection-only),
  * so this pack is part of the mandated LLM-pipeline capability set.
  */
object Similarity6 {

  def pack: Seq[Q] = Seq(e80Bm25TopK, e81SubspaceRebalance, e82NdcgEval,
    e83PrfExpansion, e84HashedChunkSearch)

  private val Grid = 512L
  private val NSub = 8
  private val Dim = 64

  /** The three fixed keyword queries (qid, term). Fixed literals keep the
    * operator deterministic and let the oracle restate them as VALUES. */
  private val QueryTerms: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "join", 1 -> "hash",
    2 -> "stream", 2 -> "window", 2 -> "batch",
    3 -> "vector", 3 -> "scan", 3 -> "filter")

  /** e80: BM25 TOP-K — Okapi BM25 (k1=1.2, b=0.75, Lucene's +1 idf) over
    * the whitespace-token corpus, top-5 docs per fixed keyword query.
    *
    * Cross-engine determinism: with k1=6/5 and b=3/4, the tf saturation
    * term is the exact rational 44·S·tf / (20·S·tf + 6·S + 18·dl·N)
    * (S=Σdl corpus token count, dl=doc length, N=doc count) — both sides
    * evaluated as one IEEE division of two exactly-representable BIGINTs
    * (≲2⁴⁰ ≪ 2⁵³ even at sf100). idf = ln((2N+2)/(2df+1)) is one exact
    * division and one libm ln (the d54 precedent). Each term contribution
    * is rounded to the 10⁻⁶ grid BEFORE summing, so the per-doc score is
    * an order-independent integer sum.
    *
    * Scale shape: tf/df/dl are one explode + two keyed aggregations over
    * the corpus (the same postings pass an inverted index build pays); the
    * query set joins in as a BROADCAST semi-shape (9 rows), so candidate
    * scoring touches only postings of query terms — no per-(query,doc)
    * blowup. The two corpus scalars attach as a 1-row broadcast cross
    * join. The only windows rank per-query candidate sets.
    */
  /** The corpus side of BM25: (tf-with-dl, df, 1-row scalars). Shared by
    * e80 and the e83 feedback loop. */
  private[ops] def bm25Postings(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scal = base.agg(count(lit(1)).as("nd"),
      sum(size(col("toks")).cast("long")).as("s"))
    (tf, dfreq, scal)
  }

  /** Score a weighted query set against the postings: `queries` carries
    * (qid, term, wden) — each term's grid-rounded BM25 contribution is
    * integer-divided by its weight denominator (1 = full weight, 2 =
    * half, the Rocchio-style expansion discount) BEFORE the sum, so
    * weighting stays in exact integer arithmetic. */
  private[ops] def bm25Score(tf: DataFrame, dfreq: DataFrame,
      scal: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val contrib = tf
      .join(broadcast(queries), "term")
      .join(broadcast(dfreq.join(
        broadcast(queries.select(col("term")).distinct()), "term")), "term")
      .crossJoin(broadcast(scal))
      .select(col("qid"), col("doc_id"),
        expr(s"""(CAST(round(
          ln(CAST(2*nd+2 AS DOUBLE) / CAST(2*df+1 AS DOUBLE)) *
          (CAST(44*s*tf AS DOUBLE) /
           CAST(20*s*tf + 6*s + 18*dl*nd AS DOUBLE)) *
          1000000.0) AS BIGINT)) div wden""").as("c"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** Core builder, exposed for planted-corpus specs: BM25 top-k over any
    * (doc_id, text) frame for the given (qid, term) query set. */
  def bm25TopK(docs: DataFrame, terms: Seq[(Int, String)], k: Int)
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (tf, dfreq, scal) = bm25Postings(docs)
    val queries = terms.toDF("qid", "term").withColumn("wden", lit(1L))
    bm25Score(tf, dfreq, scal, queries, k)
  }

  val e80Bm25TopK: Q = Q(
    "e80_bm25_topk",
    (s, dir) =>
      bm25TopK(Q.spread(t(s, dir, "documents"), "doc_id"), QueryTerms, 5),
    Some(s"""
      WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
          CAST(max(dl) AS BIGINT) AS dl
        FROM (SELECT doc_id, unnest(toks) AS term,
                CAST(len(toks) AS BIGINT) AS dl FROM base) x
        GROUP BY doc_id, term),
      dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY term),
      scal AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                      CAST(sum(len(toks)) AS BIGINT) AS s FROM base),
      q(qid, term) AS (VALUES ${QueryTerms
        .map { case (q, w) => s"($q, '$w')" }.mkString(", ")}),
      contrib AS (
        SELECT q.qid, tf.doc_id,
          CAST(round(
            ln(CAST(2*nd+2 AS DOUBLE) / CAST(2*df+1 AS DOUBLE)) *
            (CAST(44*s*tf AS DOUBLE) /
             CAST(20*s*tf + 6*s + 18*dl*nd AS DOUBLE)) *
            1000000.0) AS BIGINT) AS c
        FROM q JOIN tf USING (term) JOIN dfreq USING (term)
        CROSS JOIN scal)
      SELECT qid, doc_id, score_micro, rank FROM (
        SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
          CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY CAST(sum(c) AS BIGINT) DESC, doc_id) AS INT)
            AS rank
        FROM contrib GROUP BY qid, doc_id) t
      WHERE rank <= 5 ORDER BY qid, rank"""))

  /** e81: PQ SUBSPACE REBALANCE — the OPQ-lite preprocessing step: per-dim
    * variance on the 1/512 integer grid, then dims dealt into the 8 PQ
    * subspaces in a variance-sorted SNAKE (forward, then backward, …) so
    * each subspace carries a near-equal variance load, vs the natural
    * contiguous dim÷8 blocks e57 quantizes. Balanced subspaces are why
    * rotated/permuted PQ quantizes better: codebook capacity stops being
    * wasted on low-energy blocks. Report: per (scheme, subspace) the dim
    * count and the n²-scaled variance sum n·Σx² − (Σx)², accumulated in
    * DECIMAL(38,0) (the g70 moment idiom — overflow-proof at any corpus
    * size) with one deterministic cast to DOUBLE at the end, so both
    * engines agree bit-exactly.
    *
    * Scale shape: one explode + one 64-group aggregation over the corpus
    * (the only data-sized pass); the assignment arithmetic runs on 64
    * rows with a 64-row window — driver-scale, like every codebook-side
    * step of the PQ family.
    */
  val e81SubspaceRebalance: Q = Q(
    "e81_subspace_rebalance",
    (s, dir) => {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val perDim = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"),
          round(col("v").cast("double") * Grid).cast("long").as("g"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("g").cast(d38)).as("s1"),
          sum((col("g") * col("g")).cast(d38)).as("s2"))
        .select(col("dim"),
          (col("n").cast(d38) * col("s2") - col("s1") * col("s1"))
            .as("var_n2"))
      val snake = perDim
        .withColumn("rn", row_number().over(
          Window.orderBy(col("var_n2").desc, col("dim"))) - 1)
        .select(col("dim"), col("var_n2"),
          when(expr(s"(rn div $NSub) % 2") === 0, expr(s"rn % $NSub"))
            .otherwise(lit(NSub - 1) - expr(s"rn % $NSub")).as("subspace"))
      val natural = perDim
        .select(col("dim"), col("var_n2"),
          expr(s"dim div ${Dim / NSub}").cast("int").as("subspace"))
      def roll(df: org.apache.spark.sql.DataFrame, scheme: String) =
        df.groupBy(col("subspace"))
          .agg(count(lit(1)).as("n_dims"), sum(col("var_n2")).as("vs"))
          .select(lit(scheme).as("scheme"),
            col("subspace").cast("long"), col("n_dims"),
            col("vs").cast("double").as("var_sum"))
      roll(natural, "natural").unionAll(roll(snake, "snake"))
        .orderBy(col("scheme"), col("subspace"))
    },
    Some(s"""
      WITH perdim AS MATERIALIZED (
        SELECT dim,
          CAST(count(*) AS DECIMAL(38,0)) * sum(CAST(g*g AS DECIMAL(38,0)))
            - sum(CAST(g AS DECIMAL(38,0))) * sum(CAST(g AS DECIMAL(38,0)))
            AS var_n2
        FROM (
          SELECT CAST(u.i AS INT) AS dim,
            CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * $Grid)
                 AS BIGINT) AS g
          FROM embeddings, range(0, $Dim) u(i)) x
        GROUP BY dim),
      snake AS (
        SELECT dim, var_n2,
          CASE WHEN (rn // $NSub) % 2 = 0 THEN rn % $NSub
               ELSE ${NSub - 1} - rn % $NSub END AS subspace
        FROM (SELECT dim, var_n2,
                row_number() OVER (ORDER BY var_n2 DESC, dim) - 1 AS rn
              FROM perdim) r),
      nat AS (
        SELECT dim, var_n2, dim // ${Dim / NSub} AS subspace FROM perdim)
      SELECT scheme, CAST(subspace AS BIGINT) AS subspace,
        CAST(count(*) AS BIGINT) AS n_dims,
        CAST(sum(var_n2) AS DOUBLE) AS var_sum
      FROM (
        SELECT 'natural' AS scheme, subspace, var_n2 FROM nat
        UNION ALL SELECT 'snake', subspace, var_n2 FROM snake) t
      GROUP BY scheme, subspace ORDER BY scheme, subspace"""))

  private val NdcgK = 10
  private val PrefixDims = 16

  /** e82: NDCG@10 OF PREFIX RETRIEVAL — the recall audits (e58/e63/e59b)
    * score retrieval as a SET; NDCG scores it as a RANKING: graded
    * relevance from the exact 64-dim integer-L2 order (top-3 → grade 3,
    * 4-5 → 2, 6-10 → 1), position discounts 1/log₂(i+1), run = the
    * 16-dim Matryoshka-prefix ranking. Because the ideal grade profile
    * (3,3,3,2,2,1,1,1,1,1) is fixed, IDCG is a constant and
    * ndcg_bp = DCG·10⁴ div IDCG is pure integer arithmetic once each
    * discount is rounded to the 10⁻⁶ grid — the d54 ln precedent is the
    * only float surface, and it's per-POSITION (10 values), not per-row.
    *
    * Scale shape: one broadcast query × corpus scoring pass computes
    * BOTH distances (the prefix L2 is a sub-sum of the full one's
    * terms); two per-query rank windows; the metric join touches only
    * 2·k rows per query.
    */
  val e82NdcgEval: Q = Q(
    "e82_ndcg_eval",
    (s, dir) => {
      def l2(n: Int) = (1 to n).map { i =>
        val d = element_at(col("qv"), i) - element_at(col("cv"), i)
        d * d
      }.reduce(_ + _)
      val gv = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * Grid).cast("long")).as("gv"))
      val q = gv.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("gv").as("qv"))
      val c = gv.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("gv").as("cv"))
      val scored = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"), l2(Dim).as("dfull"),
          l2(PrefixDims).as("dpre"))
      def ranked(dcol: String, rcol: String) =
        row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col(dcol), col("cid"))).as(rcol)
      val exact = scored
        .select(col("qid"), col("cid"), ranked("dfull", "re"))
        .filter(col("re") <= NdcgK)
        .select(col("qid"), col("cid"),
          when(col("re") <= 3, 3L).when(col("re") <= 5, 2L)
            .otherwise(1L).as("rel"))
      val run = scored
        .select(col("qid"), col("cid"), ranked("dpre", "rr"))
        .filter(col("rr") <= NdcgK)
      // per-position discount w_i = round(1e6·ln2/ln(i+1)); IDCG is the
      // fixed ideal profile 3,3,3,2,2,1,1,1,1,1 priced at those weights
      def w(i: org.apache.spark.sql.Column) =
        round(lit(1000000.0) * log(lit(2.0)) /
          log(i.cast("double") + 1.0)).cast("long")
      val idcg = (1 to NdcgK).map { i =>
        val g = if (i <= 3) 3L else if (i <= 5) 2L else 1L
        w(lit(i)) * g
      }.reduce(_ + _)
      run.join(exact, Seq("qid", "cid"), "left")
        .select(col("qid"),
          (coalesce(col("rel"), lit(0L)) * w(col("rr"))).as("g"))
        .groupBy(col("qid"))
        .agg(sum(col("g")).as("dcg_micro"))
        .select(col("qid"), col("dcg_micro"), idcg.as("idcg_micro"))
        .withColumn("ndcg_bp", expr("dcg_micro * 10000 div idcg_micro"))
        .orderBy(col("qid"))
    },
    Some {
      def sqlL2(n: Int) =
        (1 to n).map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])")
          .mkString("+")
      def sqlW(e: String) =
        s"CAST(round(1000000.0 * ln(2.0) / ln($e + 1.0)) AS BIGINT)"
      val sqlIdcg = (1 to NdcgK).map { i =>
        val g = if (i <= 3) 3 else if (i <= 5) 2 else 1
        s"${sqlW(i.toString)} * $g"
      }.mkString(" + ")
      s"""
      WITH gv AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * $Grid) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, gv AS qv FROM gv WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, gv AS cv FROM gv WHERE vec_id >= 5),
      scored AS MATERIALIZED (
        SELECT q.qid, c.cid, ${sqlL2(Dim)} AS dfull,
          ${sqlL2(PrefixDims)} AS dpre
        FROM c CROSS JOIN q),
      exact AS (
        SELECT qid, cid,
          CASE WHEN re <= 3 THEN 3 WHEN re <= 5 THEN 2 ELSE 1 END AS rel
        FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid
                ORDER BY dfull, cid) AS re FROM scored) t
        WHERE re <= $NdcgK),
      run AS (
        SELECT qid, cid, rr
        FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid
                ORDER BY dpre, cid) AS rr FROM scored) t
        WHERE rr <= $NdcgK)
      SELECT qid, dcg_micro, idcg_micro,
        CAST(dcg_micro * 10000 // idcg_micro AS BIGINT) AS ndcg_bp
      FROM (
        SELECT r.qid,
          CAST(sum(coalesce(e.rel, 0) * ${sqlW("r.rr")}) AS BIGINT)
            AS dcg_micro,
          CAST($sqlIdcg AS BIGINT) AS idcg_micro
        FROM run r LEFT JOIN exact e ON r.qid = e.qid AND r.cid = e.cid
        GROUP BY r.qid) t
      ORDER BY qid"""
    })

  /** e83: PSEUDO-RELEVANCE-FEEDBACK EXPANSION — the Rocchio loop every
    * lexical search stack runs: retrieve with the original query (e80's
    * scorer), treat the top-3 documents as implicitly relevant, mine
    * their 2 strongest non-query terms (idf·feedback-tf weight, grid
    * integers), re-retrieve with the expanded query at HALF weight for
    * the new terms (wden = 2 — the discount stays in exact integer
    * arithmetic: contribution div 2 before the sum). Output: final
    * top-5 per query with the expanded score.
    *
    * Scale shape: the corpus is touched by the SAME postings build once
    * (tf/df/scalars shared across both retrieval stages); the feedback
    * mining joins 3 doc ids back to tf (doc-keyed), and both query sets
    * join as broadcasts. Nothing query-side ever scales with the corpus.
    */
  /** The full PRF loop over any (doc_id, text) frame — exposed for
    * planted-corpus specs. */
  def prfTopK(docs: DataFrame, terms: Seq[(Int, String)], fbDocs: Int,
      expTerms: Int, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (tf0, dfreq0, scal0) = bm25Postings(docs)
    val tf = tf0.persist()
    val dfreq = dfreq0.persist()
    val scal = scal0
    val q0 = terms.toDF("qid", "term").withColumn("wden", lit(1L))
    val top3 = bm25Score(tf, dfreq, scal, q0, fbDocs)
      .select(col("qid"), col("doc_id"))
    val fbTf = top3.join(tf, "doc_id")
      .groupBy(col("qid"), col("term")).agg(sum(col("tf")).as("ftf"))
    val wExp = Window.partitionBy(col("qid"))
      .orderBy(col("wgt").desc, col("term"))
    val expansion = fbTf
      .join(q0.select(col("qid"), col("term"), lit(1).as("orig")),
        Seq("qid", "term"), "left_anti")
      .join(dfreq, "term")
      .crossJoin(broadcast(scal.select(col("nd"))))
      .select(col("qid"), col("term"),
        (round(log((lit(2) * col("nd") + 2).cast("double") /
          (lit(2) * col("df") + 1).cast("double")) * 1000000.0)
          .cast("long") * col("ftf")).as("wgt"))
      .withColumn("r", row_number().over(wExp))
      .filter(col("r") <= expTerms)
      .select(col("qid"), col("term"), lit(2L).as("wden"))
    val q2 = q0.unionByName(expansion).localCheckpoint(true)
    val out = bm25Score(tf, dfreq, scal, q2, k).localCheckpoint(true)
    Q.releaseBlocks(q2)
    tf.unpersist(); dfreq.unpersist()
    out
  }

  val e83PrfExpansion: Q = Q(
    "e83_prf_expansion",
    (s, dir) =>
      prfTopK(Q.spread(t(s, dir, "documents"), "doc_id"), QueryTerms,
        fbDocs = 3, expTerms = 2, k = 5),
    Some(s"""
      WITH base AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS MATERIALIZED (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
          CAST(max(dl) AS BIGINT) AS dl
        FROM (SELECT doc_id, unnest(toks) AS term,
                CAST(len(toks) AS BIGINT) AS dl FROM base) x
        GROUP BY doc_id, term),
      dfreq AS MATERIALIZED (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      scal AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                      CAST(sum(len(toks)) AS BIGINT) AS s FROM base),
      q0(qid, term) AS (VALUES ${QueryTerms
        .map { case (q, w) => s"($q, '$w')" }.mkString(", ")}),
      c1 AS (
        SELECT q0.qid, tf.doc_id,
          CAST(round(
            ln(CAST(2*nd+2 AS DOUBLE) / CAST(2*df+1 AS DOUBLE)) *
            (CAST(44*s*tf AS DOUBLE) /
             CAST(20*s*tf + 6*s + 18*dl*nd AS DOUBLE)) *
            1000000.0) AS BIGINT) AS c
        FROM q0 JOIN tf USING (term) JOIN dfreq USING (term)
        CROSS JOIN scal),
      top3 AS (
        SELECT qid, doc_id FROM (
          SELECT qid, doc_id,
            row_number() OVER (PARTITION BY qid
              ORDER BY CAST(sum(c) AS BIGINT) DESC, doc_id) AS rank
          FROM c1 GROUP BY qid, doc_id) t
        WHERE rank <= 3),
      fbtf AS (
        SELECT top3.qid, tf.term, CAST(sum(tf.tf) AS BIGINT) AS ftf
        FROM top3 JOIN tf USING (doc_id)
        GROUP BY top3.qid, tf.term),
      expansion AS (
        SELECT qid, term FROM (
          SELECT f.qid, f.term,
            row_number() OVER (PARTITION BY f.qid ORDER BY
              CAST(round(ln(CAST(2*nd+2 AS DOUBLE) /
                            CAST(2*df+1 AS DOUBLE)) * 1000000.0)
                   AS BIGINT) * f.ftf DESC, f.term) AS r
          FROM fbtf f
          JOIN dfreq USING (term)
          CROSS JOIN (SELECT nd FROM scal) n
          WHERE NOT EXISTS (SELECT 1 FROM q0
            WHERE q0.qid = f.qid AND q0.term = f.term)) t
        WHERE r <= 2),
      q2 AS (
        SELECT qid, term, CAST(1 AS BIGINT) AS wden FROM q0
        UNION ALL
        SELECT qid, term, CAST(2 AS BIGINT) AS wden FROM expansion),
      c2 AS (
        SELECT q2.qid, tf.doc_id,
          CAST(round(
            ln(CAST(2*nd+2 AS DOUBLE) / CAST(2*df+1 AS DOUBLE)) *
            (CAST(44*s*tf AS DOUBLE) /
             CAST(20*s*tf + 6*s + 18*dl*nd AS DOUBLE)) *
            1000000.0) AS BIGINT) // wden AS c
        FROM q2 JOIN tf USING (term) JOIN dfreq USING (term)
        CROSS JOIN scal)
      SELECT qid, doc_id, score_micro, rank FROM (
        SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
          CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY CAST(sum(c) AS BIGINT) DESC, doc_id) AS INT)
            AS rank
        FROM c2 GROUP BY qid, doc_id) t
      WHERE rank <= 5 ORDER BY qid, rank"""))

  /** e84: HASHED-CHUNK SEARCH — the retrieval half of d93's RAG loop:
    * queries hash into the same 16-dim ±1 space as the chunks
    * (md5-nibble dimension and sign, zero trained state), and relevance
    * is the exact INTEGER dot product — the one dense-retrieval stack
    * whose scores both engines reproduce bit-for-bit with no grid
    * staging at all. Top-5 chunks per keyword query.
    *
    * Scale shape: chunk sketches are one explode + one keyed aggregate
    * (the d93 pass over the full corpus); each query vector is ≤3 rows
    * and joins as a broadcast on `dim` — the dot product touches only
    * chunk components in the query's dimensions (an inverted-index
    * probe, not a full scan of every chunk vector); per-query rank
    * windows only.
    */
  val e84HashedChunkSearch: Q = Q(
    "e84_hashed_chunk_search",
    (s, dir) => {
      import s.implicits._
      val chunks = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), expr("pos div 32").as("chunk_id"),
          expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1")
            .cast("long").as("dim"),
          when(substring(md5(col("tok")), 2, 1) < "8", 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy(col("doc_id"), col("chunk_id"), col("dim"))
        .agg(sum(col("sgn")).as("cv"))
      val qv = QueryTerms.toDF("qid", "tok")
        .select(col("qid"),
          expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1")
            .cast("long").as("dim"),
          when(substring(md5(col("tok")), 2, 1) < "8", 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy(col("qid"), col("dim")).agg(sum(col("sgn")).as("qvv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_id"))
      chunks.join(broadcast(qv), "dim")
        .groupBy(col("qid"), col("doc_id"), col("chunk_id"))
        .agg(sum(col("cv") * col("qvv")).as("score"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""
      WITH chunks AS MATERIALIZED (
        SELECT doc_id, chunk_id, dim, CAST(sum(sgn) AS BIGINT) AS cv
        FROM (
          SELECT doc_id, (pos - 1) // 32 AS chunk_id,
            CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
                 AS BIGINT) AS dim,
            CASE WHEN substr(md5(tok), 2, 1) < '8' THEN 1 ELSE -1 END
              AS sgn
          FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
              generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents) t) x
        GROUP BY doc_id, chunk_id, dim),
      q(qid, tok) AS (VALUES ${QueryTerms
        .map { case (q, w) => s"($q, '$w')" }.mkString(", ")}),
      qv AS (
        SELECT qid,
          CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
               AS BIGINT) AS dim,
          CAST(sum(CASE WHEN substr(md5(tok), 2, 1) < '8' THEN 1
                        ELSE -1 END) AS BIGINT) AS qvv
        FROM q GROUP BY qid, dim)
      SELECT qid, doc_id, chunk_id, score, rank FROM (
        SELECT qid, doc_id, chunk_id,
          CAST(sum(cv * qvv) AS BIGINT) AS score,
          CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY CAST(sum(cv * qvv) AS BIGINT) DESC,
                          doc_id, chunk_id) AS INT) AS rank
        FROM chunks JOIN qv USING (dim)
        GROUP BY qid, doc_id, chunk_id) t
      WHERE rank <= 5 ORDER BY qid, rank"""))
}
