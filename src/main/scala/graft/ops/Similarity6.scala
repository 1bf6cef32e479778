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

  def pack: Seq[Q] = Seq(e80Bm25TopK, e81SubspaceRebalance)

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
  /** Core builder, exposed for planted-corpus specs: BM25 top-k over any
    * (doc_id, text) frame for the given (qid, term) query set. */
  def bm25TopK(docs: DataFrame, terms: Seq[(Int, String)], k: Int)
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scal = base.agg(count(lit(1)).as("nd"),
      sum(size(col("toks")).cast("long")).as("s"))
    val queries = terms.toDF("qid", "term")
    val contrib = tf
      .join(broadcast(queries), "term")
      .join(broadcast(dfreq.join(broadcast(queries), "term")
        .select(col("term"), col("df")).distinct()), "term")
      .crossJoin(broadcast(scal))
      .select(col("qid"), col("doc_id"),
        round(
          log((lit(2) * col("nd") + lit(2)).cast("double") /
              (lit(2) * col("df") + lit(1)).cast("double")) *
          ((lit(44) * col("s") * col("tf")).cast("double") /
           (lit(20) * col("s") * col("tf") + lit(6) * col("s") +
            lit(18) * col("dl") * col("nd")).cast("double")) *
          lit(1000000.0)).cast("long").as("c"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
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
}
