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

  def pack: Seq[Q] = Seq(e80Bm25TopK)

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
}
