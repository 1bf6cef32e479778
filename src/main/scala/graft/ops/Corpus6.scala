package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Corpus-curation operators, round 11: exact-substring deduplication and
  * in-document repetition profiling — the two repetition-shaped curation
  * steps the engine did not yet express.
  *
  * d96 is the ExactSubstr idea of Lee et al. 2022 ("Deduplicating
  * Training Data Makes Language Models Better"): remove every token span
  * that appears VERBATIM in another document, at ANY position — the
  * sliding-window complement to d63's fixed-block paragraph dedup (a
  * copied passage that straddles block boundaries is invisible to d63 but
  * not to a sliding window). d97 is the Gopher repetition panel (Rae et
  * al. 2021, table A1): the within-document repetition fractions whose
  * thresholds gate low-quality pages before any cross-document work runs.
  *
  * Both ride the same primitive: per-document HALF-OPEN TOKEN SPANS
  * merged by the classic running-max interval walk ([[mergeSpans]]) —
  * doc-keyed windows only, so the merge shuffles once on doc_id at any
  * corpus size.
  */
object Corpus6 {

  def pack: Seq[Q] = Seq(d96SubstringDedup, d97RepetitionStats)

  /** Sliding-window length for d96: a duplicated run must cover at least
    * this many consecutive tokens. (Lee et al. use 50 BPE tokens against
    * web-scale crawl; 8 matches this corpus's ~100-token documents and
    * d63's block unit, making the two dedup grains directly comparable.)
    */
  val WinTokens = 8

  /** Merge per-document half-open token spans [s, e): classic interval
    * merge as ONE doc-keyed window walk — a span starts a new group when
    * its start clears the running max of all previous ends. Every window
    * is partitioned by doc_id (bounded — the WindowAudit convention).
    */
  def mergeSpans(marks: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marks
      .withColumn("ng", when(prevMax.isNull || col("s") > prevMax, 1L)
        .otherwise(0L))
      .withColumn("grp",
        sum(col("ng")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"))
      .select(col("doc_id"), col("ss"), col("se"))
  }

  /** The d96 pipeline over any (doc_id, text) frame — exposed for
    * planted-corpus specs. See [[d96SubstringDedup]] for semantics.
    */
  def substringDedup(docs: DataFrame): DataFrame = {
    val spread = Q.spread(docs, "doc_id")
    // every WinTokens-token window at every start position (docs shorter
    // than the window contribute none and pass through untouched)
    val windows = spread
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= WinTokens)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n") - WinTokens)).as("s"),
        col("toks"))
      .select(col("doc_id"), col("s"),
        array_join(slice(col("toks"), col("s") + 1, lit(WinTokens)), " ").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cross-document duplicates only: a window repeated inside ONE doc is
    // self-similarity (d97's business), not plagiarized boilerplate
    val dup = windows.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("w"))
    // plain shuffled equi-join on the window text: unlike d63's few-hot-
    // blocks broadcast, the duplicated-window set is NOT small by nature
    // (every offset of a long copied passage is its own window), so the
    // scale-honest plan keys both sides; AQE still broadcasts when tiny
    // persisted: marks feeds BOTH the span merge and the dup-position
    // aggregate — unpersisted, the expensive dup groupBy + equi-join
    // above would run twice
    val marks = windows.join(dup, Seq("w"))
      .select(col("doc_id"), col("s"), (col("s") + WinTokens).as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = mergeSpans(marks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spanAgg = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss")).as("n_tokens_removed"))
    val markAgg = marks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_positions"))
    // kept tokens: anti-join token positions against the (disjoint,
    // merged) spans — equi on doc_id plus the range predicate, so each
    // token meets at most one span and the join stays O(tokens)
    val toks = spread
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "tok")
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("pos") >= col("ss") && col("pos") < col("se"),
      "left_anti")
    val cleanAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens_kept"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")),
          " ")).as("clean_md5"))
    val res = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - WinTokens + 1, lit(0L)))
      .join(markAgg, Seq("doc_id"), "left")
      .join(spanAgg, Seq("doc_id"), "left")
      .join(cleanAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_tokens_removed"), lit(0L)).as("n_tokens_removed"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
      .orderBy(col("doc_id"))
    Q.materialized(res, windows, marks, spans)
  }

  /** d96: EXACT-SUBSTRING DEDUPLICATION (Lee et al. 2022's ExactSubstr,
    * re-expressed relationally): every WinTokens-token window of every
    * document, at EVERY start offset, is checked for verbatim repetition
    * in ANY OTHER document; occurrences of repeated windows become token
    * spans, overlapping spans merge, and the merged spans are cut out of
    * the text. Output per document: window/span/removal counts plus the
    * md5 of the cleaned text, so the compare pins the reconstruction.
    * The sliding window is what d63's fixed blocks cannot see: a copied
    * passage at an arbitrary offset marks ALL its windows, and the merged
    * span recovers the full passage extent (± window-length edge effects,
    * exactly as in the paper).
    *
    * Scale shape: the window explode is narrow (one row per token,
    * ~WinTokens× the text in bytes); the df count and the mark join
    * shuffle on the window text once; span merge and reconstruction are
    * doc-keyed. Nothing is all-pairs, nothing data-sized broadcasts. (A
    * true suffix-array build as in the paper is a different trade — this
    * is the windowed formulation that matches engine semantics and stays
    * one shuffle per stage.)
    */
  val d96SubstringDedup: Q = Q(
    "d96_substring_dedup",
    (s, dir) => substringDedup(t(s, dir, "documents")),
    Some(s"""
      WITH w AS (
        SELECT doc_id, s,
          array_to_string(words[s+1 : s+$WinTokens], ' ') AS w
        FROM (
          SELECT doc_id, string_split(text, ' ') AS words,
            unnest(range(0, len(string_split(text, ' ')) - $WinTokens + 1))
              AS s
          FROM documents) t),
      dup AS (
        SELECT w FROM w GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
      m AS (
        SELECT doc_id, s, s + $WinTokens AS e FROM w JOIN dup USING (w)),
      g AS (
        SELECT doc_id, s, e,
          CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN 1 ELSE 0 END AS ng
        FROM m),
      g2 AS (
        SELECT doc_id, s, e,
          CAST(sum(ng) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS grp
        FROM g),
      sp AS (
        SELECT doc_id, grp, min(s) AS ss, max(e) AS se
        FROM g2 GROUP BY doc_id, grp),
      tok AS (
        SELECT doc_id, i - 1 AS pos, words[i] AS tok
        FROM (
          SELECT doc_id, string_split(text, ' ') AS words,
            unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
          FROM documents) t),
      kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM tok t
        WHERE NOT EXISTS (
          SELECT 1 FROM sp
          WHERE sp.doc_id = t.doc_id AND t.pos >= sp.ss AND t.pos < sp.se)),
      ck AS (
        SELECT doc_id, count(*) AS n_tokens_kept,
          md5(array_to_string(list(tok ORDER BY pos), ' ')) AS clean_md5
        FROM kept GROUP BY doc_id),
      wc AS (SELECT doc_id, count(*) AS n_dup_positions FROM m GROUP BY doc_id),
      sc AS (
        SELECT doc_id, count(*) AS n_spans,
          CAST(sum(se - ss) AS BIGINT) AS n_tokens_removed
        FROM sp GROUP BY doc_id),
      base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents)
      SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        CAST(greatest(b.n_tokens - $WinTokens + 1, 0) AS BIGINT) AS n_windows,
        CAST(coalesce(wc.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
        CAST(coalesce(sc.n_spans, 0) AS BIGINT) AS n_spans,
        CAST(coalesce(sc.n_tokens_removed, 0) AS BIGINT) AS n_tokens_removed,
        CAST(coalesce(ck.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
        coalesce(ck.clean_md5, md5('')) AS clean_md5
      FROM base b
      LEFT JOIN wc USING (doc_id)
      LEFT JOIN sc USING (doc_id)
      LEFT JOIN ck USING (doc_id)
      ORDER BY doc_id"""))

  /** Gopher repetition thresholds (Rae et al. 2021, table A1), in basis
    * points over the TOKEN-count variants computed here (the paper counts
    * characters; tokens are declared as this corpus's unit — the signal
    * and the gating behavior are the same).
    */
  val Top2MaxBp = 2000L
  val Top3MaxBp = 1800L
  val Dup5MaxBp = 1500L

  /** n-gram rows (doc_id, s, gram) for every start offset. */
  private def ngramRows(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .filter(col("n") >= k)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n") - k)).as("s"), col("toks"))
      .select(col("doc_id"), col("s"),
        array_join(slice(col("toks"), col("s") + 1, lit(k)), " ").as("gram"))

  /** d97: IN-DOCUMENT REPETITION PANEL — the Gopher quality-filter
    * repetition signals: the token fraction claimed by the single most
    * frequent 2-gram and 3-gram, and the token COVERAGE of 5-grams that
    * repeat within the document (occurrence spans merged first, so an
    * "aaaa…" pathology counts each token once, not once per overlapping
    * occurrence). `gopher_pass` applies the paper's thresholds; the
    * fractions ship too, because curation tunes thresholds per corpus.
    *
    * Scale shape: three narrow n-gram explodes, (doc, gram)-keyed counts,
    * doc-keyed argmax/merge — one shuffle per stage, all keyed, nothing
    * broadcast. Integer basis points end-to-end (non-negative integer
    * division agrees across engines).
    */
  /** The d97 pipeline over any (doc_id, text) frame — exposed for
    * planted-corpus specs. See [[d97RepetitionStats]] for semantics.
    */
  def repetitionStats(docsIn: DataFrame): DataFrame = {
      val docs = Q.spread(docsIn, "doc_id")
        .select(col("doc_id"), col("text"))
      def topK(k: Int, cnt: String): DataFrame =
        ngramRows(docs, k)
          .groupBy(col("doc_id"), col("gram"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as(cnt))
      val dup5 = ngramRows(docs, 5)
        .withColumn("c",
          count(lit(1)).over(Window.partitionBy(col("doc_id"), col("gram"))))
        .filter(col("c") >= 2)
        .select(col("doc_id"), col("s"), (col("s") + 5).as("e"))
      val cov5 = mergeSpans(dup5).groupBy(col("doc_id"))
        .agg(sum(col("se") - col("ss")).as("dup5_covered"))
      val res = docs
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(topK(2, "top2_cnt"), Seq("doc_id"), "left")
        .join(topK(3, "top3_cnt"), Seq("doc_id"), "left")
        .join(cov5, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("top2_cnt"), lit(0L)).as("top2_cnt"),
          coalesce(col("top3_cnt"), lit(0L)).as("top3_cnt"),
          coalesce(col("dup5_covered"), lit(0L)).as("dup5_covered"))
        .select(col("doc_id"), col("n_tokens"), col("top2_cnt"),
          expr("top2_cnt * 2 * 10000 div n_tokens").as("top2_frac_bp"),
          col("top3_cnt"),
          expr("top3_cnt * 3 * 10000 div n_tokens").as("top3_frac_bp"),
          col("dup5_covered"),
          expr("dup5_covered * 10000 div n_tokens").as("dup5_frac_bp"))
        .select(col("*"),
          (col("top2_frac_bp") <= Top2MaxBp &&
            col("top3_frac_bp") <= Top3MaxBp &&
            col("dup5_frac_bp") <= Dup5MaxBp).as("gopher_pass"))
        .orderBy(col("doc_id"))
      res
  }

  val d97RepetitionStats: Q = Q(
    "d97_repetition_stats",
    (s, dir) => repetitionStats(t(s, dir, "documents")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS words,
          len(string_split(text, ' ')) AS n
        FROM documents),
      g2 AS (
        SELECT doc_id, max(c) AS top2_cnt FROM (
          SELECT doc_id, array_to_string(words[s+1 : s+2], ' ') AS gram,
            count(*) AS c
          FROM (SELECT doc_id, words, unnest(range(0, n - 1)) AS s
                FROM toks WHERE n >= 2) t
          GROUP BY doc_id, gram) u GROUP BY doc_id),
      g3 AS (
        SELECT doc_id, max(c) AS top3_cnt FROM (
          SELECT doc_id, array_to_string(words[s+1 : s+3], ' ') AS gram,
            count(*) AS c
          FROM (SELECT doc_id, words, unnest(range(0, n - 2)) AS s
                FROM toks WHERE n >= 3) t
          GROUP BY doc_id, gram) u GROUP BY doc_id),
      g5 AS (
        SELECT doc_id, s, gram,
          count(*) OVER (PARTITION BY doc_id, gram) AS c
        FROM (
          SELECT doc_id, s, array_to_string(words[s+1 : s+5], ' ') AS gram
          FROM (SELECT doc_id, words, unnest(range(0, n - 4)) AS s
                FROM toks WHERE n >= 5) t) u),
      m AS (SELECT doc_id, s, s + 5 AS e FROM g5 WHERE c >= 2),
      mg AS (
        SELECT doc_id, s, e,
          CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN 1 ELSE 0 END AS ng
        FROM m),
      mg2 AS (
        SELECT doc_id, s, e,
          CAST(sum(ng) OVER (PARTITION BY doc_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS grp
        FROM mg),
      sp AS (
        SELECT doc_id, min(s) AS ss, max(e) AS se
        FROM mg2 GROUP BY doc_id, grp),
      cov AS (
        SELECT doc_id, CAST(sum(se - ss) AS BIGINT) AS dup5_covered
        FROM sp GROUP BY doc_id)
      SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
        CAST(coalesce(g2.top2_cnt, 0) AS BIGINT) AS top2_cnt,
        CAST(coalesce(g2.top2_cnt, 0) * 2 * 10000 // t.n AS BIGINT)
          AS top2_frac_bp,
        CAST(coalesce(g3.top3_cnt, 0) AS BIGINT) AS top3_cnt,
        CAST(coalesce(g3.top3_cnt, 0) * 3 * 10000 // t.n AS BIGINT)
          AS top3_frac_bp,
        CAST(coalesce(cov.dup5_covered, 0) AS BIGINT) AS dup5_covered,
        CAST(coalesce(cov.dup5_covered, 0) * 10000 // t.n AS BIGINT)
          AS dup5_frac_bp,
        coalesce(g2.top2_cnt, 0) * 2 * 10000 // t.n <= $Top2MaxBp
          AND coalesce(g3.top3_cnt, 0) * 3 * 10000 // t.n <= $Top3MaxBp
          AND coalesce(cov.dup5_covered, 0) * 10000 // t.n <= $Dup5MaxBp
          AS gopher_pass
      FROM toks t
      LEFT JOIN g2 USING (doc_id)
      LEFT JOIN g3 USING (doc_id)
      LEFT JOIN cov USING (doc_id)
      ORDER BY doc_id"""))
}
