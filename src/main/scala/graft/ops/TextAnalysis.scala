package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Text-analysis operators for LLM training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting. All per-row,
  * narrow, whole-stage-codegen'd — zero shuffle besides the output sort, so
  * throughput is scan-bound at any scale.
  */
object TextAnalysis {

  def pack: Seq[Q] =
    Seq(d30TextStats, d30bRegexTokens, d31LangId, d32Fingerprint, d33Winnow,
      d34HashSplit, d35Bigrams, d36Tfidf, d37QualityFunnel, d38Contamination,
      d39CorpusMix, d47Repetition, d48RepeatedSpans, d49CorpusClean,
      d50SequencePacking, d51Redaction)

  /** Shared tokenizer: whitespace split (the `documents` corpus is
    * single-spaced word text).
    */
  def tokens(c: Column): Column = split(c, " ")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** d34's deterministic multiplicative-hash split bucket in [0, 100) —
    * ONE definition shared by d34 and the d49 capstone, so a formula
    * change cannot silently decouple them. (d39's mixing hash adds +17 on
    * purpose — different stream, deliberately not this expression.)
    * Pre-mod before the multiply: see d34 on Long overflow at 1e9+ ids.
    */
  private def splitBucket: Column = pmod(
    pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L), lit(100L))

  /** The 80/10/10 split name derived from [[splitBucket]]. */
  private[ops] def splitName: Column =
    when(splitBucket < 80, "train").when(splitBucket < 90, "val")
      .otherwise("test")

  /** d37's first-failing-gate quality verdict — ONE definition shared by
    * d37 (funnel counts per verdict), d49 (keep-only filter) and d58's
    * per-source report.
    */
  private[ops] def qualityVerdict: Column = {
    val toks = tokens(col("text"))
    val nTokens = size(toks)
    val punct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    val stops = size(filter(toks, x => x.isin(stopwords: _*)))
    when(nTokens < 5, "reject_too_short")
      .when(nTokens > 5000, "reject_too_long")
      .when(punct.cast("double") / length(col("text")) > 0.1, "reject_punct")
      .when(stops === 0, "reject_no_stopwords")
      .otherwise("keep")
  }

  /** Token counts, punctuation/stopword ratios, and a deterministic
    * composite quality score — the heuristics used to gate documents before
    * expensive downstream processing.
    */
  val d30TextStats: Q = Q(
    "d30_text_stats",
    (s, dir) => {
      val toks = tokens(col("text"))
      val nTokens = size(toks)
      val nChars = length(col("text"))
      val punct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
      val stops = size(filter(toks, x => x.isin(stopwords: _*)))
      t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        nChars.cast("int").as("n_chars_calc"),
        nTokens.cast("int").as("n_tokens"),
        stops.cast("int").as("n_stopwords"),
        (punct.cast("double") / nChars).as("punct_ratio"),
        (stops.cast("double") / nTokens).as("stopword_ratio"),
        ((nChars - nTokens + 1).cast("double") / nTokens).as("avg_token_len"),
        // quality: length saturation × low punctuation × stopword presence.
        // Only +,-,*,/ and least() — IEEE-exact ops, so the oracle matches
        // bit-for-bit (transcendentals like ln differ by 1 ulp across libms).
        (least(nTokens.cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - punct.cast("double") / nChars) *
          (lit(0.5) + stops.cast("double") / nTokens)).as("quality_score"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang,
        CAST(length(text) AS INT) AS n_chars_calc,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','and','to','in'))) AS INT) AS n_stopwords,
        CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
          / length(text) AS punct_ratio,
        CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stopword_ratio,
        CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
          / len(string_split(text, ' ')) AS avg_token_len,
        least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) *
          (1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text)) *
          (0.5 + CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                 / len(string_split(text, ' '))) AS quality_score
      FROM documents ORDER BY doc_id"""))

  /** BPE-style token counting: a GPT-2-pretokenizer-shaped regex (letter
    * runs, digit runs, punctuation runs, each with an optional leading
    * space) alongside the whitespace count — the pair of token budgets a
    * data pipeline tracks (whitespace for quick stats, BPE-ish for actual
    * LLM token-cost estimates). The pattern avoids regex-dialect edge
    * cases so Java regex (Spark) and RE2 (DuckDB) agree token-for-token.
    */
  val d30bRegexTokens: Q = Q(
    "d30b_regex_tokens",
    (s, dir) => {
      val bpeish = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
      t(s, dir, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).cast("int").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeish), lit(0)))
          .cast("int").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
             AS INT) AS bpe_tokens
      FROM documents ORDER BY doc_id"""))

  /** Stopword-lexicon language ID (n-gram-heuristic family): score each
    * candidate language by marker-token hits, argmax with alphabetical
    * tie-break. Pure per-row higher-order functions — no join, no shuffle.
    */
  val d31LangId: Q = Q(
    "d31_lang_id",
    (s, dir) => {
      val toks = tokens(col("text"))
      def score(words: Seq[String]): Column =
        size(filter(toks, x => x.isin(words: _*))).cast("int")
      val de = score(Seq("der", "die", "das", "und", "ist"))
      val en = score(Seq("the", "and", "of", "to", "in"))
      val es = score(Seq("el", "los", "las", "es", "y"))
      val fr = score(Seq("le", "les", "et", "est", "une"))
      t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled_lang"),
        de.as("score_de"), en.as("score_en"), es.as("score_es"), fr.as("score_fr"),
        when(de >= en && de >= es && de >= fr, "de")
          .when(en >= es && en >= fr, "en")
          .when(es >= fr, "es")
          .otherwise("fr").as("pred_lang"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, lang AS labeled_lang,
        score_de, score_en, score_es, score_fr,
        CASE
          WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
          WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
          WHEN score_es >= score_fr THEN 'es'
          ELSE 'fr' END AS pred_lang
      FROM (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS INT) AS score_de,
          CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','and','of','to','in'))) AS INT) AS score_en,
          CAST(len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','es','y'))) AS INT) AS score_es,
          CAST(len(list_filter(string_split(text,' '), x -> x IN ('le','les','et','est','une'))) AS INT) AS score_fr
        FROM documents) t
      ORDER BY doc_id"""))

  /** Deterministic train/val/test split by multiplicative hash of the
    * document id: reproducible across runs, engines, and cluster sizes —
    * the property `rand()`-based sampling lacks. 80/10/10 by Knuth hash
    * bucket; both engines compute the identical integer arithmetic (ids
    * are far below overflow range).
    */
  val d34HashSplit: Q = Q(
    "d34_hash_split",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), splitName.as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""
      SELECT split, lang, count(*) AS n_docs FROM (
        SELECT doc_id, lang,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80 THEN 'train'
               WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM documents) t
      GROUP BY split, lang ORDER BY split, lang"""))

  /** Word-bigram extraction + top-k: the n-gram counting primitive behind
    * language-model data statistics. Tokens are posexploded once and each
    * bigram is formed by `lead` over (doc, pos) — every operator on the
    * path (explode, window, hash-agg) is whole-stage-codegen'd. The
    * round-1 form built bigrams with an interpreted `transform(sequence)`
    * HOF, which cost ~12 s at sf0.1; one extra shuffle (the window on
    * doc_id) buys the codegen path and is the right trade at any scale.
    */
  val d35Bigrams: Q = Q(
    "d35_bigrams",
    (s, dir) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    },
    Some("""
      SELECT bigram, count(*) AS n FROM (
        SELECT unnest([words[i] || ' ' || words[i+1]
                       for i in range(1, len(words))]) AS bigram
        FROM (SELECT string_split(text, ' ') AS words FROM documents) w
        WHERE len(words) >= 2) t
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50"""))

  /** TF-IDF top-terms per document — the distinctive-vocabulary primitive
    * behind corpus exploration and quality filters. IDF is kept as the
    * EXACT integer ratio N/df folded into the score `tf·N/df` (integer
    * products are exact in double far past this scale and IEEE division is
    * engine-identical), not `ln(N/df)` — transcendentals differ by 1 ulp
    * across libms and would break the bit-exact oracle compare; the
    * monotone transform changes no ranking. Two hash-agg shuffles (term
    * stats) + a broadcast of the one-row corpus count; output limited to
    * doc_id < 50, but tf/df are corpus-wide as they must be.
    */
  val d36Tfidf: Q = Q(
    "d36_tfidf",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // deliberate 1-row broadcast cross join (plans as BNLJ over a single
      // broadcast row — the correct shape for attaching a corpus scalar)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(idf, "term")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
        .filter(col("doc_id") < 50)
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents) t
        GROUP BY doc_id, term),
      idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, term, tf, df, score, rank FROM (
        SELECT tf.doc_id, tf.term, tf.tf, idf.df,
          CAST(tf.tf * n.n_docs AS DOUBLE)/idf.df AS score,
          CAST(row_number() OVER (PARTITION BY tf.doc_id
                 ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)/idf.df DESC, tf.term)
               AS INT) AS rank
        FROM tf JOIN idf USING (term) CROSS JOIN n
        WHERE tf.doc_id < 50) t
      WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Quality-filter funnel: apply the standard pre-training gates (too
    * short, too long, over-punctuated, stopword-free) in a FIXED order and
    * report how many documents each gate rejects plus the survivor count —
    * the funnel report that tells a data curator which rule is eating the
    * corpus. One pass, one tiny aggregate; the verdict is a single CASE so
    * each doc counts toward exactly its FIRST failing gate.
    */
  val d37QualityFunnel: Q = Q(
    "d37_quality_funnel",
    (s, dir) => {
      t(s, dir, "documents")
        .select(qualityVerdict.as("verdict"))
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("verdict"))
    },
    Some("""
      SELECT verdict, count(*) AS n_docs FROM (
        SELECT CASE
          WHEN len(string_split(text,' ')) < 5 THEN 'reject_too_short'
          WHEN len(string_split(text,' ')) > 5000 THEN 'reject_too_long'
          WHEN CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) > 0.1 THEN 'reject_punct'
          WHEN len(list_filter(string_split(text,' '),
               x -> x IN ('the','a','of','and','to','in'))) = 0
            THEN 'reject_no_stopwords'
          ELSE 'keep' END AS verdict
        FROM documents) t
      GROUP BY verdict ORDER BY verdict"""))

  /** Deterministic corpus mixing: sample each language at its own rate
    * (the data-mixture knob of LLM pre-training — upsample rare
    * languages, downsample dominant ones) by multiplicative doc_id hash,
    * so the mix is reproducible across runs, engines, and cluster sizes
    * and composes with [[d34HashSplit]]'s splits. Reports per-language
    * kept/total; the per-doc decision is pure integer arithmetic both
    * engines compute identically.
    */
  val d39CorpusMix: Q = Q(
    "d39_corpus_mix",
    (s, dir) => {
      val rates = Map("en" -> 50, "de" -> 80, "es" -> 100, "fr" -> 25)
      // pre-mod before the multiply: see d34 on Long-overflow at scale
      val bucket = pmod(
        pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L) + lit(17L),
        lit(100L))
      val rate = rates.foldLeft(lit(0)) { case (acc, (lang, r)) =>
        when(col("lang") === lang, r).otherwise(acc)
      }
      t(s, dir, "documents")
        .select(col("lang"), (bucket < rate).as("kept"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS n_total,
        CAST(sum(CASE WHEN ((doc_id % 1000000007) * 2654435761 + 17) % 100 <
              CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 80
                        WHEN 'es' THEN 100 WHEN 'fr' THEN 25 ELSE 0 END
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** The corpus-production CAPSTONE: compose the pipeline a training run
    * actually ships — exact dedup (keep lowest doc_id per identical text)
    * → near-dup clustering (d41 pairs → connected components, drop every
    * non-representative) → quality gate (d37's keep conditions) →
    * deterministic hash split (d34's buckets) — and report per (split,
    * lang) document and token counts of the SURVIVING corpus. Each stage
    * reuses the same building block its standalone query gates, so the
    * oracle (one CTE chain ending in the recursive-CTE clustering) checks
    * that the operators COMPOSE, not just that they work alone. Dataflow
    * at scale: one text-keyed shuffle (exact), the d41 inverted index +
    * the tiny CC loop, then two semi/anti joins on doc_id and one final
    * partial+final aggregation — no stage touches more than the posting
    * lists d41 already builds.
    */
  val d49CorpusClean: Q = Q(
    "d49_corpus_clean",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val exactKeep = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val pairs = Dedup.d41ShingleJaccard.run(s, dir)
        .select(col("d1"), col("d2"))
      val dropNearDup = Clustering.connectedComponents(pairs)
        .filter(col("node") =!= col("lbl"))
        .select(col("node").as("doc_id"))
      docs
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(dropNearDup, Seq("doc_id"), "left_anti")
        .filter(qualityVerdict === "keep") // d37's gate, the shared expr
        .select(splitName.as("split"),     // d34's split, the shared expr
          col("lang"), size(tokens(col("text"))).as("n_toks"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).cast("long").as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""
      WITH RECURSIVE exact_keep AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
      sh AS (
        SELECT doc_id,
          unnest(list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
            THEN [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                  for i in range(1, len(words)-1)]
            ELSE [text] END)) AS s
        FROM (SELECT doc_id, text, string_split(text,' ') AS words FROM documents) w),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pruned AS (
        SELECT * FROM sh
        WHERE s NOT IN (SELECT s FROM sh GROUP BY s HAVING count(*) > 50)),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT d1, d2 FROM shared
          JOIN sizes s1 ON d1 = s1.doc_id
          JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(shared AS DOUBLE)/(s1.n + s2.n - shared) >= 0.2),
      edges AS (
        SELECT d1 AS src, d2 AS dst FROM pairs
        UNION ALL SELECT d2, d1 FROM pairs),
      walk(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node),
      drop_near AS (
        SELECT node AS doc_id FROM walk GROUP BY node
        HAVING node <> min(lbl)),
      kept AS (
        SELECT d.doc_id, d.lang, d.text,
          len(string_split(d.text,' ')) AS n_toks
        FROM documents d
        JOIN exact_keep k ON d.doc_id = k.doc_id
        WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_near)
          AND len(string_split(d.text,' ')) BETWEEN 5 AND 5000
          AND CAST(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
              / length(d.text) <= 0.1
          AND len(list_filter(string_split(d.text,' '),
               x -> x IN ('the','a','of','and','to','in'))) > 0)
      SELECT split, lang, count(*) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS n_tokens
      FROM (
        SELECT lang, n_toks,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80 THEN 'train'
               WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM kept) t
      GROUP BY split, lang ORDER BY split, lang"""))

  /** Deterministic sequence packing (the batch-assembly step before
    * training: concatenate the token stream in doc_id order and chunk it
    * into fixed `SeqLen`-token sequences): each document's bin is its
    * running token offset divided by the bin capacity — the contiguous
    * concat-then-chunk layout, reproducible on any cluster because the
    * order key is explicit.
    *
    * The global running offset is the classic TWO-PHASE distributed
    * prefix sum, never a global-order window (which would funnel the
    * whole corpus through one partition): phase 1 cumsums WITHIN each
    * doc_id-range shard (a partitioned window), phase 2 turns per-shard
    * totals into shard prefix offsets — #shards rows, broadcast back —
    * and the global offset is shard_prefix + local_cumsum. Equivalent to
    * the oracle's single global cumsum because shard order follows
    * doc_id order. Reports per-bin document counts and fill (only the
    * tail bin may be under-full).
    */
  val d50SequencePacking: Q = Q(
    "d50_sequence_packing",
    (s, dir) => {
      val SeqLen = 2048L
      val ShardSize = 1000L
      // referenced twice (shard totals + final join): persist the tokenized
      // cumsum'd frame so the scan + split(text) run once, release after
      // the tiny per-bin result materializes
      val local = t(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"),
          expr(s"doc_id div $ShardSize").as("shard")) // integer div, not double
        .withColumn("local_end",
          sum(col("n_toks")).over(Window.partitionBy(col("shard"))
            .orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // per-shard totals → exclusive prefix offsets: #shards rows, so this
      // one global-order window is broadcast-sized at any corpus scale
      val prefixes = local.groupBy(col("shard"))
        .agg(sum(col("n_toks")).as("tot"))
        .withColumn("prefix",
          coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("prefix"))
      val res = local.join(broadcast(prefixes), "shard")
        .select(col("doc_id"), col("n_toks"),
          ((col("prefix") + col("local_end") - col("n_toks")) / SeqLen)
            .cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_toks")).cast("long").as("n_tokens"))
        .orderBy(col("bin"))
      Q.materialized(res, local)
    },
    Some("""
      SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS n_tokens
      FROM (
        SELECT doc_id, n_toks,
          CAST((sum(n_toks) OVER (ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) - n_toks) // 2048 AS BIGINT) AS bin
        FROM (SELECT doc_id, len(string_split(text,' ')) AS n_toks
              FROM documents) t) b
      GROUP BY bin ORDER BY bin"""))

  /** PII-style redaction audit: mask every digit run to '#', report the
    * redaction count and a fingerprint of the scrubbed text — the masking
    * sweep a corpus runs before release, shipped as an audit table
    * (doc_id, n_redactions, scrubbed_sha) rather than mutated text so the
    * original stays immutable. Pure per-row regex + hash, scan-bound; the
    * digit-run pattern means the same thing in Java regex and RE2.
    */
  val d51Redaction: Q = Q(
    "d51_redaction",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), "[0-9]+")).minus(1).cast("long")
            .as("n_redactions"),
          sha2(regexp_replace(col("text"), "[0-9]+", "#").cast("binary"), 256)
            .as("scrubbed_sha"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
        CAST(len(string_split_regex(text, '[0-9]+')) - 1 AS BIGINT)
          AS n_redactions,
        sha256(regexp_replace(text, '[0-9]+', '#', 'g')) AS scrubbed_sha
      FROM documents ORDER BY doc_id"""))

  /** Intra-document repetition score (the Gopher-family quality rule: a
    * document that keeps repeating the same phrases is boilerplate or
    * degenerate generation, not prose): per doc, the 3-gram multiset size,
    * its distinct count, the top gram's frequency, and the derived
    * duplicate fraction / top-gram share. Per-doc narrow aggregation over
    * the shared codegen n-gram generator (non-distinct mode) — two
    * keyed shuffles, both on doc-bounded groups, so it scales scan-bound.
    * Docs with fewer than 3 tokens have no 3-grams and drop out, both
    * engines alike.
    */
  val d47Repetition: Q = Q(
    "d47_repetition",
    (s, dir) => {
      val grams =
        Dedup.nGramPostings(t(s, dir, "documents"), n = 3, distinctPerDoc = false)
      grams.groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("n_grams"),
          count(lit(1)).cast("long").as("n_distinct"),
          max(col("c")).cast("long").as("top_freq"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"), col("top_freq"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
            .as("dup_frac"),
          (col("top_freq").cast("double") / col("n_grams")).as("top_share"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
          unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                  for i in range(1, len(words)-1)]) AS s
        FROM (SELECT doc_id, string_split(text,' ') AS words FROM documents) w
        WHERE len(words) >= 3),
      pc AS (SELECT doc_id, s, count(*) AS c FROM g GROUP BY doc_id, s)
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_grams,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(max(c) AS BIGINT) AS top_freq,
        1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_frac,
        CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share
      FROM pc GROUP BY doc_id ORDER BY doc_id"""))

  /** Cross-document repeated-span statistics (the C4-style cleanup signal:
    * a span occurring verbatim in more than one document is boilerplate —
    * headers, license blurbs, templates — and the usual policy is to drop
    * its repeats corpus-wide): per doc, its distinct 8-gram span count,
    * how many of those spans also occur in at least one other document,
    * and the shared fraction. The dataflow is the inverted-index shape:
    * span document-frequency once (group on the span's xxhash64 — strings
    * never shuffle, same trade as d41), joined back to the posting lists.
    * At 100 TB both sides are big but the join key is the 8-byte hash and
    * the df table carries two longs per distinct span.
    */
  val d48RepeatedSpans: Q = Q(
    "d48_repeated_spans",
    (s, dir) => {
      // referenced twice (df side + join side): persist the hashed posting
      // list once, release it after the tiny per-doc result materializes
      val grams = Dedup.nGramPostings(t(s, dir, "documents"), n = 8)
        .select(col("doc_id"), xxhash64(col("s")).as("hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df_ = grams.groupBy(col("hs")).agg(count(lit(1)).as("df"))
      val res = grams.join(df_, "hs")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_spans"),
          sum(when(col("df") >= 2, 1).otherwise(0)).cast("long").as("n_shared"))
        .select(col("doc_id"), col("n_spans"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_spans")).as("shared_frac"))
        .orderBy(col("doc_id"))
      Q.materialized(res, grams)
    },
    Some("""
      WITH g AS (
        SELECT DISTINCT doc_id,
          unnest([words[i]||' '||words[i+1]||' '||words[i+2]||' '||words[i+3]
                  ||' '||words[i+4]||' '||words[i+5]||' '||words[i+6]||' '||words[i+7]
                  for i in range(1, len(words)-6)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        WHERE len(words) >= 8),
      df AS (SELECT s, count(*) AS df FROM g GROUP BY s)
      SELECT g.doc_id,
        CAST(count(*) AS BIGINT) AS n_spans,
        CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          AS shared_frac
      FROM g JOIN df USING (s)
      GROUP BY g.doc_id ORDER BY g.doc_id"""))

  /** Eval-set decontamination: find training documents sharing any word
    * 8-gram with a held-out eval document (doc_id < 20 stands in for the
    * eval split) — the standard benchmark-contamination sweep a training
    * corpus runs before release. Posting lists ride the shared codegen
    * n-gram generator; the overlap is an inverted-index equi-join on the
    * gram (never eval×train), then a count per (eval, train) pair. Docs
    * shorter than the gram width contribute nothing, the usual decontam
    * minimum-length rule. At 100 TB the eval side is tiny — Spark
    * broadcasts it — and the corpus-side posting list is the only big
    * relation, scanned once.
    */
  val d38Contamination: Q = Q(
    "d38_contamination",
    (s, dir) => {
      val grams = Dedup.nGramPostings(t(s, dir, "documents"), n = 8)
      val eval_ = grams.filter(col("doc_id") < 20)
        .select(col("doc_id").as("eval_doc"), col("s"))
      val train = grams.filter(col("doc_id") >= 20)
        .select(col("doc_id").as("train_doc"), col("s"))
      train.join(broadcast(eval_), "s")
        .groupBy(col("eval_doc"), col("train_doc"))
        .agg(count(lit(1)).as("shared_ngrams"))
        .orderBy(col("eval_doc"), col("train_doc"))
    },
    Some("""
      WITH grams AS (
        SELECT DISTINCT doc_id,
          unnest([words[i]||' '||words[i+1]||' '||words[i+2]||' '||words[i+3]
                  ||' '||words[i+4]||' '||words[i+5]||' '||words[i+6]||' '||words[i+7]
                  for i in range(1, len(words)-6)]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        WHERE len(words) >= 8)
      SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc,
        count(*) AS shared_ngrams
      FROM grams e JOIN grams t ON e.g = t.g
      WHERE e.doc_id < 20 AND t.doc_id >= 20
      GROUP BY 1, 2 ORDER BY eval_doc, train_doc"""))

  /** Winnowing fingerprints (rolling-hash family, Schleimer et al. 2003):
    * hash every char k-gram with the cross-engine [[Dedup.mh60]] md5 hash,
    * then keep the minimum hash of each sliding window of w consecutive
    * k-gram hashes. Guarantees any shared substring of length ≥ w+k-1
    * yields a shared fingerprint — the plagiarism/near-dup primitive that,
    * unlike MinHash, localizes WHERE the overlap is. The window selection
    * is a pure VALUE min (no positional tie rule), so with the portable
    * base hash the whole fingerprint set is hash-oracled. Per-row narrow
    * compute; output is the (doc, fingerprint) posting list a pair-join
    * consumes.
    */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame,
      k: Int = 20, w: Int = 8): org.apache.spark.sql.DataFrame = {
    val n = length(col("text"))
    // DATAFLOW form, not per-row HOF arrays: explode the gram positions,
    // hash each gram in a codegen'd projection (md5 inside a `transform`
    // lambda runs interpreted — measured ~60% slower), and take window
    // mins with a doc-keyed ROWS frame. Q.spread already hash-partitions
    // on doc_id, so the window adds no exchange; the shuffle payload is
    // narrow (doc_id, i, gh) rows, never the replicated text.
    val wMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i")).rowsBetween(0, w - 1)
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    Q.spread(docs, "doc_id")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(n - (k - 1), lit(1)))).as("i"))
      .select(col("doc_id"), col("i"),
        Dedup.mh60(col("text").substr(col("i"), lit(k))).as("gh"))
      .withColumn("fp", min(col("gh")).over(wMin))
      .withColumn("ng", count(lit(1)).over(wDoc))
      .filter(col("i") <= greatest(col("ng") - (w - 1), lit(1)))
      .select(col("doc_id"), col("fp").as("fingerprint"))
      .distinct()
  }

  /** Winnowing near-dup pairs over documents: docs sharing ≥ 20
    * fingerprints. Fingerprints occurring in more than 50 docs are dropped
    * first (stop-fingerprint pruning) — they carry no signal and their
    * posting lists would join quadratically; this is the same guard a
    * plagiarism index needs at corpus scale. r10: FULLY HASH-ORACLED via
    * the md5 base hash (the oracle replays grams, window mins, pruning,
    * and the pair join; its per-position md5 and window-frame min mirror
    * the Spark HOF arithmetic exactly); WinnowSpec pins planted overlap.
    */
  val d33Winnow: Q = Q(
    "d33_winnow",
    (s, dir) => {
      val fp = winnowFingerprints(t(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = fp.groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > 50)
        .select(col("fingerprint"))
      val pruned = fp.join(broadcast(hot), Seq("fingerprint"), "left_anti")
      val res = pruned.as("a")
        .join(pruned.as("b"),
          col("a.fingerprint") === col("b.fingerprint") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(countDistinct(col("a.fingerprint")).as("shared_fps"))
        .filter(col("shared_fps") >= 20)
        .orderBy(col("d1"), col("d2"))
      Q.materialized(res, fp)
    },
    Some(s"""
      WITH g AS (
        SELECT doc_id, i, ${Dedup.sqlMh("substr(text, i, 20)")} AS gh
        FROM (SELECT doc_id, text,
                unnest(range(1, greatest(len(text) - 19, 1) + 1)) AS i
              FROM documents) p),
      wm AS (
        SELECT doc_id, i,
          min(gh) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
          count(*) OVER (PARTITION BY doc_id) AS ng
        FROM g),
      fps AS (
        SELECT DISTINCT doc_id, fp AS fingerprint
        FROM wm WHERE i <= greatest(ng - 7, 1)),
      pruned AS (
        SELECT * FROM fps
        WHERE fingerprint NOT IN (
          SELECT fingerprint FROM fps GROUP BY 1 HAVING count(*) > 50))
      SELECT a.doc_id AS d1, b.doc_id AS d2,
        CAST(count(DISTINCT a.fingerprint) AS BIGINT) AS shared_fps
      FROM pruned a JOIN pruned b
        ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(DISTINCT a.fingerprint) >= 20
      ORDER BY d1, d2"""))

  /** Canonical-text fingerprint: normalize (lowercase, strip punctuation,
    * collapse whitespace) then md5 — the cheap exact-dup key for content
    * that differs only in formatting. Groups by fingerprint to count dupes.
    */
  val d32Fingerprint: Q = Q(
    "d32_fingerprint",
    (s, dir) => {
      val normalized = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      t(s, dir, "documents")
        .select(col("doc_id"), md5(normalized).as("fingerprint"))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("fingerprint"))
    },
    Some("""
      SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
        count(*) AS n_docs, min(doc_id) AS first_doc
      FROM documents
      GROUP BY 1 ORDER BY fingerprint"""))
}
