package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q.t

/** Corpus-statistics operators for training-data curation, round 4:
  * token-distribution diversity (entropy), containment-based near-dup
  * (the asymmetric companion to d41's Jaccard), corpus-level unigram-LM
  * scoring, and incremental batch-vs-corpus dedup (the shape every
  * ingest-new-crawl pipeline runs). All distributed as explode → keyed
  * aggregation/join — no per-row arrays through interpreted HOFs, no
  * driver-side state.
  */
object Corpus {

  def pack: Seq[Q] =
    Seq(d52TokenEntropy, d53Containment, d54UnigramLogprob,
      d55IncrementalDedup, d56BigramLm, d58SourceReport, d59Chunking,
      d62TokenBudget)

  /** ln(2) as a shared literal: both engines divide by the same double
    * instead of each computing log(2) through its own libm.
    */
  private val Ln2 = "0.6931471805599453"

  /** One row per token INSTANCE (doc_id, tok) — the shared explode feeding
    * d52 and d54. Spread first: the per-row split+explode is the narrow
    * heavy part and the test layout scans one row group.
    */
  private def tokenRows(docs: DataFrame): DataFrame =
    Q.spread(docs, "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  /** d52: per-document token-distribution stats — type/token ratio and
    * Shannon entropy (bits). Low entropy ⇒ repetitive/templated text; the
    * Gopher-family diversity signal complementing d47's n-gram repetition.
    *
    * Parity notes: entropy uses ln only on INTEGER counts and the
    * n·ln(n)−Σc·ln(c) rearrangement, every ln term is decimal-staged so
    * the sum is order-independent, both engines divide by the same ln(2)
    * literal, and the output rounds to 6dp (libm ulp + decimal-cast
    * divergence both sit far below 1e-6 — see the parity playbook).
    */
  /** The d52 transform over any (doc_id, text) frame — exposed for
    * planted-corpus specs.
    */
  def entropyStats(docs: DataFrame): DataFrame = {
    val cnt = tokenRows(docs)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast(DecimalType(18, 12))).as("s"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"),
        round((log(col("n_tokens").cast("double")) -
          col("s").cast("double") / col("n_tokens").cast("double")) /
          lit(Ln2.toDouble), 6).as("entropy_bits"))
      .orderBy(col("doc_id"))
  }

  val d52TokenEntropy: Q = Q(
    "d52_token_entropy",
    (s, dir) => entropyStats(t(s, dir, "documents")),
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      cnt AS (
        SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
      SELECT doc_id,
        CAST(sum(c) AS BIGINT) AS n_tokens,
        count(*) AS n_distinct,
        round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
        round((ln(CAST(sum(c) AS DOUBLE)) -
               CAST(sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                 AS DECIMAL(18,12))) AS DOUBLE) / CAST(sum(c) AS DOUBLE))
              / $Ln2, 6) AS entropy_bits
      FROM cnt GROUP BY doc_id ORDER BY doc_id"""))

  /** d53: containment near-dup — |S(A)∩S(B)| / min(|S(A)|, |S(B)|) over
    * the same pruned shingle posting lists as d41. Containment catches the
    * snippet-inside-a-bigger-page duplicates Jaccard under-scores when the
    * two documents differ a lot in length (union-normalized vs
    * min-normalized). Reuses [[Dedup.hashedShingles]]' persisted hashed
    * postings and d41's stop-shingle cap; the extra output column says
    * WHICH side is the contained (smaller) document — the one a
    * containment-dedup policy would drop.
    */
  /** The lazy d53 pipeline from a persisted hashed-postings table —
    * exposed (like `Dedup.embeddingNearDupsLsh`) so specs can audit the
    * plan/results without the eager materialization in the Q entry.
    */
  def containmentPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val hot = sh.groupBy(col("hs"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.MaxShinglePostings)
      .select(col("hs"))
    val pruned = sh.join(broadcast(hot), Seq("hs"), "left_anti")
    val shared = pruned.as("a")
      .join(pruned.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("shared").cast("double") /
          least(col("s1.n"), col("s2.n"))).as("containment"),
        // tie (equal sizes) → d1, matching the oracle's CASE order
        when(col("s1.n") <= col("s2.n"), col("d1")).otherwise(col("d2"))
          .as("contained_doc"))
      .filter(col("containment") >= threshold)
      .select(col("d1"), col("d2"), round(col("containment"), 6)
        .as("containment"), col("contained_doc"))
      .orderBy(col("d1"), col("d2"))
  }

  val d53Containment: Q = Q(
    "d53_containment",
    (s, dir) => {
      val sh = Dedup.hashedShingles(t(s, dir, "documents"))
      Q.materialized(containmentPairs(sh, 0.8), sh)
    },
    Some("""
      WITH sh AS (
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
        GROUP BY 1, 2)
      SELECT d1, d2,
        round(CAST(shared AS DOUBLE)/least(s1.n, s2.n), 6) AS containment,
        CASE WHEN s1.n <= s2.n THEN d1 ELSE d2 END AS contained_doc
      FROM shared
        JOIN sizes s1 ON d1 = s1.doc_id
        JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(shared AS DOUBLE)/least(s1.n, s2.n) >= 0.8
      ORDER BY d1, d2"""))

  /** d54: corpus-unigram-LM document scoring — train a unigram language
    * model over the whole corpus (token → count), then score every
    * document by its mean token log-probability. The cheap stand-in for
    * perplexity filtering: documents far below the corpus's typical
    * logprob are gibberish/outliers, far above are boilerplate-common.
    *
    * Scale shape: the "model" is a token-keyed count table — the doc⋈vocab
    * join is key-partitioned (never broadcast: a web-scale vocab is
    * millions of rows), the per-doc mean is one keyed aggregation. The
    * grand total rides a one-row broadcast.
    */
  /** The d54 transform over any (doc_id, text) frame — exposed for
    * planted-corpus specs.
    */
  def unigramScores(docs: DataFrame): DataFrame = {
    // referenced 3x (model counts, grand total, scoring join): pay the
    // explode once — the plan otherwise re-runs it per branch
    val toks = tokenRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("total"))
    val res = toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        log(col("c").cast("double") / col("total").cast("double"))
          .cast(DecimalType(18, 12)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s").cast("double") / col("n_tokens").cast("double"), 6)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
    Q.materialized(res, toks)
  }

  val d54UnigramLogprob: Q = Q(
    "d54_unigram_logprob",
    (s, dir) => unigramScores(t(s, dir, "documents")),
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      tot AS (SELECT count(*) AS total FROM tok)
      SELECT t.doc_id, count(*) AS n_tokens,
        round(CAST(sum(CAST(ln(CAST(v.c AS DOUBLE) / CAST(tot.total AS DOUBLE))
            AS DECIMAL(18,12))) AS DOUBLE) / count(*), 6) AS mean_logprob
      FROM tok t JOIN vocab v USING (tok) CROSS JOIN tot
      GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** d55: incremental dedup — dedup a NEW batch against an EXISTING corpus
    * plus within itself, the exact shape of an ingest-new-crawl step (the
    * corpus side is only ever probed, never rewritten). Split here by
    * doc_id parity (corpus=even, batch=odd) purely to stage the scenario
    * on one table. Verdict per batch doc: `dup_of_corpus` (fingerprint
    * already in the corpus), else `dup_in_batch` (an earlier batch doc has
    * it), else `kept`. The corpus probe is a key-partitioned left join on
    * the fingerprint — at 100 TB the corpus fingerprint set is far beyond
    * broadcast range, and this join shape is exactly a shuffled semi-probe.
    */
  /** The d55 verdict transform over explicit corpus/batch frames (each
    * (doc_id, text)) — exposed for planted-corpus specs; the Q entry
    * stages the two sides by doc_id parity.
    */
  def incrementalDedup(corpusDocs: DataFrame, batchDocs: DataFrame): DataFrame = {
    val corpus = corpusDocs.select(md5(col("text")).as("fp")).distinct()
      .withColumn("in_corpus", lit(1))
    val batch = batchDocs.select(col("doc_id"), md5(col("text")).as("fp"))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    batch.join(corpus, Seq("fp"), "left")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"),
        when(col("in_corpus") === 1, "dup_of_corpus")
          .when(col("rn") > 1, "dup_in_batch")
          .otherwise("kept").as("verdict"))
      .orderBy(col("doc_id"))
  }

  val d55IncrementalDedup: Q = Q(
    "d55_incremental_dedup",
    (s, dir) => {
      // corpus text is already normalized lowercase words (see d32 for the
      // normalizing variant); the raw-text hash is the fingerprint here
      val docs = t(s, dir, "documents")
      incrementalDedup(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    },
    Some("""
      WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
      batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % 2 = 1)
      SELECT doc_id,
        CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
             WHEN row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id) > 1
               THEN 'dup_in_batch'
             ELSE 'kept' END AS verdict
      FROM batch b LEFT JOIN corpus c USING (fp)
      ORDER BY doc_id"""))

  /** The d56 transform over any (doc_id, text) frame — exposed for
    * planted-corpus specs.
    */
  def bigramScores(docs: DataFrame): DataFrame = {
    // non-distinct bigram multiset per doc, on the shared codegen
    // posexplode+lead generator (g = "w1 w2"); docs with <2 tokens emit
    // nothing and drop out of the output in both engines. Referenced 3x
    // (both model tables + the scoring join): pay the window pass once.
    val bg = Dedup.nGramPostings(docs, 2, distinctPerDoc = false)
      .select(col("doc_id"), col("s").as("g"),
        split(col("s"), " ").getItem(0).as("w1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bg.groupBy(col("g")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val res = bg.join(c12, "g").join(c1, "w1")
      .select(col("doc_id"),
        log(col("c12").cast("double") / col("c1").cast("double"))
          .cast(DecimalType(18, 12)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("mean_logprob"))
      .orderBy(col("doc_id"))
    Q.materialized(res, bg)
  }

  /** d56: bigram-LM document scoring — the conditional-probability step up
    * from d54's unigram model: score each document by the mean
    * ln P(w₂|w₁) = ln(c(w₁w₂)/c(w₁·)) under corpus-wide bigram MLE counts.
    * Documents whose transitions are corpus-atypical (scrambled or
    * machine-mangled text) score low even when their unigram mix looks
    * normal — the cheap proxy for LM-perplexity filtering. Same scale
    * shape as d54 with the model table keyed by bigram: counts are keyed
    * aggregations, scoring is a key-partitioned join, nothing broadcast
    * except nothing.
    */
  val d56BigramLm: Q = Q(
    "d56_bigram_lm",
    (s, dir) => bigramScores(t(s, dir, "documents")),
    Some("""
      WITH bg AS (
        SELECT doc_id, unnest([words[i] || ' ' || words[i+1]
                               for i in range(1, len(words))]) AS g,
          unnest([words[i] for i in range(1, len(words))]) AS w1
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t
        WHERE len(words) >= 2),
      c12 AS (SELECT g, count(*) AS c12 FROM bg GROUP BY g),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1)
      SELECT doc_id, count(*) AS n_bigrams,
        round(CAST(sum(CAST(ln(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
            AS DECIMAL(18,12))) AS DOUBLE) / count(*), 6) AS mean_logprob
      FROM bg JOIN c12 USING (g) JOIN c1 USING (w1)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** d58: per-(source, lang) corpus report card — document counts, exact
    * duplicate rate, mean length, and the d37 quality-gate pass rate,
    * grouped by the provenance metadata columns. The first thing a data
    * lead asks of a new crawl ("which sources are worth keeping?") and a
    * pure two-key aggregation: one shuffle on the (source, lang) pair,
    * partial aggs map-side, output O(sources × langs).
    */
  val d58SourceReport: Q = Q(
    "d58_source_report",
    (s, dir) =>
      Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("source"), col("lang"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          when(TextAnalysis.qualityVerdict === "keep", 1L).otherwise(0L)
            .as("keep"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_unique"),
          sum(col("n_toks")).as("tot_toks"),
          sum(col("keep")).cast("long").as("n_keep"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_unique"),
          round(lit(1.0) - col("n_unique").cast("double") /
            col("n_docs").cast("double"), 6).as("dup_rate"),
          round(col("tot_toks").cast("double") /
            col("n_docs").cast("double"), 6).as("mean_tokens"),
          round(col("n_keep").cast("double") /
            col("n_docs").cast("double"), 6).as("keep_rate"))
        .orderBy(col("source"), col("lang")),
    Some("""
      SELECT source, lang, count(*) AS n_docs,
        count(DISTINCT text) AS n_unique,
        round(1.0 - count(DISTINCT text) / CAST(count(*) AS DOUBLE), 6)
          AS dup_rate,
        round(CAST(sum(len(string_split(text,' '))) AS DOUBLE)
          / count(*), 6) AS mean_tokens,
        round(CAST(sum(CASE
          WHEN len(string_split(text,' ')) < 5 THEN 0
          WHEN len(string_split(text,' ')) > 5000 THEN 0
          WHEN CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) > 0.1 THEN 0
          WHEN len(list_filter(string_split(text,' '),
               x -> x IN ('the','a','of','and','to','in'))) = 0 THEN 0
          ELSE 1 END) AS DOUBLE) / count(*), 6) AS keep_rate
      FROM documents
      GROUP BY source, lang ORDER BY source, lang"""))

  /** d59: sliding-window chunking — split each document into fixed-size
    * token windows with overlap (the tokenize-and-chunk step feeding a
    * pretraining or retrieval pipeline; d50 packs WHOLE docs into bins,
    * this cuts WITHIN docs). Window starts step by `Stride` from 0 while
    * inside the doc; the final window is allowed to run short. Entirely
    * per-row: split once, explode the start sequence, slice — no shuffle
    * at all until the output sort, which a real pipeline wouldn't have.
    * Chunk text is reported as md5 + length (the downstream contract is
    * usually "hash + span", and it keeps the compare payload narrow).
    */
  val ChunkSize = 32
  val Stride = 24

  /** The d59 transform over any (doc_id, text) frame. */
  def chunks(docs: DataFrame): DataFrame =
    Q.spread(docs, "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      // generator in its own projection: a lateral alias (`n` defined and
      // consumed in one select) under explode trips an analyzer internal
      // error in Spark 4.1
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(Stride))).as("s"))
      .select(col("doc_id"), (col("s") / Stride).cast("int").as("chunk_id"),
        // the window length is arithmetic on columns already in hand — no
        // re-splitting of the joined chunk string just to count it
        least(lit(ChunkSize.toLong), (col("n") - col("s")).cast("long"))
          .as("n_tokens"),
        array_join(slice(col("toks"), col("s") + 1, lit(ChunkSize)), " ")
          .as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val d59Chunking: Q = Q(
    "d59_chunking",
    (s, dir) => chunks(t(s, dir, "documents")),
    Some(s"""
      SELECT doc_id, CAST(s // $Stride AS INT) AS chunk_id,
        CAST(len(chunk) AS BIGINT) AS n_tokens,
        md5(array_to_string(chunk, ' ')) AS chunk_md5
      FROM (
        SELECT doc_id, s, words[s+1 : least(s+$ChunkSize, n)] AS chunk
        FROM (
          SELECT doc_id, string_split(text, ' ') AS words,
            len(string_split(text, ' ')) AS n,
            unnest(range(0, len(string_split(text, ' ')), $Stride)) AS s
          FROM documents) t)
      ORDER BY doc_id, chunk_id"""))

  /** d62: token-budget sampling — cap each language at a fixed token
    * BUDGET (not a doc rate, which is d39's mixing knob): order each
    * language's documents by a deterministic multiplicative doc_id hash
    * (the d34/d39 family with its own additive salt, so the budget
    * ordering is independent of the split/mix streams), run a cumulative
    * token sum in that order, and keep documents while the running total
    * stays within budget. This is how pre-training data is provisioned
    * ("20B tokens of fr") — and because a language is a LOW-cardinality
    * partition key, the cumsum is the d50 TWO-PHASE distributed prefix
    * sum, never a per-language global window (which would funnel one
    * language's billions of rows through a single task): phase 1 cumsums
    * within (lang, h-range shard); phase 2 turns per-shard totals into
    * shard prefix offsets — langs × shards rows, broadcast back. Shards
    * are h-RANGE buckets, so shard order follows the hash order and the
    * result equals the oracle's single window exactly.
    */
  val TokenBudget = 3000L
  private val BudgetSalt = 29L
  private val HashP = 1000000007L
  private val BudgetShards = 64L
  private val ShardWidth = HashP / BudgetShards + 1

  /** The d62 transform over any (doc_id, lang, text) frame. */
  def tokenBudget(docs: DataFrame, budget: Long): DataFrame = {
    // full-resolution ordering hash (not the mod-100 bucket): product of
    // pre-modded factors stays < 2^62, see d34 on the overflow discipline
    val h = pmod(
      pmod(col("doc_id"), lit(HashP)) * lit(2654435761L) + lit(BudgetSalt),
      lit(HashP))
    val local = Q.spread(docs, "doc_id")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        h.as("h"))
      .withColumn("shard", expr(s"h div $ShardWidth"))
      .withColumn("local_cum",
        sum(col("n_tokens")).over(Window.partitionBy(col("lang"), col("shard"))
          .orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-(lang, shard) totals → exclusive prefix offsets: langs × shards
    // rows, so this per-lang ordered window is broadcast-sized at any scale
    val prefixes = local.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("prefix",
        coalesce(sum(col("tot")).over(Window.partitionBy(col("lang"))
          .orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("shard"), col("prefix"))
    val res = local.join(broadcast(prefixes), Seq("lang", "shard"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("prefix") + col("local_cum")).as("cum_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("kept"))
      .orderBy(col("doc_id"))
    Q.materialized(res, local)
  }

  val d62TokenBudget: Q = Q(
    "d62_token_budget",
    (s, dir) => tokenBudget(t(s, dir, "documents"), TokenBudget),
    Some(s"""
      SELECT doc_id, lang, n_tokens,
        CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
        sum(n_tokens) OVER w <= $TokenBudget AS kept
      FROM (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          ((doc_id % $HashP) * 2654435761 + $BudgetSalt) % $HashP AS h
        FROM documents) t
      WINDOW w AS (PARTITION BY lang ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY doc_id"""))
}
