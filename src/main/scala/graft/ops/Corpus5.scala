package graft.ops

import org.apache.spark.sql.functions._
import Q.t

/** Fifth corpus-curation pack: sampling-policy arithmetic. d39/d66/d81
  * decide WHAT goes into a mix; this pack covers the standard published
  * policy transforms applied to those counts — starting with
  * temperature-scaled source weighting (the multilingual-corpus
  * flattening rule, weights ∝ countᵝ with β = 1/T < 1).
  */
object Corpus5 {

  def pack: Seq[Q] = Seq(d88TemperatureMix, d89FimSplit,
    d90TokenizerFertility, d91DedupSurvivorship, d92HeldoutPerplexity,
    d93FeatureHashEmbed, d94ContrastivePairs, d95CanaryRoundtrip)

  /** d95: CANARY WATERMARK ROUND TRIP — the memorization-probe workflow
    * (Carlini et al.'s secret-sharer canaries): plant a unique marker
    * token in a hash-selected 2% of documents, run DETECTION as a
    * separate scan (regex extract → join back to the expected plant
    * list), and report per source that every canary — and nothing
    * else — was recovered. A pipeline that can't prove its canaries
    * round-trip can't measure leakage downstream; the exactly-one
    * detection contract is what the report certifies.
    *
    * Determinism: the plant set is a Knuth-hash predicate of doc_id;
    * the marker payload is the doc's md5 prefix — both engines emit
    * identical planted text, so detection is replayable.
    *
    * Scale shape: planting is a stateless map; detection is one regex
    * extract + a doc-keyed join of two O(planted) sets; census is
    * |sources| rows.
    */
  val d95CanaryRoundtrip: Q = Q(
    "d95_canary_roundtrip",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("source"), col("text"),
          (pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
            lit(50L)) === 0L).as("plant"))
      val planted = docs.select(col("doc_id"), col("source"),
        when(col("plant"),
          concat(col("text"), lit(" canary_"),
            substring(md5(col("doc_id").cast("string")), 1, 8)))
          .otherwise(col("text")).as("text"),
        col("plant"))
      val detected = planted
        .select(col("doc_id"),
          regexp_extract(col("text"), "canary_([0-9a-f]{8})", 1)
            .as("payload"))
        .filter(col("payload") =!= "")
        .select(col("doc_id"), lit(1L).as("hit"),
          (col("payload") ===
            substring(md5(col("doc_id").cast("string")), 1, 8))
            .as("payload_ok"))
      planted.join(detected, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("plant"), 1L).otherwise(0L)).as("n_planted"),
          sum(coalesce(col("hit"), lit(0L))).as("n_detected"),
          sum(when(coalesce(col("payload_ok"), lit(true)), 0L)
            .otherwise(1L)).as("n_corrupted"))
        .select(col("source"), col("n_docs"), col("n_planted"),
          col("n_detected"), col("n_corrupted"),
          when(col("n_planted") === col("n_detected") &&
            col("n_corrupted") === 0, "recovered")
            .otherwise("LEAK_CHECK_FAILED").as("verdict"))
        .orderBy(col("source"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, source, text,
          ((doc_id % 1000000007) * 2654435761) % 50 = 0 AS plant
        FROM documents),
      planted AS (
        SELECT doc_id, source, plant,
          CASE WHEN plant THEN text || ' canary_' ||
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               ELSE text END AS text
        FROM docs),
      detected AS (
        SELECT doc_id, 1 AS hit,
          regexp_extract(text, 'canary_([0-9a-f]{8})', 1) =
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS payload_ok
        FROM planted
        WHERE regexp_extract(text, 'canary_([0-9a-f]{8})', 1) <> '')
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN plant THEN 1 ELSE 0 END) AS BIGINT)
          AS n_planted,
        CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_detected,
        CAST(sum(CASE WHEN coalesce(payload_ok, true) THEN 0 ELSE 1 END)
             AS BIGINT) AS n_corrupted,
        CASE WHEN sum(CASE WHEN plant THEN 1 ELSE 0 END) =
                  sum(coalesce(hit, 0))
              AND sum(CASE WHEN coalesce(payload_ok, true) THEN 0
                           ELSE 1 END) = 0
             THEN 'recovered' ELSE 'LEAK_CHECK_FAILED' END AS verdict
      FROM planted LEFT JOIN detected USING (doc_id)
      GROUP BY source ORDER BY source"""))

  /** d94: CONTRASTIVE PAIR MINING — the (anchor, partner, label)
    * training set a bi-encoder needs, built with zero model state:
    * positives are d91's head-key duplicate partners (documents sharing
    * their opening 6 tokens — the same weak-supervision trick as
    * Inverse Cloze / neighboring-chunk positives), one hash-picked
    * negative per anchor (Knuth hash of the anchor id modulo the corpus,
    * kept only if it is a genuine non-partner). Fully deterministic:
    * the dataset is reproducible lineage, not a sampler's accident.
    *
    * Scale shape: positives come from the d91 keyed group (pairs only
    * within a head-key group — amplification bounded by group sizes);
    * negatives are a keyed self-join on the hashed id, then one
    * anti-condition filter. No global state.
    */
  val d94ContrastivePairs: Q = Q(
    "d94_contrastive_pairs",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"),
          md5(concat_ws(" ",
            slice(split(col("text"), " "), 1, 6))).as("h"))
        .persist()
      val n = docs.agg(count(lit(1)).as("n"))
      val pos = docs.as("a").join(docs.as("b"),
          col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("anchor"),
          col("b.doc_id").as("partner"), lit(1).as("label"))
      val negCand = pos.select(col("anchor")).distinct()
        .crossJoin(broadcast(n))
        .select(col("anchor"),
          expr("((anchor % 1000000007) * 2654435761) % n").as("partner"))
      // keep only genuine negatives: not self, not a head-key partner
      val neg = negCand
        .join(docs.select(col("doc_id").as("anchor"), col("h").as("ha")),
          "anchor")
        .join(docs.select(col("doc_id").as("partner"),
          col("h").as("hp")), "partner")
        .filter(col("anchor") =!= col("partner") &&
          col("ha") =!= col("hp"))
        .select(col("anchor"), col("partner"), lit(0).as("label"))
      val out = pos.unionAll(neg)
        .orderBy(col("anchor"), col("label").desc, col("partner"))
        .localCheckpoint(true)
      docs.unpersist()
      out
    },
    Some("""
      WITH docs AS MATERIALIZED (
        SELECT doc_id,
          md5(array_to_string(list_slice(string_split(text, ' '), 1, 6),
              ' ')) AS h
        FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
      pos AS (
        SELECT a.doc_id AS anchor, b.doc_id AS partner, 1 AS label
        FROM docs a JOIN docs b
          ON a.h = b.h AND a.doc_id < b.doc_id),
      negcand AS (
        SELECT anchor,
          ((anchor % 1000000007) * 2654435761) % n AS partner
        FROM (SELECT DISTINCT anchor FROM pos) p CROSS JOIN n),
      neg AS (
        SELECT nc.anchor, nc.partner, 0 AS label
        FROM negcand nc
        JOIN docs da ON nc.anchor = da.doc_id
        JOIN docs dp ON nc.partner = dp.doc_id
        WHERE nc.anchor <> nc.partner AND da.h <> dp.h)
      SELECT anchor, partner, label FROM (
        SELECT * FROM pos UNION ALL SELECT * FROM neg) t
      ORDER BY anchor, label DESC, partner"""))

  /** d93: FEATURE-HASHED CHUNK EMBEDDINGS — the hashing-trick
    * (Weinberger et al. 2009) vectorizer on RAG-style 32-token chunks:
    * each token lands in dimension md5-nibble₁ (0..15) with a ±1 sign
    * from md5-nibble₂, so every chunk gets a 16-dim integer sketch with
    * ZERO trained state — the fully deterministic embedder a corpus
    * pipeline can run before any model exists, and the one embedding
    * family whose bytes both engines reproduce exactly (the float
    * embedders are oracled via grids; this one needs none). Long-format
    * output (chunk, dim, value) + per-chunk norm² for doc_id < 20.
    *
    * Scale shape: posexplode → per-row nibble arithmetic (codegen'd
    * string ops) → one (doc, chunk, dim)-keyed aggregate and one
    * chunk-keyed norm rollup. No joins wider than the chunk key.
    */
  val d93FeatureHashEmbed: Q = Q(
    "d93_feature_hash_embed",
    (s, dir) => {
      val toks = Q.spread(t(s, dir, "documents"), "doc_id")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), expr("pos div 32").as("chunk_id"),
          expr("instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1")
            .cast("long").as("dim"),
          when(substring(md5(col("tok")), 2, 1) < "8", 1L)
            .otherwise(-1L).as("sgn"))
      val dims = toks.groupBy(col("doc_id"), col("chunk_id"), col("dim"))
        .agg(sum(col("sgn")).as("v"))
      val norms = dims.groupBy(col("doc_id"), col("chunk_id"))
        .agg(sum(col("v") * col("v")).as("norm2"))
      dims.join(norms, Seq("doc_id", "chunk_id"))
        .select(col("doc_id"), col("chunk_id"), col("dim"), col("v"),
          col("norm2"))
        .orderBy(col("doc_id"), col("chunk_id"), col("dim"))
    },
    Some("""
      WITH toks AS MATERIALIZED (
        SELECT doc_id, (pos - 1) // 32 AS chunk_id,
          CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
               AS BIGINT) AS dim,
          CASE WHEN substr(md5(tok), 2, 1) < '8' THEN 1 ELSE -1 END AS sgn
        FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
            generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents WHERE doc_id < 20) t),
      dims AS (
        SELECT doc_id, chunk_id, dim, CAST(sum(sgn) AS BIGINT) AS v
        FROM toks GROUP BY doc_id, chunk_id, dim),
      norms AS (
        SELECT doc_id, chunk_id, CAST(sum(v * v) AS BIGINT) AS norm2
        FROM dims GROUP BY doc_id, chunk_id)
      SELECT doc_id, chunk_id, dim, v, norm2
      FROM dims JOIN norms USING (doc_id, chunk_id)
      ORDER BY doc_id, chunk_id, dim"""))

  /** d92: HELD-OUT PERPLEXITY BY LANGUAGE — train an add-1-smoothed
    * bigram LM on the d34 TRAIN split, score the VAL split, report
    * per-language mean negative log-likelihood (micro-nats) and the
    * val-bigram OOV rate. The out-of-sample twin of d56 (which scores
    * the corpus on itself) and the standard "is this slice learnable or
    * noise" data-quality metric; the d34 hash split makes train/val
    * membership a pure function both engines replay.
    *
    * Determinism: p(w₂|w₁) = (c₁₂+1)/(c₁+V) — exact integers, one IEEE
    * divide, one ln (d54 precedent); each −ln p is rounded to micro-nats
    * BEFORE the order-independent integer sum, and the per-language mean
    * divides non-negative integers (no truncate-vs-floor surface).
    *
    * Scale shape: bigrams stream through the d35 codegen window; train
    * counts are two keyed aggregates; scoring is two keyed LEFT joins
    * (val bigram → c₁₂, val w₁ → c₁) with the vocab size attached as a
    * 1-row broadcast — no per-row driver work, no V×V table anywhere.
    */
  val d92HeldoutPerplexity: Q = Q(
    "d92_heldout_perplexity",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val bg = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("lang"),
          expr("((doc_id % 1000000007) * 2654435761) % 100 < 80")
            .as("is_train"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(w))
        .filter(col("w2").isNotNull)
      val train = bg.filter(col("is_train"))
      val c12 = train.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = c1.agg(count(lit(1)).as("v"))
      bg.filter(!col("is_train"))
        .join(c12, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("lang"),
          when(col("c12").isNull, 1L).otherwise(0L).as("oov"),
          round(-log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) *
            lit(1000000.0)).cast("long").as("nll_micro"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("oov")).as("n_unseen"),
          sum(col("nll_micro")).as("snll"))
        .select(col("lang"), col("n_bigrams"),
          expr("n_unseen * 10000 div n_bigrams").as("unseen_bp"),
          expr("snll div n_bigrams").as("avg_nll_micro"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH bg AS MATERIALIZED (
        SELECT doc_id, lang,
          ((doc_id % 1000000007) * 2654435761) % 100 < 80 AS is_train,
          unnest([words[i] for i in range(1, len(words))]) AS w1,
          unnest([words[i+1] for i in range(1, len(words))]) AS w2
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS words
              FROM documents) t
        WHERE len(words) >= 2),
      c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
              FROM bg WHERE is_train GROUP BY w1, w2),
      c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
             FROM bg WHERE is_train GROUP BY w1),
      v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum(CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END) * 10000
          // CAST(count(*) AS BIGINT) AS BIGINT) AS unseen_bp,
        CAST(CAST(sum(CAST(round(-ln(
            CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE) /
            CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE)) * 1000000.0)
            AS BIGINT)) AS BIGINT)
          // CAST(count(*) AS BIGINT) AS BIGINT) AS avg_nll_micro
      FROM bg
      LEFT JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
      LEFT JOIN c1 ON bg.w1 = c1.w1
      CROSS JOIN v
      WHERE NOT is_train
      GROUP BY lang ORDER BY lang"""))

  /** d91: DEDUP SURVIVORSHIP BY SOURCE — when documents that share their
    * OPENING (first 6 tokens — the boilerplate-head key; exact full-text
    * duplicates don't exist in this corpus, shared openings do) collapse
    * under the keep-first (min doc_id) policy, which SOURCES keep their
    * documents and which get absorbed — and by whom. Per source: docs,
    * survivors, duplicates lost to the SAME source vs to ANOTHER source,
    * and the survival rate in bp. d40 counts duplicate mass; this
    * attributes it — the "source B mirrors A" evidence a mixture
    * designer acts on (cf. d76's shingle overlap for the near-dup
    * analogue).
    *
    * Scale shape: duplicate groups key on the md5 of the head (one keyed
    * aggregate); the representative (min doc_id, with ITS source carried
    * in the same packed min — one pass, no second join back to pick the
    * rep's source) re-joins the doc list on the digest key; the census
    * is |sources| rows.
    */
  val d91DedupSurvivorship: Q = Q(
    "d91_dedup_survivorship",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ",
            slice(split(col("text"), " "), 1, 6))).as("h"))
      // rep per digest: min doc_id; carry the rep's source via min on a
      // (doc_id, source) struct — lexicographic min = min doc_id's row
      val reps = docs.groupBy(col("h"))
        .agg(min(struct(col("doc_id"), col("source"))).as("rep"))
        .select(col("h"), col("rep.doc_id").as("rep_id"),
          col("rep.source").as("rep_source"))
      docs.join(reps, "h")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("rep_id"), 1L).otherwise(0L))
            .as("survivors"),
          sum(when(col("doc_id") =!= col("rep_id") &&
              col("source") === col("rep_source"), 1L).otherwise(0L))
            .as("lost_within_source"),
          sum(when(col("doc_id") =!= col("rep_id") &&
              col("source") =!= col("rep_source"), 1L).otherwise(0L))
            .as("lost_to_other_source"))
        .withColumn("survival_bp", expr("survivors * 10000 div n_docs"))
        .orderBy(col("source"))
    },
    Some("""
      WITH docs AS MATERIALIZED (
        SELECT doc_id, source,
          md5(array_to_string(list_slice(string_split(text, ' '), 1, 6),
              ' ')) AS h
        FROM documents),
      reps AS (
        SELECT h, min(doc_id) AS rep_id,
          arg_min(source, doc_id) AS rep_source
        FROM docs GROUP BY h)
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN doc_id = rep_id THEN 1 ELSE 0 END) AS BIGINT)
          AS survivors,
        CAST(sum(CASE WHEN doc_id <> rep_id AND source = rep_source
                      THEN 1 ELSE 0 END) AS BIGINT) AS lost_within_source,
        CAST(sum(CASE WHEN doc_id <> rep_id AND source <> rep_source
                      THEN 1 ELSE 0 END) AS BIGINT)
          AS lost_to_other_source,
        CAST(sum(CASE WHEN doc_id = rep_id THEN 1 ELSE 0 END) * 10000
          // CAST(count(*) AS BIGINT) AS BIGINT) AS survival_bp
      FROM docs JOIN reps USING (h)
      GROUP BY source ORDER BY source"""))

  private val FertVocab = 8

  /** d90: TOKENIZER FERTILITY AUDIT — what each language actually COSTS
    * under a vocab-limited tokenizer: occurrences of the top-8 corpus
    * tokens price at 1 token, everything else falls back to characters
    * (the byte/char-fallback every real BPE vocabulary has). Per
    * language: word and char volumes, the effective token bill, and
    * fertility in bp (effective tokens per whitespace word). d73 reports
    * the OOV RATE; this prices its CONSEQUENCE — the per-language token
    * bill that drives vocab-allocation decisions. (A pure regex count is
    * no audit here: the generator's single-space lowercase text makes
    * regex tokens ≡ whitespace words, fertility flat 10000.)
    *
    * Determinism: the vocabulary boundary is the total order
    * (count desc, token); all ratios are integer bp.
    *
    * Scale shape: one explode + the d73 top-k vocabulary
    * (TakeOrderedAndProject) broadcast back to the occurrence stream;
    * one |languages|-group aggregate with map-side combine.
    */
  val d90TokenizerFertility: Q = Q(
    "d90_tokenizer_fertility",
    (s, dir) => {
      val occ = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(FertVocab)
        .select(col("tok"), lit(1).as("in_vocab"))
      occ.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("ws_tokens"),
          sum(length(col("tok")).cast("long")).as("word_chars"),
          sum(when(col("in_vocab").isNotNull, 1L)
            .otherwise(length(col("tok")).cast("long")))
            .as("effective_tokens"))
        .select(col("lang"), col("ws_tokens"), col("word_chars"),
          col("effective_tokens"),
          expr("effective_tokens * 10000 div ws_tokens")
            .as("fertility_bp"),
          expr("effective_tokens * 10000 div word_chars")
            .as("compression_bp"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH occ AS MATERIALIZED (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, count(*) AS cnt FROM occ GROUP BY tok) t
        ORDER BY cnt DESC, tok LIMIT $FertVocab)
      SELECT lang,
        CAST(count(*) AS BIGINT) AS ws_tokens,
        CAST(sum(length(o.tok)) AS BIGINT) AS word_chars,
        CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1
                      ELSE length(o.tok) END) AS BIGINT)
          AS effective_tokens,
        CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1
                      ELSE length(o.tok) END) * 10000
          // CAST(count(*) AS BIGINT) AS BIGINT) AS fertility_bp,
        CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1
                      ELSE length(o.tok) END) * 10000
          // CAST(sum(length(o.tok)) AS BIGINT) AS BIGINT)
          AS compression_bp
      FROM occ o LEFT JOIN vocab v ON o.tok = v.tok
      GROUP BY lang ORDER BY lang"""))

  /** d88: TEMPERATURE-SCALED SOURCE MIX — per-source sampling weights
    * flattened at T=2 (w ∝ √tokens), vs the natural token-proportional
    * weights, plus the token allocation of a fixed 1M-token budget and
    * each source's resulting oversampling factor (epochs, in bp).
    *
    * T=2 is the one temperature whose power is cross-engine exact: IEEE
    * sqrt is correctly rounded in both engines, and every later step is
    * integer arithmetic on the 10⁻⁶ grid (round(√t·10⁶) → BIGINT), so
    * weights, allocations and epoch factors hash-match bit-exactly. A
    * fractional temperature would route through pow(), whose libm results
    * are not specified to the last ulp.
    *
    * Scale shape: ONE keyed aggregation over the corpus (per-source token
    * counts — map-side partial combine does almost all the work); the
    * policy arithmetic then runs on |sources| rows with the grand total
    * attached as a 1-row broadcast cross join. At 100 TB the heavy pass
    * is the same single aggregation; everything after is O(|sources|).
    */
  /** Core builder, exposed for planted-count specs: the T=2 policy table
    * over any (source, text) frame. */
  def temperatureMix(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perSource = docs
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .withColumn("grid",
        round(sqrt(col("tokens").cast("double")) * lit(1000000.0))
          .cast("long"))
    val tot = perSource.agg(sum(col("tokens")).as("tt"),
      sum(col("grid")).as("tg"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        expr("(tokens * 10000) div tt").as("natural_bp"),
        expr("(grid * 10000) div tg").as("flat_bp"),
        expr("(grid * 1000000) div tg").as("alloc_tokens"),
        expr("(((grid * 1000000) div tg) * 10000) div tokens")
          .as("epochs_bp"))
      .orderBy(col("source"))
  }

  val d88TemperatureMix: Q = Q(
    "d88_temperature_mix",
    (s, dir) => temperatureMix(Q.spread(t(s, dir, "documents"), "doc_id")),
    Some("""
      WITH per AS (
        SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
          CAST(round(sqrt(CAST(sum(len(string_split(text, ' ')))
                              AS DOUBLE)) * 1000000.0) AS BIGINT) AS grid
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
                     CAST(sum(grid) AS BIGINT) AS tg FROM per)
      SELECT source, tokens,
        CAST((tokens * 10000) // tt AS BIGINT) AS natural_bp,
        CAST((grid * 10000) // tg AS BIGINT) AS flat_bp,
        CAST((grid * 1000000) // tg AS BIGINT) AS alloc_tokens,
        CAST((((grid * 1000000) // tg) * 10000) // tokens AS BIGINT)
          AS epochs_bp
      FROM per CROSS JOIN tot ORDER BY source"""))

  /** Core builder, exposed for edge-case specs: the FIM transform over
    * any (doc_id, text) frame. */
  def fimSplit(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"),
        (pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L,
          lit(30L)) + 20).as("ap"),
        (pmod(pmod(col("doc_id") * 7919, lit(1000000007L)) * 2654435761L,
          lit(30L)) + 10).as("bp"))
      .select(col("doc_id"), col("toks"), col("n"),
        expr("(n * ap) div 100").as("p1"),
        least(expr("(n * ap) div 100 + (n * bp) div 100"), col("n"))
          .as("p2"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("p1"), col("p2"),
        (col("p2") - col("p1")).as("middle_len"),
        concat(lit("<PRE> "),
          concat_ws(" ", slice(col("toks"), lit(1), col("p1").cast("int"))),
          lit(" <SUF> "),
          concat_ws(" ", expr("slice(toks, cast(p2+1 AS INT), cast(n-p2 AS INT))")),
          lit(" <MID> "),
          concat_ws(" ",
            expr("slice(toks, cast(p1+1 AS INT), cast(p2-p1 AS INT))")))
          .as("psm_text"))
      .orderBy(col("doc_id"))

  /** d89: FIM (FILL-IN-THE-MIDDLE) TRANSFORM — rewrite each document into
    * the PSM layout (prefix, suffix, middle with sentinel markers) that
    * infilling-capable code/text models train on (Bavarian et al. 2022).
    * Split points are Knuth-hash functions of doc_id: prefix takes
    * 20-49% of tokens, middle the next 10-39% (clamped to the doc) — so
    * the transform is a pure deterministic map both engines replay
    * bit-exactly, the property a reproducible training-data pipeline
    * needs.
    *
    * Scale shape: a stateless per-row map — no shuffle at all except the
    * bounded output sort; at 100 TB this runs at scan speed with
    * whole-stage codegen (split/slice/concat are all codegen'd).
    * Reported for doc_id < 40 to keep the dump bounded; the census
    * columns (n_tokens, split points, middle_len) make truncation
    * auditable.
    */
  val d89FimSplit: Q = Q(
    "d89_fim_split",
    (s, dir) =>
      fimSplit(t(s, dir, "documents").filter(col("doc_id") < 40)),
    Some("""
      SELECT doc_id, n_tokens, p1, p2, p2 - p1 AS middle_len,
        '<PRE> ' || array_to_string(list_slice(toks, 1, p1), ' ') ||
        ' <SUF> ' || array_to_string(list_slice(toks, p2 + 1, n_tokens), ' ') ||
        ' <MID> ' || array_to_string(list_slice(toks, p1 + 1, p2), ' ')
          AS psm_text
      FROM (
        SELECT doc_id, toks, n_tokens, (n_tokens * ap) // 100 AS p1,
          least((n_tokens * ap) // 100 + (n_tokens * bp) // 100, n_tokens)
            AS p2
        FROM (
          SELECT doc_id, string_split(text, ' ') AS toks,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ((doc_id % 1000000007) * 2654435761) % 30 + 20 AS ap,
            (((doc_id * 7919) % 1000000007) * 2654435761) % 30 + 10 AS bp
          FROM documents WHERE doc_id < 40) a) b
      ORDER BY doc_id"""))
}
