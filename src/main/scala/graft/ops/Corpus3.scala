package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.t

/** Corpus-curation additions, round 6 (continuation): classifier-based
  * quality filtering (the fastText-style linear scorer gating web corpora
  * in GPT-3/LLaMA-class pipelines) and the pair-counting step of BPE
  * tokenizer training (Sennrich et al. 2016).
  */
object Corpus3 {

  def pack: Seq[Q] = Seq(d69ClassifierQuality, d70BpePairCounts,
    d71BpeMergeRound, d72SpanCorruption, d73VocabCoverage,
    d74WeightedSystematic, d75SplitBalance)

  /** Deterministic integer token weight in [−50, 50] — the stand-in for a
    * LEARNED lexicon weight (a real pipeline loads these from training;
    * the arithmetic stand-in keeps the whole dataflow oracle-checkable).
    * Everything downstream of the weight table — the broadcast lexicon
    * join, the per-document occurrence-weighted sum, the threshold verdict
    * — is exactly the production shape.
    */
  private val weightSql =
    "((ascii(tok) * 131 + length(tok) * 37) * 2654435761 % 1000003) % 101 - 50"

  /** d69: CLASSIFIER-BASED QUALITY FILTERING — score every document with a
    * linear text classifier (Σ over token OCCURRENCES of the token's
    * lexicon weight) and gate on the sign, the fastText-style quality
    * filter used to select "reference-like" web documents. The lexicon is
    * built once (distinct tokens → weight) and BROADCAST to the
    * occurrence stream: the join is per-occurrence but moves only the
    * bounded vocabulary, never the corpus — at 100 TB the vocabulary is
    * millions of rows while the corpus is billions, so dim-side broadcast
    * (or a shuffled join keyed on token for an outsized vocab) keeps the
    * fact side narrow. Mean score is integer-scaled (×100, integer div) —
    * no float surface anywhere.
    */
  val d69ClassifierQuality: Q = Q(
    "d69_classifier_quality",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
      val occ = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val lexicon = occ.select(col("tok")).distinct()
        .withColumn("w", expr(weightSql))
      occ.join(broadcast(lexicon), "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
        .select(col("doc_id"), col("n_tokens"), col("score"),
          expr("score * 100 div n_tokens").as("mean_score_x100"),
          when(col("score") > 0, "keep").otherwise("drop").as("verdict"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH occ AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      lexicon AS (
        SELECT tok, $weightSql AS w FROM (SELECT DISTINCT tok FROM occ)),
      scored AS (
        SELECT doc_id, count(*) AS n_tokens,
          CAST(sum(w) AS BIGINT) AS score
        FROM occ JOIN lexicon USING (tok) GROUP BY doc_id)
      SELECT doc_id, n_tokens, score,
        score * 100 // n_tokens AS mean_score_x100,
        CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS verdict
      FROM scored ORDER BY doc_id"""))

  /** The d70 core over any (doc_id, text) frame — exposed for the planted
    * known-counts spec.
    */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame = {
    val occ = docs.select(
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    // adjacent symbol pairs = the 2-char substrings; single-char tokens
    // have none (guarded: Spark's sequence(1,0) would run DESCENDING)
    val pairs = occ.filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
    pairs.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** d70: BPE TOKENIZER TRAINING, the pair-counting iteration — count
    * every adjacent symbol pair across the corpus (initial vocabulary =
    * characters, so pairs are the 2-char substrings of each token
    * occurrence) and emit the top-k merge candidates; the argmax pair IS
    * the merge BPE learns next (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units").
    *
    * Scale shape: one narrow per-row expansion (length−1 pairs per token,
    * codegen'd transform+explode — no shuffle), one keyed count whose
    * key space is bounded by the SYMBOL-PAIR vocabulary (≤ |alphabet|²
    * initially), and a global top-k via orderBy+limit, which Spark plans
    * as TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows) — never a global sort. (count DESC, pair) is a total order, so
    * the k-boundary is deterministic in both engines.
    */
  val d70BpePairCounts: Q = Q(
    "d70_bpe_pair_counts",
    (s, dir) => bpePairCounts(Q.spread(t(s, dir, "documents"), "doc_id"), 20),
    Some("""
      WITH occ AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      pairs AS (
        SELECT substring(tok, i, 2) AS pair
        FROM occ, unnest(range(1, length(tok))) AS u(i)
        WHERE length(tok) >= 2)
      SELECT pair, count(*) AS cnt FROM pairs
      GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20"""))

  /** The merged-symbol marker: one char NOT in the lowercase-ASCII corpus
    * alphabet, so replacing the winning 2-char pair with it keeps the
    * 1-symbol = 1-char invariant the pair extraction relies on.
    */
  private val MergeMark = "Æ"

  /** The d71 core over any (doc_id, text) frame — exposed for specs:
    * returns (merged_pair, pair, cnt) — the applied merge and the NEXT
    * round's top-k candidates.
    */
  def bpeMergeRound(docs: DataFrame, k: Int): DataFrame = {
    val occ = docs.select(
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    def pairsOf(o: DataFrame) = o.filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
    val top1 = pairsOf(occ)
      .orderBy(col("cnt").desc, col("pair")).limit(1)
      .select(col("pair").as("merged_pair"))
    val merged = occ.crossJoin(broadcast(top1))
      .select(expr(s"replace(tok, merged_pair, '$MergeMark')").as("tok"),
        col("merged_pair"))
    pairsOf(merged.select(col("tok")))
      .crossJoin(broadcast(top1))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
      .select(col("merged_pair"), col("pair"), col("cnt"))
  }

  /** d71: one COMPLETE BPE training round — count pairs, pick the argmax
    * merge (d70's winner), APPLY it corpus-wide (non-overlapping
    * left-to-right literal replace, the BPE greedy-merge semantics both
    * engines implement identically), and emit the next round's top-k
    * candidates. d70 pins the counting; this pins the count→argmax→apply
    * →recount composition that the full tokenizer-training loop iterates.
    * The merge application is a narrow per-row pass (the 1-row winner is
    * broadcast); everything else is d70's shape.
    */
  val d71BpeMergeRound: Q = Q(
    "d71_bpe_merge_round",
    (s, dir) => bpeMergeRound(Q.spread(t(s, dir, "documents"), "doc_id"), 20),
    Some(s"""
      WITH occ AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      pc AS (
        SELECT substring(tok, i, 2) AS pair, count(*) AS cnt
        FROM occ, unnest(range(1, length(tok))) AS u(i)
        GROUP BY 1),
      top1 AS (SELECT pair FROM pc ORDER BY cnt DESC, pair LIMIT 1),
      merged AS (
        SELECT replace(tok, (SELECT pair FROM top1), '$MergeMark') AS tok
        FROM occ)
      SELECT (SELECT pair FROM top1) AS merged_pair,
        substring(tok, i, 2) AS pair, count(*) AS cnt
      FROM merged, unnest(range(1, length(tok))) AS u(i)
      GROUP BY 1, 2 ORDER BY cnt DESC, pair LIMIT 20"""))

  // d72 span-corruption geometry: a span STARTS where the (doc, pos) hash
  // lands in 1/11 of the key space, and covers SpanLen consecutive tokens.
  // Expected corruption rate ≈ SpanLen/11 ≈ 27% (T5 uses 15%; the rate is
  // a hyperparameter, the LAYOUT dataflow is what this operator is).
  private val SpanEvery = 11L
  private val SpanLen = 3
  private val SpanHashA = 2654435761L
  private val SpanHashB = 40503L

  /** The d72 core over any (doc_id, text) frame — exposed for specs. */
  def spanCorruption(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    val nTok = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val starts = toks.filter(
      expr(s"((doc_id % 1000003) * $SpanHashA + pos * $SpanHashB) % $SpanEvery")
        === 0)
      .select(col("doc_id"), col("pos"))
    val masked = starts
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${SpanLen - 1})")).as("mpos"))
      .distinct()
      .join(nTok, "doc_id")
      .filter(col("mpos") < col("n_tokens")) // spans clip at the doc end
    val spanAgg = starts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    val maskAgg = masked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_masked"),
        sum(expr("mpos * 2654435761 % 1000003")).as("mask_fingerprint"))
    nTok.join(spanAgg, Seq("doc_id"), "left")
      .join(maskAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        expr("coalesce(n_masked, 0) * 10000 div n_tokens").as("mask_bp"),
        coalesce(col("mask_fingerprint"), lit(0L)).as("mask_fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** d72: SPAN-CORRUPTION LAYOUT (T5-style denoising, Raffel et al. 2020)
    * — choose mask spans over each document's token sequence and report
    * the corruption geometry per doc: span count, masked-token count
    * (overlapping spans merge, spans clip at the doc end), corruption
    * rate in basis points, and an integer fingerprint of the exact masked
    * positions so the oracle pins WHICH tokens masked, not just how many.
    * Span starts come from a deterministic (doc_id, pos) hash — the
    * stand-in for the seeded RNG a trainer uses; everything downstream
    * (position explode, span expansion, overlap merge, clipping, the
    * per-doc aggregate) is the production dataflow. All narrow per-doc
    * ops: one posexplode, keyed aggregates — no shuffle wider than the
    * (doc, position) rows.
    */
  val d72SpanCorruption: Q = Q(
    "d72_span_corruption",
    (s, dir) => spanCorruption(Q.spread(t(s, dir, "documents"), "doc_id")),
    Some(s"""
      WITH toks AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos FROM (
          SELECT doc_id, string_split(text, ' ') AS tt FROM documents) d,
          unnest(range(0, len(d.tt))) AS u(i)),
      ntok AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
      starts AS (
        SELECT doc_id, pos FROM toks
        WHERE ((doc_id % 1000003) * $SpanHashA + pos * $SpanHashB)
          % $SpanEvery = 0),
      masked AS (
        SELECT DISTINCT s.doc_id, s.pos + u.o AS mpos
        FROM starts s, unnest(range(0, $SpanLen)) AS u(o)),
      clipped AS (
        SELECT m.doc_id, m.mpos FROM masked m JOIN ntok USING (doc_id)
        WHERE m.mpos < n_tokens),
      spanagg AS (SELECT doc_id, count(*) AS n_spans FROM starts
        GROUP BY doc_id),
      maskagg AS (
        SELECT doc_id, count(*) AS n_masked,
          CAST(sum(mpos * 2654435761 % 1000003) AS BIGINT)
            AS mask_fingerprint
        FROM clipped GROUP BY doc_id)
      SELECT n.doc_id, n.n_tokens,
        coalesce(s.n_spans, 0) AS n_spans,
        coalesce(m.n_masked, 0) AS n_masked,
        coalesce(m.n_masked, 0) * 10000 // n.n_tokens AS mask_bp,
        coalesce(m.mask_fingerprint, 0) AS mask_fingerprint
      FROM ntok n
        LEFT JOIN spanagg s ON n.doc_id = s.doc_id
        LEFT JOIN maskagg m ON n.doc_id = m.doc_id
      ORDER BY n.doc_id"""))

  private val VocabSize = 1000

  /** d73: VOCABULARY COVERAGE / OOV-rate audit — build the top-N token
    * vocabulary from corpus frequencies ((count, token) total order, so
    * the N-boundary is deterministic) and report, per language, how many
    * token occurrences fall outside it (in integer basis points). The
    * tokenizer-evaluation loop every multilingual pipeline runs: a
    * vocabulary trained on the majority language starves the rest, and
    * this is the report that shows it. Vocabulary is top-k via
    * orderBy+limit (TakeOrderedAndProject), broadcast back to the
    * occurrence stream; per-language aggregates are one keyed pass.
    */
  val d73VocabCoverage: Q = Q(
    "d73_vocab_coverage",
    (s, dir) => {
      val occ = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(VocabSize)
        .select(col("tok"), lit(1).as("in_vocab"))
      occ.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_occurrences"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
          countDistinct(when(col("in_vocab").isNull, col("tok")))
            .as("n_oov_types"))
        .select(col("lang"), col("n_occurrences"), col("n_oov"),
          col("n_oov_types"),
          expr("n_oov * 10000 div n_occurrences").as("oov_bp"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH occ AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, count(*) AS cnt FROM occ GROUP BY tok)
        ORDER BY cnt DESC, tok LIMIT $VocabSize),
      flagged AS (
        SELECT lang, tok,
          EXISTS (SELECT 1 FROM vocab v WHERE v.tok = occ.tok) AS iv
        FROM occ)
      SELECT lang, count(*) AS n_occurrences,
        CAST(sum(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        count(DISTINCT CASE WHEN NOT iv THEN tok END) AS n_oov_types,
        CAST(sum(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT) * 10000
          // count(*) AS oov_bp
      FROM flagged GROUP BY lang ORDER BY lang"""))

  private val SystematicTarget = 25L // ≈ picks per corpus
  private val SysShard = 100L        // doc_ids per cumsum shard

  /** d74: WEIGHTED SYSTEMATIC SAMPLING (probability-proportional-to-size,
    * fixed-grid variant) — walk the corpus in doc order accumulating
    * weight (n_chars = the token-budget proxy), and select every document
    * whose cumulative interval crosses a multiple of the step
    * T = total÷target: big docs are picked with probability ∝ size, tiny
    * docs can only be picked when the grid lands inside them, and the
    * sample hits the budget target EXACTLY without RNG — the
    * survey-statistics PPS technique applied to corpus subsampling.
    * The cumulative walk is the d50 two-phase prefix sum (per-shard
    * window + broadcast shard prefixes); selection is then a pure row
    * predicate: ⌊cum_before/T⌋ < ⌊cum_after/T⌋ — all integer.
    */
  val d74WeightedSystematic: Q = Q(
    "d74_weighted_systematic",
    (s, dir) => {
      val w = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("n_chars").as("w"))
        .withColumn("shard", expr(s"doc_id div $SysShard"))
      val local = w.withColumn("run",
        sum(col("w")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("doc_id"))))
      val prefixes = w.groupBy(col("shard")).agg(sum(col("w")).as("tot"))
        .withColumn("prefix",
          coalesce(sum(col("tot")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("shard"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("prefix"))
      val total = w.agg(sum(col("w")).as("total"))
      local.join(broadcast(prefixes), "shard")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("w"),
          (col("run") + col("prefix")).as("cum_after"),
          expr(s"total div $SystematicTarget").as("step"))
        .filter(expr("(cum_after - w) div step < cum_after div step"))
        .select(col("doc_id"), col("w"), col("cum_after"),
          expr("cum_after div step").as("grid_idx"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT doc_id, n_chars AS w FROM documents),
      cum AS (
        SELECT doc_id, w,
          CAST(sum(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum_after
        FROM w),
      s AS (SELECT CAST(sum(w) AS BIGINT) // $SystematicTarget AS step
            FROM w)
      SELECT doc_id, w, cum_after,
        cum_after // (SELECT step FROM s) AS grid_idx
      FROM cum
      WHERE (cum_after - w) // (SELECT step FROM s)
        < cum_after // (SELECT step FROM s)
      ORDER BY doc_id"""))

  /** d75: SPLIT-BALANCE AUDIT — does the deterministic 80/10/10 hash
    * split (d34's exact bucket function, ONE shared definition) stay
    * balanced within every language? For each (split, lang) cell: actual
    * count, the 80/10/10-proportional expectation on the language's
    * total, and the signed deviation in integer basis points of expected.
    * A drifted cell means the hash and a data attribute are correlated —
    * the split-leakage check every ML-ops pipeline runs before trusting
    * eval numbers. Two keyed aggregates over (split, lang) cells — the
    * report is |splits|×|langs| rows at any scale. Deviation uses the
    * sign-split integer division (engines disagree on negatives).
    */
  val d75SplitBalance: Q = Q(
    "d75_split_balance",
    (s, dir) => {
      val docs = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("lang"), TextAnalysis.splitName.as("split"))
      val cells = docs.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
      val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("lang_n"))
      cells.join(broadcast(totals), "lang")
        .select(col("split"), col("lang"), col("n"), col("lang_n"),
          expr("""lang_n * (CASE split WHEN 'train' THEN 80
                  WHEN 'val' THEN 10 ELSE 10 END) div 100""")
            .as("expected"))
        .withColumn("deviation_bp",
          signum(col("n") - col("expected")).cast("long") *
            expr("abs(n - expected) * 10000 div greatest(expected, 1)"))
        .orderBy(col("split"), col("lang"))
    },
    Some("""
      WITH docs AS (
        SELECT lang,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80
                 THEN 'train'
               WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90
                 THEN 'val'
               ELSE 'test' END AS split
        FROM documents),
      cells AS (
        SELECT split, lang, count(*) AS n FROM docs GROUP BY split, lang),
      totals AS (SELECT lang, count(*) AS lang_n FROM docs GROUP BY lang),
      j AS (
        SELECT split, cells.lang, n, lang_n,
          lang_n * (CASE split WHEN 'train' THEN 80
                    WHEN 'val' THEN 10 ELSE 10 END) // 100 AS expected
        FROM cells JOIN totals ON cells.lang = totals.lang)
      SELECT split, lang, n, lang_n, expected,
        CAST(sign(n - expected) AS BIGINT) *
          (abs(n - expected) * 10000 // greatest(expected, 1))
          AS deviation_bp
      FROM j ORDER BY split, lang"""))
}
