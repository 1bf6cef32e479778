package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Corpus-curation operators, round 5: cross-document repeated-block
  * removal (the CCNet/C4 "drop duplicated paragraphs" step — documents
  * here have no newlines, so the paragraph unit is a fixed 8-token block)
  * and first-seen n-gram source attribution (the marginal-novelty signal
  * behind data-mixing decisions). Both ride one shared block explode —
  * narrow per-row work, one keyed aggregation each, the boilerplate set
  * broadcast back (small by definition: boilerplate is FEW distinct
  * blocks referenced MANY times).
  */
object Corpus2 {

  def pack: Seq[Q] = Seq(d63BlockDedup, d64SourceNovelty, d65FuzzyMatch,
    d66DsirSelect, d67StratifiedSample, d68SemDedup)

  /** Paragraph stand-in: non-overlapping 8-token blocks (d59 chunks WITH
    * overlap for retrieval; dedup wants a partition of the text so a
    * dropped block removes each token exactly once).
    */
  val BlockSize = 8

  /** A block is boilerplate when it appears in at least this many distinct
    * documents (CCNet drops at 2 — any cross-document repetition of a
    * whole paragraph is template/boilerplate, not content).
    */
  val MinDf = 2

  /** One row per (doc_id, idx, block): the non-overlapping block partition
    * of each document, with the block's token count (final block may run
    * short). Entirely per-row: split once, explode the start offsets,
    * slice — the same generator-in-its-own-projection shape as d59.
    */
  def blockRows(docs: DataFrame): DataFrame =
    Q.spread(docs, "doc_id")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        size(col("toks")).as("n"))
      .select(col("doc_id"), col("source"), col("toks"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(BlockSize))).as("s"))
      .select(col("doc_id"), col("source"),
        (col("s") / BlockSize).cast("int").as("idx"),
        least(lit(BlockSize.toLong), (col("n") - col("s")).cast("long"))
          .as("blk_tokens"),
        array_join(slice(col("toks"), col("s") + 1, lit(BlockSize)), " ")
          .as("block"))

  private val sqlBlockRows = s"""
        SELECT doc_id, source, CAST(s // $BlockSize AS INT) AS idx,
          CAST(least(s + $BlockSize, n) - s AS BIGINT) AS blk_tokens,
          array_to_string(words[s+1 : least(s + $BlockSize, n)], ' ') AS block
        FROM (
          SELECT doc_id, source, string_split(text, ' ') AS words,
            len(string_split(text, ' ')) AS n,
            unnest(range(0, len(string_split(text, ' ')), $BlockSize)) AS s
          FROM documents) t"""

  /** The d63 transform over any (doc_id, source, text) frame — exposed for
    * planted-corpus specs.
    */
  def blockDedup(docs: DataFrame): DataFrame = {
    // three consumers (df count, mark join, per-doc agg): pay the explode once
    val blocks = blockRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val common = blocks.groupBy(col("block"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= MinDf)
      .select(col("block"), lit(1).as("hot"))
    val marked = blocks.join(broadcast(common), Seq("block"), "left")
    val res = marked.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("hot") === 1, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("hot").isNull, col("blk_tokens")).otherwise(0L))
          .as("n_tokens_kept"),
        // kept blocks in document order; all-dropped docs hash the empty
        // string (collect_list skips the nulls the `when` emits; idx is
        // unique per doc so the sort is total and the hash deterministic)
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("hot").isNull, struct(col("idx"), col("block"))))),
            b => b.getField("block")),
          " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
    Q.materialized(res, blocks)
  }

  /** d63: cross-document repeated-block removal — the CCNet/C4 boilerplate
    * dedup step: any 8-token block appearing verbatim in ≥ MinDf distinct
    * documents is template text (headers, footers, license banners) and is
    * dropped from EVERY document; per-document output reports the block
    * counts plus the md5 of the cleaned text, so the compare pins the
    * reconstruction, not just the counts.
    *
    * Scale shape: the explode is narrow; the df count shuffles (block,
    * doc_id) pairs once; the boilerplate SET is broadcast back (small by
    * definition — few distinct blocks, many references); the per-doc
    * rebuild is one keyed aggregation. Nothing is all-pairs, and the big
    * side (the corpus) shuffles only on doc_id.
    */
  val d63BlockDedup: Q = Q(
    "d63_block_dedup",
    (s, dir) => blockDedup(t(s, dir, "documents")),
    Some(s"""
      WITH b AS ($sqlBlockRows),
      hot AS (
        SELECT block FROM b GROUP BY block
        HAVING count(DISTINCT doc_id) >= $MinDf),
      m AS (
        SELECT b.doc_id, b.idx, b.blk_tokens, b.block,
          h.block IS NOT NULL AS hot
        FROM b LEFT JOIN hot h ON b.block = h.block)
      SELECT doc_id, count(*) AS n_blocks,
        CAST(sum(CASE WHEN hot THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        CAST(sum(CASE WHEN hot THEN 0 ELSE blk_tokens END) AS BIGINT)
          AS n_tokens_kept,
        md5(coalesce(
          array_to_string(list(block ORDER BY idx) FILTER (WHERE NOT hot),
            ' '), '')) AS clean_md5
      FROM m GROUP BY doc_id ORDER BY doc_id"""))

  /** d64: first-seen block attribution per source — for every distinct
    * 8-token block, the source that contributed it FIRST (lowest doc_id);
    * per source, the share of the corpus's distinct blocks it introduced
    * vs the share it merely repeats. The marginal-novelty report a data
    * lead reads before weighting sources in a training mix: a source can
    * be large yet contribute nothing new.
    *
    * Scale shape: one explode, one (block)-keyed min_by aggregation, one
    * (source)-keyed rollup — the attribution table is O(distinct blocks)
    * and never joined back against the corpus.
    */
  val d64SourceNovelty: Q = Q(
    "d64_source_novelty",
    (s, dir) => {
      val blocks = blockRows(t(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val refs = blocks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_block_refs"))
      // doc_id is unique per document, so min_by is deterministic (a block
      // repeated within the min doc resolves to that same doc's source)
      val firstSeen = blocks.groupBy(col("block"))
        .agg(min_by(col("source"), col("doc_id")).as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_first"))
      val tot = firstSeen.agg(sum(col("n_first")).as("n_distinct_blocks"))
      val res = refs.join(firstSeen, Seq("source"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_block_refs"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          round(coalesce(col("n_first"), lit(0L)).cast("double") /
            col("n_distinct_blocks").cast("double"), 6).as("novelty_share"))
        .orderBy(col("source"))
      Q.materialized(res, blocks)
    },
    Some(s"""
      WITH b AS ($sqlBlockRows),
      refs AS (SELECT source, count(*) AS n_block_refs FROM b GROUP BY source),
      first_seen AS (
        SELECT arg_min(source, doc_id) AS source FROM b GROUP BY block),
      fs AS (SELECT source, count(*) AS n_first FROM first_seen GROUP BY source),
      tot AS (SELECT CAST(sum(n_first) AS BIGINT) AS n_distinct_blocks FROM fs)
      SELECT r.source, r.n_block_refs,
        CAST(coalesce(fs.n_first, 0) AS BIGINT) AS n_first,
        round(CAST(coalesce(fs.n_first, 0) AS DOUBLE) / n_distinct_blocks, 6)
          AS novelty_share
      FROM refs r LEFT JOIN fs ON r.source = fs.source CROSS JOIN tot
      ORDER BY r.source"""))

  /** Title length (tokens) and edit-distance ceiling for d65. */
  val TitleTokens = 20
  val MaxEditDist = 5

  /** The d65 candidate/verify transform over any (doc_id, text) frame —
    * exposed for planted-corpus specs.
    */
  def fuzzyMatches(docs: DataFrame): DataFrame = {
    val titles = Q.spread(docs, "doc_id")
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, TitleTokens), " ")
          .as("title"))
    // HOT-BLOCK GUARD: collapse byte-identical titles to one representative
    // (min doc_id) + a dup count BEFORE any blocking. N mirrored pages
    // would otherwise collide on every deletion key and emit N²/2
    // candidate pairs; after the collapse a block holds at most one row
    // per DISTINCT title, so duplicates cost O(N) total. Exact-duplicate
    // pairs are d40's output, not re-emitted here.
    val reps = titles.groupBy(col("title"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("title"),
        split(col("title"), " ").as("toks"), col("n_dups"))
    // deletion-neighborhood keys: the title itself (del = -1) plus every
    // drop-one-token variant; Spark's filter() lambda index is 0-BASED
    // (DuckDB's list_filter is 1-based — the oracle offsets del by one)
    val keys = reps
      .select(col("doc_id"),
        explode(sequence(lit(-1), size(col("toks")) - 1)).as("del"),
        col("toks"))
      .select(col("doc_id"),
        md5(array_join(
          filter(col("toks"), (_, i) => i =!= col("del")), " ")).as("k"))
    val pairs = keys.as("a")
      .join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // candidates are near-matches only, so joining the titles back touches
    // a tiny broadcast-able side; the threshold form of levenshtein
    // early-exits at MaxEditDist+ (returns -1, filtered out). Distinct
    // titles make dist ≥ 1 by construction.
    pairs
      .join(reps.select(col("doc_id").as("d1"), col("title").as("t1"),
        col("n_dups").as("n1")), "d1")
      .join(reps.select(col("doc_id").as("d2"), col("title").as("t2"),
        col("n_dups").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        levenshtein(col("t1"), col("t2"), MaxEditDist).as("dist"),
        col("n1"), col("n2"))
      .filter(col("dist") >= 1 && col("dist") <= MaxEditDist)
      .orderBy(col("d1"), col("d2"))
  }

  /** d65: fuzzy (edit-distance) near-match — the entity-resolution /
    * fuzzy-dedup step character-level edits need and the token-set family
    * (d41/d42) cannot see. Matching unit: the first `TitleTokens`-token
    * "title"; pairs of DISTINCT titles within `MaxEditDist` character
    * edits are emitted with their exact distance plus each side's
    * exact-duplicate multiplicity (`n1`/`n2`) — byte-identical titles are
    * collapsed to their min-doc_id representative up front (exact pairs
    * are d40's output).
    *
    * Scale design: naive blocking on a hot key (first token) degenerates —
    * measured 1.5M candidate pairs at sf0.1 with a small vocab. Instead
    * each DISTINCT title emits its DELETION NEIGHBORHOOD (the SymSpell
    * trick): md5 of the title with each single token dropped. Two titles
    * collide only when they agree on all-but-one token, so blocks hold
    * true near-matches (255 candidates at sf0.1, precision 1.0 at this
    * corpus), keys are O(corpus × L) narrow (doc_id, 16-byte hash) rows,
    * and the quadratic blow-up of value-based blocking never happens. The
    * up-front exact collapse is the hot-block guard: mirrored pages (N
    * byte-identical titles, the common real-corpus hot key) share every
    * deletion key and would otherwise emit N²/2 candidates; collapsed,
    * they cost one row. Verification runs levenshtein ONLY on survivors,
    * with the early-exit threshold form. Recall envelope (documented,
    * mirrored in the oracle): catches pairs whose edits confine to one
    * token — multi-token rewrites belong to d41's Jaccard family.
    */
  val d65FuzzyMatch: Q = Q(
    "d65_fuzzy_match",
    (s, dir) => fuzzyMatches(t(s, dir, "documents")),
    Some(s"""
      WITH t0 AS (
        SELECT doc_id,
          array_to_string(string_split(text, ' ')[1:$TitleTokens], ' ')
            AS title
        FROM documents),
      t AS (
        SELECT min(doc_id) AS doc_id, title,
          string_split(title, ' ') AS toks, count(*) AS n_dups
        FROM t0 GROUP BY title),
      keys AS (
        SELECT doc_id,
          md5(array_to_string(
            list_filter(toks, (x, i) -> i != del), ' ')) AS k
        FROM (
          SELECT doc_id, toks, unnest(range(0, len(toks) + 1)) AS del
          FROM t) v),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id)
      SELECT d1, d2, CAST(levenshtein(t1.title, t2.title) AS INT) AS dist,
        t1.n_dups AS n1, t2.n_dups AS n2
      FROM cand
        JOIN t t1 ON t1.doc_id = d1
        JOIN t t2 ON t2.doc_id = d2
      WHERE levenshtein(t1.title, t2.title) BETWEEN 1 AND $MaxEditDist
      ORDER BY d1, d2"""))

  /** DSIR target slice and selection quota (top quarter by score). */
  val TargetLang = "en"
  val SelectDenom = 4

  /** Score-bucket width for the two-phase rank: 1/50 = 0.02 score units
    * per shard. Mean-per-token LLR scores live in a bounded band (a few
    * tens either side of zero — each term is a log of count ratios), so
    * this yields at most a few thousand shards regardless of corpus size;
    * `floor(-score·scale)` is weakly monotone in descending score, which
    * is what makes per-shard rank + shard prefix equal the global rank.
    */
  val ScoreShardScale = 50

  /** The d66 transform over any (doc_id, lang, text) frame — exposed for
    * planted-corpus specs. Eager ([[Q.materialized]]); plan audits use
    * [[dsirSelectPlan]].
    */
  def dsirSelect(docs: DataFrame): DataFrame = {
    val (res, inter) = dsirSelectPlan(docs)
    Q.materialized(res, inter: _*)
  }

  /** The LAZY d66 plan (result, intermediates-to-release) — the shape
    * plan-audit specs inspect before anything executes.
    */
  def dsirSelectPlan(docs: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.types.DecimalType
    // four consumers (raw counts, target counts, grand totals, scoring
    // join): pay the explode once
    val toks = Q.spread(docs, "doc_id")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = toks.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("lang") === TargetLang)
      .groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val totals = toks.agg(
      count(lit(1)).as("tr"),
      sum(when(col("lang") === TargetLang, 1L).otherwise(0L)).as("tt"))
    val vsize = raw.agg(count(lit(1)).as("v"))
    val quota = docs.agg(expr(s"count(1) div $SelectDenom").as("quota"))
    // per-token-instance log-likelihood ratio, add-one smoothed over the
    // raw vocab: ln((ct+1)/(tt+v)) − ln(cr/tr), expanded so every ln
    // argument is an integer-valued double (cross-engine-exact input) and
    // every term is decimal-staged (order-independent sum)
    val scored = toks.join(raw, "tok").join(tgt, Seq("tok"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(vsize))
      .select(col("doc_id"),
        ((log((coalesce(col("ct"), lit(0L)) + 1).cast("double")) -
          log((col("tt") + col("v")).cast("double")))
          .cast(DecimalType(18, 12)) +
          (log(col("tr").cast("double")) - log(col("cr").cast("double")))
            .cast(DecimalType(18, 12))).as("llr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("s").cast("double") / col("n_tokens").cast("double"), 6)
          .as("dsir_score"))
    // rank on the ROUNDED score (identical across engines) with doc_id
    // tie-break — the selection set is then deterministic on both sides.
    // The rank itself is the d50/d62 TWO-PHASE form, never a global
    // window: shard by a score-range bucket that is monotone in the sort
    // order (higher score → lower-or-equal shard; equal rounded scores
    // always share a shard, so the doc_id tie-break stays in-shard),
    // row_number within each shard, then add broadcast per-shard prefix
    // counts. Phase-2's ordered window runs over ONE ROW PER SHARD —
    // broadcast-sized at any corpus size — so no O(docs) data ever
    // funnels through a single task, and the result still equals the
    // oracle's single global row_number exactly.
    val sharded = scored
      .withColumn("shard", floor(-col("dsir_score") * ScoreShardScale))
    val local = sharded
      .withColumn("local_rank", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("dsir_score").desc, col("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefixes = local.groupBy(col("shard")).agg(count(lit(1)).as("tot"))
      .withColumn("prefix",
        coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("prefix"))
    val res = local.join(broadcast(prefixes), "shard")
      .crossJoin(broadcast(quota))
      .select(col("doc_id"), col("n_tokens"), col("dsir_score"),
        when(col("prefix") + col("local_rank") <= col("quota"), 1)
          .otherwise(0).as("selected"))
      .orderBy(col("doc_id"))
    (res, Seq(toks, local))
  }

  /** d66: DSIR-style importance selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") — score
    * every document by the mean per-token log-likelihood ratio between a
    * TARGET unigram LM (here the `lang = 'en'` slice standing in for the
    * high-quality target distribution) and the RAW-corpus unigram LM, then
    * keep the top quarter. The importance weight says "this document looks
    * more like the target than like the average crawl" — the
    * distribution-matching selection step that runs after dedup/quality
    * gates in a pretraining data pipeline.
    *
    * Scale shape: identical to d54 — the two LMs are token-keyed count
    * tables built from one shared explode (key-partitioned joins, never
    * broadcast at web-scale vocab); only the one-row totals broadcast. The
    * top-quota rank is the d50/d62 two-phase form over score-range shards
    * (see [[dsirSelect]]): per-shard row_number + broadcast shard
    * prefixes, so the selection cutoff is exact with no single-task
    * global sort anywhere in the plan.
    *
    * Parity: every ln argument is an integer-valued double, every term
    * decimal-staged (see the parity playbook), ranking happens on the
    * 6dp-ROUNDED score with doc_id tie-break.
    */
  val d66DsirSelect: Q = Q(
    "d66_dsir_select",
    (s, dir) => dsirSelect(t(s, dir, "documents")),
    Some(s"""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      raw AS (SELECT tok, count(*) AS cr FROM tok GROUP BY tok),
      tgt AS (
        SELECT tok, count(*) AS ct FROM tok
        WHERE lang = '$TargetLang' GROUP BY tok),
      consts AS (
        SELECT (SELECT count(*) FROM tok) AS tr,
          (SELECT count(*) FROM tok WHERE lang = '$TargetLang') AS tt,
          (SELECT count(*) FROM raw) AS v),
      scored AS (
        SELECT t.doc_id, count(*) AS n_tokens,
          round(CAST(sum(
              CAST(ln(CAST(coalesce(g.ct, 0) + 1 AS DOUBLE)) -
                   ln(CAST(c.tt + c.v AS DOUBLE)) AS DECIMAL(18,12)) +
              CAST(ln(CAST(c.tr AS DOUBLE)) -
                   ln(CAST(r.cr AS DOUBLE)) AS DECIMAL(18,12)))
            AS DOUBLE) / count(*), 6) AS dsir_score
        FROM tok t JOIN raw r USING (tok) LEFT JOIN tgt g USING (tok)
        CROSS JOIN consts c
        GROUP BY t.doc_id)
      SELECT doc_id, n_tokens, dsir_score,
        CASE WHEN row_number() OVER (ORDER BY dsir_score DESC, doc_id)
          <= (SELECT count(*) // $SelectDenom FROM documents)
        THEN 1 ELSE 0 END AS selected
      FROM scored ORDER BY doc_id"""))

  // ------------------------------------------------ stratified sampling

  /** d67 keeps exactly ⌈n/SampleDenom⌉ documents per stratum. */
  val SampleDenom = 4

  /** Hash-shard count for the per-stratum two-phase rank: skey div 2²⁴
    * spreads each stratum's rows over 256 shards of the 2³² key domain.
    */
  private val SkeyShard = 1L << 24

  /** The d67 transform — exposed eager for planted-corpus specs. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val (res, inter) = stratifiedSamplePlan(docs)
    Q.materialized(res, inter: _*)
  }

  /** The LAZY d67 plan (result, intermediates-to-release) for plan audits.
    *
    * The shuffle key is the Knuth multiplicative hash of doc_id (pure
    * BIGINT arithmetic, so both engines compute the identical permutation;
    * d34/d39 use the same family) — a deterministic stand-in for a random
    * draw that makes "exactly ⌈25%⌉ of every stratum, uniformly at random"
    * reproducible and oracle-checkable. Selection is by rank within the
    * stratum, NEVER a global sort: row_number within (source, skey-shard)
    * + broadcast per-shard prefix counts — the d50/d62/d66 two-phase form
    * applied per stratum, so at 100 TB a 5 TB stratum is 256 bounded tasks,
    * and the only ordered windows run over one-row-per-shard aggregates.
    */
  def stratifiedSamplePlan(docs: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val keyed = docs.select(col("doc_id"), col("source"),
      pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
        lit(1L << 32)).as("skey"))
    val local = keyed
      .withColumn("shard", expr(s"skey div $SkeyShard"))
      .withColumn("local_rank", row_number().over(
        Window.partitionBy(col("source"), col("shard"))
          .orderBy(col("skey"), col("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefixes = local.groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("tot"))
      .withColumn("prefix", coalesce(sum(col("tot")).over(
        Window.partitionBy(col("source")).orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("shard"), col("prefix"))
    val quotas = local.groupBy(col("source"))
      .agg(expr(s"(count(1) + ${SampleDenom - 1}) div $SampleDenom")
        .as("quota"))
    val res = local.join(broadcast(prefixes), Seq("source", "shard"))
      .join(broadcast(quotas), "source")
      .select(col("doc_id"), col("source"), col("skey"),
        when(col("prefix") + col("local_rank") <= col("quota"), 1)
          .otherwise(0).as("selected"))
      .orderBy(col("doc_id"))
    (res, Seq(local))
  }

  /** d67: EXACT-QUOTA stratified sampling — the data-mixing primitive that
    * downsamples every stratum (here: `source`) to exactly ⌈25%⌉ of its
    * documents, uniformly by a deterministic hash permutation. d39's
    * Bernoulli mixing hits its rates only in expectation; recipe-driven
    * pretraining mixes ("2 parts web, 1 part code…") need exact counts,
    * which demands a rank, and rank is where naive implementations put a
    * global sort. This one never does — see [[stratifiedSamplePlan]].
    */
  val d67StratifiedSample: Q = Q(
    "d67_stratified_sample",
    (s, dir) => stratifiedSample(t(s, dir, "documents")),
    Some(s"""
      WITH keyed AS (
        SELECT doc_id, source,
          ((doc_id % 1000000007) * 2654435761) % ${1L << 32} AS skey
        FROM documents)
      SELECT doc_id, source, skey,
        CASE WHEN row_number() OVER (PARTITION BY source
            ORDER BY skey, doc_id)
          <= (count(*) OVER (PARTITION BY source) + ${SampleDenom - 1})
             // $SampleDenom
        THEN 1 ELSE 0 END AS selected
      FROM keyed ORDER BY doc_id"""))

  // ------------------------------------------------------ semantic dedup

  /** d68 drops a vector when some LOWER-ID vector in its cluster has
    * cosine ≥ CosNum/CosDen = 0.3 with it (the d44/d45 near-dup regime on
    * this corpus).
    */
  private val CosNum = 3
  private val CosDen = 10

  /** The d68 transform over any (vec_id, label, embedding) frame —
    * exposed eager for planted-corpus specs.
    */
  def semDedup(emb: DataFrame): DataFrame = {
    val n2 = (1 to 64).map { i =>
      element_at(col("gv"), i) * element_at(col("gv"), i)
    }.reduce(_ + _)
    val gv = Q.spread(emb, "vec_id")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 512).cast("long")).as("gv"))
      .withColumn("n2", n2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = gv.select(col("label"), col("vec_id").as("va"),
      col("gv").as("ga"), col("n2").as("na"))
    val b = gv.select(col("label"), col("vec_id").as("vb"),
      col("gv").as("gb"), col("n2").as("nb"))
    val dot = (1 to 64).map { i =>
      element_at(col("ga"), i) * element_at(col("gb"), i)
    }.reduce(_ + _)
    // cos(a,b) ≥ τ on integers: dot > 0 ∧ den²·dot² ≥ num²·|a|²·|b|² —
    // no division, no sqrt, no float anywhere (dot ≤ 64·512² keeps every
    // product far inside BIGINT)
    val dups = a.join(b, Seq("label"))
      .filter(col("va") < col("vb"))
      .withColumn("dot", dot)
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit((CosDen * CosDen).toLong) >=
          lit((CosNum * CosNum).toLong) * col("na") * col("nb"))
      .select(col("vb").as("vec_id")).distinct()
    val res = gv
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        not(coalesce(col("dup"), lit(false))).as("is_kept"))
      .orderBy(col("vec_id"))
    Q.materialized(res, gv)
  }

  /** d68: SEMANTIC deduplication — SemDeDup (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding space, compare pairs ONLY
    * within a cluster, and keep one representative (lowest vec_id) of
    * every cosine-≥-τ group. Catches what d40/d41 cannot — rephrasings
    * and near-copies that share no n-grams — and is the third member of
    * the dedup ladder (exact → lexical near-dup → semantic near-dup).
    *
    * The `label` column is the precomputed cluster assignment (the paper
    * runs k-means first; e56 is that training step). Scale shape is the
    * paper's own argument: all-pairs is O(N²), but N/k-sized clusters make
    * the in-cluster join Σ(N/k)² — choosing k ∝ N holds per-cluster cost
    * constant; the join is (label)-keyed, nothing broadcasts but the
    * one-row constants, and the cosine test is division-free integer
    * arithmetic on the 1/512 grid (τ² cross-multiplied), so the kept-set
    * is oracle-pinned bit-exact.
    */
  val d68SemDedup: Q = Q(
    "d68_semdedup",
    (s, dir) => semDedup(t(s, dir, "embeddings")),
    Some {
      def sqlN2(al: String) =
        (1 to 64).map(i => s"$al.gv[$i]*$al.gv[$i]").mkString("+")
      val sqlDot =
        (1 to 64).map(i => s"a.gv[$i]*b.gv[$i]").mkString("+")
      s"""
      WITH gv AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*512) AS BIGINT)) AS gv
        FROM embeddings),
      nrm AS (SELECT g.vec_id, g.label, g.gv, ${sqlN2("g")} AS n2 FROM gv g),
      pairs AS (
        SELECT b.vec_id AS vb, $sqlDot AS dot, a.n2 AS na, b.n2 AS nb
        FROM nrm a JOIN nrm b ON a.label = b.label AND a.vec_id < b.vec_id),
      dups AS (
        SELECT DISTINCT vb AS vec_id FROM pairs
        WHERE dot > 0 AND dot*dot*${CosDen * CosDen} >= ${CosNum * CosNum}*na*nb)
      SELECT g.vec_id, g.label, d.vec_id IS NULL AS is_kept
      FROM gv g LEFT JOIN dups d ON g.vec_id = d.vec_id
      ORDER BY g.vec_id"""
    })
}
