package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Corpus-pipeline additions, round 6 (second continuation): cross-source
  * overlap auditing and training-batch layout — the reporting ops a corpus
  * curator runs between dedup and training.
  */
object Corpus4 {

  def pack: Seq[Q] = Seq(d76SourceOverlap, d77LengthBatching,
    d78EvalDecontam, d79CdcChunking, d80ZipfFit, d81InterleaveSchedule,
    d82PackedLayout, d83RendezvousShards, d84LshPlanner, d85PsiDrift,
    d86KAnonymity, d87LangIdEval)

  /** d87: CLASSIFIER EVALUATION of the d31 language-ID heuristic against
    * the labeled truth — per-class TP/FP/FN, precision, recall and F1 in
    * integer basis points (F1 via the division-free identity
    * 2·tp·10⁴ div (2·tp+fp+fn)): the "how good is the filter actually"
    * report a curation pipeline publishes before trusting a classifier
    * gate. Classes with no predictions report null precision rather than
    * divide-by-zero (zh is labeled but never predicted by d31's 4-way
    * rule — the eval EXPOSES that blind spot; that is its job).
    * Composes d31's per-doc output; the confusion mass is
    * |classes|²-bounded.
    */
  val d87LangIdEval: Q = Q(
    "d87_langid_eval",
    (s, dir) => {
      val preds = TextAnalysis.d31LangId.run(s, dir)
        .select(col("labeled_lang"), col("pred_lang"))
      val classes = preds.select(col("labeled_lang").as("cls")).distinct()
        .unionAll(preds.select(col("pred_lang").as("cls")).distinct())
        .distinct()
      val tp = preds.filter(col("labeled_lang") === col("pred_lang"))
        .groupBy(col("labeled_lang").as("cls")).agg(count(lit(1)).as("tp"))
      val predN = preds.groupBy(col("pred_lang").as("cls"))
        .agg(count(lit(1)).as("n_pred"))
      val labN = preds.groupBy(col("labeled_lang").as("cls"))
        .agg(count(lit(1)).as("n_labeled"))
      classes
        .join(tp, Seq("cls"), "left").na.fill(0L, Seq("tp"))
        .join(predN, Seq("cls"), "left").na.fill(0L, Seq("n_pred"))
        .join(labN, Seq("cls"), "left").na.fill(0L, Seq("n_labeled"))
        .select(col("cls").as("lang"), col("tp"),
          (col("n_pred") - col("tp")).as("fp"),
          (col("n_labeled") - col("tp")).as("fn"),
          when(col("n_pred") > 0, expr("tp * 10000 div n_pred"))
            .as("precision_bp"),
          when(col("n_labeled") > 0, expr("tp * 10000 div n_labeled"))
            .as("recall_bp"),
          when(col("n_pred") + col("n_labeled") > 0,
            expr("2 * tp * 10000 div (n_pred + n_labeled)")).as("f1_bp"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH preds AS (
        SELECT lang AS labeled_lang,
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
          FROM documents) t),
      classes AS (
        SELECT DISTINCT labeled_lang AS cls FROM preds
        UNION SELECT DISTINCT pred_lang FROM preds),
      tp AS (
        SELECT labeled_lang AS cls, count(*) AS tp FROM preds
        WHERE labeled_lang = pred_lang GROUP BY 1),
      pn AS (SELECT pred_lang AS cls, count(*) AS n_pred FROM preds GROUP BY 1),
      ln_ AS (SELECT labeled_lang AS cls, count(*) AS n_labeled
              FROM preds GROUP BY 1)
      SELECT c.cls AS lang,
        CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
        CAST(coalesce(pn.n_pred, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fp,
        CAST(coalesce(ln_.n_labeled, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fn,
        CASE WHEN coalesce(pn.n_pred, 0) > 0 THEN
          coalesce(tp.tp, 0) * 10000 // pn.n_pred END AS precision_bp,
        CASE WHEN coalesce(ln_.n_labeled, 0) > 0 THEN
          coalesce(tp.tp, 0) * 10000 // ln_.n_labeled END AS recall_bp,
        CASE WHEN coalesce(pn.n_pred, 0) + coalesce(ln_.n_labeled, 0) > 0 THEN
          2 * coalesce(tp.tp, 0) * 10000
            // (coalesce(pn.n_pred, 0) + coalesce(ln_.n_labeled, 0)) END
          AS f1_bp
      FROM classes c
      LEFT JOIN tp ON tp.cls = c.cls
      LEFT JOIN pn ON pn.cls = c.cls
      LEFT JOIN ln_ ON ln_.cls = c.cls
      ORDER BY lang"""))

  /** d86: K-ANONYMITY AUDIT — group the corpus by its quasi-identifier
    * tuple (lang, source, length bucket) and report the anonymity
    * histogram: how many documents sit in groups of size 1 (unique —
    * re-identifiable), 2-4, 5-9, ≥10. The privacy check run before a
    * release: k-anonymity k = the SMALLEST group size any document
    * belongs to, and singleton groups are the leak surface (d51 masks
    * direct identifiers; this measures the indirect ones). One keyed
    * count to value-bounded QI cells, then a constant-size class
    * histogram.
    */
  val d86KAnonymity: Q = Q(
    "d86_k_anonymity",
    (s, dir) => {
      val groups = t(s, dir, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 50").as("len_bucket"))
        .agg(count(lit(1)).as("gsize"))
      val cls = groups.select(col("gsize"),
        when(col("gsize") === 1, "1:unique")
          .when(col("gsize") <= 4, "2-4")
          .when(col("gsize") <= 9, "5-9")
          .otherwise("10+").as("anonymity_class"))
      cls.groupBy(col("anonymity_class"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("gsize")).as("n_docs"))
        .orderBy(col("anonymity_class"))
    },
    Some("""
      WITH groups AS (
        SELECT lang, source, n_chars // 50 AS len_bucket,
          count(*) AS gsize
        FROM documents GROUP BY 1, 2, 3),
      cls AS (
        SELECT gsize,
          CASE WHEN gsize = 1 THEN '1:unique'
               WHEN gsize <= 4 THEN '2-4'
               WHEN gsize <= 9 THEN '5-9'
               ELSE '10+' END AS anonymity_class
        FROM groups)
      SELECT anonymity_class, count(*) AS n_groups,
        CAST(sum(gsize) AS BIGINT) AS n_docs
      FROM cls GROUP BY anonymity_class
      ORDER BY anonymity_class"""))

  /** d85: POPULATION STABILITY INDEX between the train and val splits'
    * document-length distributions — THE production drift monitor
    * (PSI > 0.25 = "investigate the pipeline"); here it certifies the
    * d34 hash split didn't correlate with length. Add-1 smoothing keeps
    * every bucket defined with pure INTEGER inputs; each contribution
    * (p−q)·ln(p/q) is two exact-rational divisions and one ln of an
    * exact ≤2⁵³ integer product ratio — single IEEE ops, 6dp output.
    * Bucket census is value-bounded (length div 100), totals are one-row
    * broadcasts.
    */
  val d85PsiDrift: Q = Q(
    "d85_psi_drift",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("n_chars div 100").as("bucket"),
          TextAnalysis.splitName.as("split"))
        .filter(col("split").isin("train", "val"))
      val h = docs.groupBy(col("bucket"))
        .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("c1"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("c2"))
      val tot = h.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        count(lit(1)).as("b"))
      h.crossJoin(broadcast(tot))
        .select(col("bucket"), col("c1").as("n_train"), col("c2").as("n_val"),
          round(
            ((col("c1") + 1).cast("double") / (col("n1") + col("b")) -
              (col("c2") + 1).cast("double") / (col("n2") + col("b"))) *
              (log(((col("c1") + 1) * (col("n2") + col("b"))).cast("double")) -
                log(((col("c2") + 1) * (col("n1") + col("b"))).cast("double"))),
            6).as("psi_contrib"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, n_chars // 100 AS bucket,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80
               THEN 'train'
               WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90
               THEN 'val' ELSE 'test' END AS split
        FROM documents),
      h AS (
        SELECT bucket,
          CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
            AS c1,
          CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
            AS c2
        FROM docs WHERE split IN ('train', 'val')
        GROUP BY bucket),
      tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
          count(*) AS b
        FROM h)
      SELECT bucket, c1 AS n_train, c2 AS n_val,
        round(
          (CAST(c1 + 1 AS DOUBLE) / (n1 + b)
             - CAST(c2 + 1 AS DOUBLE) / (n2 + b)) *
          (ln(CAST((c1 + 1) * (n2 + b) AS DOUBLE))
             - ln(CAST((c2 + 1) * (n1 + b) AS DOUBLE))), 6) AS psi_contrib
      FROM h CROSS JOIN tot
      ORDER BY bucket"""))

  /** d84: MINHASH-LSH PARAMETER PLANNER — for a fixed 128-permutation
    * signature, the (bands × rows) operating points a curator chooses
    * between: the S-curve threshold (1/b)^(1/r), the catch probability
    * for true near-dups (J=0.8) and the false-positive rate for
    * non-dups (J=0.3), each 1−(1−Jʳ)ᵇ. This is the table d42's (b, r)
    * was picked from — shipped as a query so the trade-off is
    * inspectable next to the pipeline it tunes. Pure constant math (the
    * one corpus-INDEPENDENT query in the pack); 6dp rounding per the
    * libm-parity playbook.
    */
  val d84LshPlanner: Q = Q(
    "d84_lsh_planner",
    (s, dir) => {
      import s.implicits._
      Seq(1, 2, 4, 8, 16).toDF("rows_per_band")
        .withColumn("bands", expr("128 div rows_per_band"))
        .select(col("rows_per_band"), col("bands"),
          round(pow(lit(1.0) / col("bands"),
            lit(1.0) / col("rows_per_band")), 6).as("threshold"),
          round(lit(1.0) - pow(lit(1.0) - pow(lit(0.8), col("rows_per_band")),
            col("bands")), 6).as("p_catch_j80"),
          round(lit(1.0) - pow(lit(1.0) - pow(lit(0.3), col("rows_per_band")),
            col("bands")), 6).as("p_fp_j30"))
        .orderBy(col("rows_per_band"))
    },
    Some("""
      SELECT rows_per_band, 128 // rows_per_band AS bands,
        round(pow(1.0 / (128 // rows_per_band), 1.0 / rows_per_band), 6)
          AS threshold,
        round(1.0 - pow(1.0 - pow(0.8, rows_per_band),
                        128 // rows_per_band), 6) AS p_catch_j80,
        round(1.0 - pow(1.0 - pow(0.3, rows_per_band),
                        128 // rows_per_band), 6) AS p_fp_j30
      FROM (SELECT unnest([1, 2, 4, 8, 16]) AS rows_per_band) t
      ORDER BY rows_per_band"""))

  private val NShards = 32

  /** d83: RENDEZVOUS (HRW) SHARD ASSIGNMENT AUDIT — assign every document
    * to argmax_s hash(doc, s) over 32 shards and report each shard's
    * load against the uniform expectation. Rendezvous hashing is the
    * partitioning scheme whose assignments survive shard-count changes
    * with only 1/N movement (plain `mod` reshuffles almost everything) —
    * the property that matters when a 100 TB corpus gains capacity. The
    * audit proves the load spread the scheme actually delivers.
    *
    * All-integer: the per-(doc, shard) weight is the d34-family
    * multiplicative hash; the argmax is one packed min per doc (weight
    * and shard id both bounded, products ≤ 2⁵²); the report is N rows.
    * The 32× row expansion is a narrow generate — no shuffle until the
    * N-row count.
    */
  /** The HRW assignment of (doc_id) rows over `nShards` — exposed for the
    * minimal-movement spec (rendezvous hashing's defining property).
    */
  def hrwAssign(ids: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 64, "packed argmax holds shard < 64")
    val s = ids.sparkSession
    ids.select(col("doc_id"))
      .crossJoin(broadcast(s.range(0, nShards).toDF("shard")))
      .withColumn("w", pmod(
        pmod(col("doc_id"), lit(1000000007L)) *
          (lit(2654435761L) + col("shard") * 1000003L) + col("shard"),
        lit(1000000007L)))
      .select(col("doc_id"),
        ((lit(1000000009L) - col("w")) * 64L + col("shard")).as("packed"))
      .groupBy(col("doc_id")).agg(min(col("packed")).as("p"))
      .select(col("doc_id"), (col("p") % 64L).as("shard"))
  }

  val d83RendezvousShards: Q = Q(
    "d83_rendezvous_shards",
    (s, dir) => {
      // weight ∈ [0, 10⁹): PER-SHARD MULTIPLIER, not an additive term —
      // an additive shard offset is monotone in shard for almost every
      // doc (wraps with probability offset/p), which silently collapses
      // the argmax onto the last shard. Argmax = packed min
      // (10⁹−w)·2⁶ + shard, ties → lowest shard.
      val docs = hrwAssign(
        Q.spread(t(s, dir, "documents"), "doc_id"), NShards)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      docs.groupBy(col("shard")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(n))
        .select(col("shard"), col("n"), col("n_docs"),
          expr(s"n * $NShards * 10000 div n_docs").as("load_vs_mean_bp"))
        .orderBy(col("shard"))
    },
    Some(s"""
      WITH w AS (
        SELECT doc_id, shard,
          ((doc_id % 1000000007) * (2654435761 + shard * 1000003) + shard)
            % 1000000007 AS w
        FROM documents, (SELECT unnest(range(0, $NShards)) AS shard) sh),
      assign AS (
        SELECT doc_id,
          CAST(min((1000000009 - w) * 64 + shard) % 64 AS BIGINT) AS shard
        FROM w GROUP BY doc_id),
      n AS (SELECT count(*) AS n_docs FROM assign)
      SELECT shard, count(*) AS n, (SELECT n_docs FROM n) AS n_docs,
        count(*) * $NShards * 10000 // (SELECT n_docs FROM n)
          AS load_vs_mean_bp
      FROM assign GROUP BY shard ORDER BY shard"""))

  private val PackSeqLen = 2048L
  private val PackShard = 1000L

  /** d82: PACKED ATTENTION LAYOUT — the per-document placement record of
    * d50's greedy stream packing: which 2048-token bin each document
    * lands in, its segment index inside the bin, its token offset, and
    * whether it straddles the bin boundary (the row a trainer turns into
    * segment-id/attention-mask tensors; d50 reports the per-bin census,
    * this materializes the layout itself).
    *
    * Same scale skeleton as d50: the global token cumsum runs as the
    * two-phase prefix sum (doc-shard windows + broadcast shard prefixes),
    * then bin/offset/segment are pure arithmetic on the cumsum — no
    * global sort; the oracle states the identical layout with one
    * portable window.
    */
  val d82PackedLayout: Q = Q(
    "d82_packed_layout",
    (s, dir) => {
      val local = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          expr(s"doc_id div $PackShard").as("shard"))
        .withColumn("local_end",
          sum(col("n_toks")).over(Window.partitionBy(col("shard"))
            .orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val prefixes = local.groupBy(col("shard"))
        .agg(sum(col("n_toks")).as("tot"))
        .withColumn("prefix",
          coalesce(sum(col("tot")).over(Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("prefix"))
      val placed = local.join(broadcast(prefixes), "shard")
        .select(col("doc_id"), col("n_toks"),
          (col("prefix") + col("local_end") - col("n_toks")).as("start"))
        .select(col("doc_id"), col("n_toks"),
          expr(s"start div $PackSeqLen").as("bin"),
          expr(s"start % $PackSeqLen").as("start_off"))
      placed
        .withColumn("seg_idx", row_number().over(
          Window.partitionBy(col("bin")).orderBy(col("doc_id"))) - 1)
        .select(col("doc_id"), col("bin"), col("seg_idx"),
          col("start_off"), col("n_toks"),
          (col("start_off") + col("n_toks") > PackSeqLen).as("crosses"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH placed AS (
        SELECT doc_id, n_toks,
          CAST(start // $PackSeqLen AS BIGINT) AS bin,
          CAST(start % $PackSeqLen AS BIGINT) AS start_off
        FROM (
          SELECT doc_id, n_toks,
            sum(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              - n_toks AS start
          FROM (SELECT doc_id, len(string_split(text,' ')) AS n_toks
                FROM documents) t) c)
      SELECT doc_id, bin,
        CAST(row_number() OVER (PARTITION BY bin ORDER BY doc_id) - 1
             AS INT) AS seg_idx,
        start_off, CAST(n_toks AS BIGINT) AS n_toks,
        start_off + n_toks > $PackSeqLen AS crosses
      FROM placed ORDER BY doc_id"""))

  /** d81: INTERLEAVED CURRICULUM SCHEDULE — materialize the ORDER a
    * trainer should read the corpus in: within each language, documents
    * are shuffled by a deterministic multiplicative hash (salt 7777 —
    * independent of the d34 split stream and d62's budget stream); across
    * languages, positions interleave round-robin (global_pos = seq·L +
    * lang_idx), so every window of L consecutive positions touches every
    * language once — the "don't feed 10 epochs of English first"
    * guarantee, stated as pure arithmetic.
    *
    * Scale shape: NO global sort anywhere — the within-language order is
    * a language-keyed window over hash ranks, the language index is a
    * |langs|-row broadcast, and the global position is computed, not
    * sorted for. A trainer materializes the schedule by range-partitioned
    * write on global_pos; here the report lists the first 100 positions
    * (the head every schedule audit eyeballs) plus each doc's coordinates.
    */
  val d81InterleaveSchedule: Q = Q(
    "d81_interleave_schedule",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val langIdx = docs.select(col("lang")).distinct()
        .withColumn("lang_idx",
          row_number().over(Window.orderBy(col("lang"))) - 1)
      val nLangs = langIdx.agg(count(lit(1)).as("n_langs"))
      val seq = docs.select(col("doc_id"), col("lang"))
        .withColumn("h", pmod(pmod(col("doc_id"), lit(1000000007L))
          * 2654435761L + 7777L, lit(1000000007L)))
        .withColumn("seq", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("h"), col("doc_id"))) - 1)
      seq.join(broadcast(langIdx), "lang")
        .crossJoin(broadcast(nLangs))
        .select(col("doc_id"), col("lang"),
          (col("seq") * col("n_langs") + col("lang_idx")).as("global_pos"))
        .filter(col("global_pos") < 100)
        .orderBy(col("global_pos"))
    },
    Some("""
      WITH li AS (
        SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS lang_idx
        FROM (SELECT DISTINCT lang FROM documents) t),
      nl AS (SELECT count(*) AS n_langs FROM li),
      seq AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY ((doc_id % 1000000007) * 2654435761 + 7777)
              % 1000000007, doc_id) - 1
            AS seq
        FROM documents)
      SELECT doc_id, seq.lang,
        CAST(seq * (SELECT n_langs FROM nl) + lang_idx AS BIGINT)
          AS global_pos
      FROM seq JOIN li ON seq.lang = li.lang
      WHERE seq * (SELECT n_langs FROM nl) + lang_idx < 100
      ORDER BY global_pos"""))

  private val ZipfV = 500

  /** d80: ZIPF RANK-FREQUENCY FIT — the corpus-health law check: token
    * frequency should fall roughly as rank^(−s) with s≈1; a flat slope
    * means templated/synthetic text, a cliff means vocabulary collapse.
    * Takes the top-`ZipfV` tokens by (count desc, token) — a bounded
    * TakeOrderedAndProject, the only global ordering and it moves V rows —
    * ranks them, and least-squares fits ln(freq) against ln(rank),
    * reporting slope and intercept.
    *
    * Parity: ln only on INTEGER counts/ranks, every ln product staged
    * through DECIMAL(18,12) so the regression sums are order-independent,
    * 6dp output (the d52 libm playbook). The regression itself runs over
    * V rows — constant work at any corpus size; the token count is the
    * one data-volume pass.
    */
  val d80ZipfFit: Q = Q(
    "d80_zipf_fit",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val top = Q.spread(t(s, dir, "documents"), "doc_id")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(ZipfV)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))))
        .select(log(col("rank").cast("double")).as("x"),
          log(col("c").cast("double")).as("y"))
      val d12 = DecimalType(28, 12)
      ranked.agg(
        count(lit(1)).as("v"),
        sum(col("x").cast(d12)).as("sx"),
        sum(col("y").cast(d12)).as("sy"),
        sum((col("x") * col("y")).cast(d12)).as("sxy"),
        sum((col("x") * col("x")).cast(d12)).as("sxx"))
        .select(col("v"),
          round((col("v") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("v") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
            .as("zipf_slope"),
          round((col("sy") - ((col("v") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("v") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * col("sx").cast("double")).cast("double") / col("v"), 6)
            .as("intercept"))
    },
    Some(s"""
      WITH top AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        GROUP BY tok ORDER BY c DESC, tok LIMIT $ZipfV),
      ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE))
            AS x,
          ln(CAST(c AS DOUBLE)) AS y
        FROM top),
      mo AS (
        SELECT count(*) AS v,
          sum(CAST(x AS DECIMAL(28,12))) AS sx,
          sum(CAST(y AS DECIMAL(28,12))) AS sy,
          sum(CAST(x * y AS DECIMAL(28,12))) AS sxy,
          sum(CAST(x * x AS DECIMAL(28,12))) AS sxx
        FROM ranked)
      SELECT v,
        round(CAST(v * sxy - sx * sy AS DOUBLE) /
              CAST(v * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
        round((CAST(sy AS DOUBLE) -
               CAST(v * sxy - sx * sy AS DOUBLE) /
               CAST(v * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / v,
              6) AS intercept
      FROM mo"""))

  /** d79: CONTENT-DEFINED CHUNKING — chunk boundaries chosen by the
    * CONTENT itself (a cut wherever the hash of the trailing 4-token
    * window starts with a zero nibble, expected chunk ≈ 16 tokens), not
    * by position. d59's fixed-stride chunks shift wholesale when one
    * token is inserted upstream; CDC boundaries re-align immediately —
    * the property dedup storage (LBFS/FastCDC lineage) and
    * incremental-embedding pipelines rely on.
    *
    * Dataflow: posexplode tokens → 3 leads build the trailing 4-gram →
    * md5 nibble test marks cuts → chunk_id = running cut count per doc
    * (doc-keyed window) → chunk rows re-assembled by keyed aggregate
    * with position-ordered array_agg. All doc-keyed; the md5 boundary
    * predicate is the cross-engine-stable hash surface (both engines
    * emit identical hex). Every stage narrow or doc-keyed — no global
    * state at any corpus size.
    */
  /** The d79 chunker over any (doc_id, text) frame — exposed for the
    * boundary-stability spec (CDC's defining property).
    */
  def cdcChunks(docs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = Q.spread(docs, "doc_id")
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "tok")))
      val grams = toks
        .withColumn("t1", lag(col("tok"), 3).over(w))
        .withColumn("t2", lag(col("tok"), 2).over(w))
        .withColumn("t3", lag(col("tok"), 1).over(w))
        // a cut AFTER position p when the trailing window [p-3..p] hashes
        // into the zero nibble; the first 3 positions can never cut
        .withColumn("cut",
          when(col("t1").isNotNull &&
            substring(md5(concat_ws(" ",
              col("t1"), col("t2"), col("t3"), col("tok"))), 1, 1) === "0",
            1L).otherwise(0L))
        // chunk id = cuts strictly BEFORE this position
        .withColumn("chunk_id",
          coalesce(sum(col("cut")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      grams.groupBy(col("doc_id"), col("chunk_id"))
        .agg(count(lit(1)).as("n_tokens"),
          // position-ordered reassembly: struct ordering sorts by pos
          md5(concat_ws(" ",
            array_sort(collect_list(struct(col("pos"), col("tok"))))
              .getField("tok"))).as("chunk_md5"))
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          col("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
  }

  val d79CdcChunking: Q = Q(
    "d79_cdc_chunking",
    (s, dir) => cdcChunks(t(s, dir, "documents")),
    Some("""
      WITH toks AS (
        SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[i] AS tok FROM (
          SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS words
                FROM documents) w) t),
      grams AS (
        SELECT doc_id, pos, tok,
          CASE WHEN lag(tok, 3) OVER w IS NOT NULL
                 AND substr(md5(lag(tok, 3) OVER w || ' ' ||
                            lag(tok, 2) OVER w || ' ' ||
                            lag(tok, 1) OVER w || ' ' || tok), 1, 1) = '0'
               THEN 1 ELSE 0 END AS cut
        FROM toks
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      chunked AS (
        SELECT doc_id, pos, tok,
          CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS chunk_id
        FROM grams)
      SELECT doc_id, chunk_id, count(*) AS n_tokens,
        md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
      FROM chunked
      GROUP BY doc_id, chunk_id
      ORDER BY doc_id, chunk_id"""))

  /** d78: DECONTAMINATED EVAL CONSTRUCTION — compose the d34 hash split
    * with d38's n-gram collision test: a val/test document that shares
    * ANY 8-gram with ANY train document is contaminated (the GPT-3
    * appendix-C rule) and must leave the eval set before it can inflate
    * benchmark numbers. Reports each eval split's census: total docs,
    * contaminated, surviving clean docs, contamination in basis points.
    *
    * Scale shape: one gram-keyed LEFT SEMI join of eval grams against
    * (distinct) train grams — a semi join carries NO pair amplification
    * however hot a boilerplate gram is (contrast d38, which enumerates
    * the pairs and is capped instead) — then a doc-keyed distinct and a
    * split-keyed count. Report is ≤2 rows at any corpus size.
    */
  val d78EvalDecontam: Q = Q(
    "d78_eval_decontam",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val split = docs.select(col("doc_id"), TextAnalysis.splitName.as("split"))
      val grams = Dedup.nGramPostings(docs, n = 8)
        .join(split, "doc_id")
      val trainGrams = grams.filter(col("split") === "train")
        .select(col("s")).distinct()
      val evalGrams = grams.filter(col("split") =!= "train")
      val contaminated = evalGrams
        .join(trainGrams, Seq("s"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("contaminated", lit(1L))
      split.filter(col("split") =!= "train")
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("contaminated"), lit(0L))).as("n_contaminated"))
        .select(col("split"), col("n_docs"), col("n_contaminated"),
          (col("n_docs") - col("n_contaminated")).as("n_clean"),
          expr("n_contaminated * 10000 div n_docs").as("contamination_bp"))
        .orderBy(col("split"))
    },
    Some("""
      WITH split AS (
        SELECT doc_id,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 80 THEN 'train'
               WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM documents),
      grams AS (
        SELECT doc_id,
          unnest([words[i]||' '||words[i+1]||' '||words[i+2]||' '||words[i+3]
                  ||' '||words[i+4]||' '||words[i+5]||' '||words[i+6]||' '||words[i+7]
                  for i in range(1, len(words)-6)]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) w
        WHERE len(words) >= 8),
      train_g AS (
        SELECT DISTINCT g FROM grams JOIN split USING (doc_id)
        WHERE split = 'train'),
      cont AS (
        SELECT DISTINCT gr.doc_id
        FROM grams gr JOIN split sp USING (doc_id)
        WHERE sp.split <> 'train'
          AND EXISTS (SELECT 1 FROM train_g t WHERE t.g = gr.g))
      SELECT sp.split, count(*) AS n_docs,
        CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS n_contaminated,
        count(*) - CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_clean,
        CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          * 10000 // count(*) AS contamination_bp
      FROM split sp LEFT JOIN cont c ON sp.doc_id = c.doc_id
      WHERE sp.split <> 'train'
      GROUP BY sp.split ORDER BY sp.split"""))

  /** d76: CROSS-SOURCE OVERLAP MATRIX — for every pair of sources, the
    * Jaccard similarity of their distinct word-3-gram shingle sets: the
    * "is source B just a mirror of source A?" audit run before assigning
    * mixture weights (shared crawls, mirrored forums, and re-hosted wikis
    * all light up here long before doc-level dedup finds them).
    *
    * Scale shape: shingles collapse to DISTINCT (source, shingle) rows
    * first — bounded by vocabulary³, not corpus size — then one
    * shingle-keyed self-join. Unlike a doc-pair join, the per-shingle
    * amplification is structurally bounded: one shingle yields at most
    * (#sources choose 2) pairs however many documents contain it, so no
    * stop-shingle pruning is needed. Shingles ride as xxhash64 longs
    * (d41's trick — 8-byte shuffle payload; the oracle keeps exact
    * strings, so a hash collision would surface as an oracle mismatch
    * here, not silent corruption). Jaccard is reported in integer basis
    * points via inclusion-exclusion — no float surface.
    */
  /** The d76 matrix from hashed (doc_id, hs) postings + (doc_id, source)
    * metadata — exposed for planted-corpus specs.
    */
  def sourceOverlap(sh: DataFrame, meta: DataFrame): DataFrame = {
    val ss = sh.join(meta.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("hs")).distinct()
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = ss.as("a")
      .join(ss.as("b"),
        col("a.hs") === col("b.hs") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("intersection"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "src_a")
        .withColumnRenamed("n", "n_a")), "src_a")
      .join(broadcast(sizes.withColumnRenamed("source", "src_b")
        .withColumnRenamed("n", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("intersection"),
        expr("intersection * 10000 div (n_a + n_b - intersection)")
          .as("jaccard_bp"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val d76SourceOverlap: Q = Q(
    "d76_source_overlap",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val sh = Dedup.hashedShingles(docs)
      Q.materialized(sourceOverlap(sh, docs), sh)
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
          unnest(list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
            THEN [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                  for i in range(1, len(words)-1)]
            ELSE [text] END)) AS s
        FROM (SELECT doc_id, text, string_split(text,' ') AS words
              FROM documents) w),
      ss AS (
        SELECT DISTINCT d.source, sh.s
        FROM sh JOIN documents d USING (doc_id)),
      sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS intersection
        FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, intersection,
        intersection * 10000 // (sa.n + sb.n - intersection) AS jaccard_bp
      FROM inter
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY src_a, src_b"""))

  /** d77: LENGTH-BUCKETED BATCH LAYOUT — group documents into 16-token-
    * wide length buckets, fill fixed-size batches of 8 inside each bucket
    * in (length desc, doc_id) order, and report each batch's padding
    * waste: padded = n_docs·max_tokens, waste = padded − Σtokens. This is
    * the "dynamic batching" layout every trainer uses to stop short
    * sequences burning FLOPs as pad tokens — d50's bin PACKING
    * concatenates short docs into one sequence; this op keeps docs intact
    * and co-schedules equals instead.
    *
    * Scale shape: one keyed window per length bucket (bucket count is
    * bounded by max-doc-length/16 — a VALUE bound, not a data bound), then
    * a keyed aggregate per (bucket, batch). All arithmetic is integer;
    * waste is reported in exact basis points of the padded volume.
    */
  /** The d77 layout over any (doc_id, n_tokens) frame — exposed for
    * planted-corpus specs.
    */
  def lengthBatches(sized: DataFrame): DataFrame = {
    val rn = row_number().over(Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens").desc, col("doc_id")))
    sized.withColumn("bucket", expr("n_tokens div 16"))
      .withColumn("rn", rn)
      .withColumn("batch_id", expr("(rn - 1) div 8"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .select(col("bucket"), col("batch_id"), col("n_docs"),
        col("max_tokens"), col("sum_tokens"),
        (col("n_docs") * col("max_tokens") - col("sum_tokens")).as("pad_waste"),
        expr("""(n_docs * max_tokens - sum_tokens) * 10000
                div (n_docs * max_tokens)""").as("waste_bp"))
      .orderBy(col("bucket"), col("batch_id"))
  }

  val d77LengthBatching: Q = Q(
    "d77_length_batching",
    (s, dir) => lengthBatches(
      Q.spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))),
    Some("""
      WITH sized AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(string_split(text, ' ')) AS BIGINT) // 16 AS bucket
        FROM documents),
      ranked AS (
        SELECT bucket, n_tokens,
          (row_number() OVER (PARTITION BY bucket
             ORDER BY n_tokens DESC, doc_id) - 1) // 8 AS batch_id
        FROM sized)
      SELECT bucket, batch_id,
        count(*) AS n_docs,
        max(n_tokens) AS max_tokens,
        CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT) AS pad_waste,
        (count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT)) * 10000
          // (count(*) * max(n_tokens)) AS waste_bp
      FROM ranked GROUP BY bucket, batch_id
      ORDER BY bucket, batch_id"""))
}
