package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Deduplication operators for LLM training-data pipelines, from cheap to
  * fuzzy: exact (hash-group), shingle-Jaccard (exact near-dup), MinHash+LSH
  * (scalable near-dup candidates), SimHash (bit-sketch near-dup).
  *
  * Scale design: nothing here ever compares all O(n²) document pairs. Exact
  * dedup shuffles on a 128-bit fingerprint; Jaccard joins only docs sharing
  * a shingle; MinHash-LSH shuffles on (band, band-hash) buckets and
  * verifies only in-bucket candidates; SimHash buckets on 15-bit chunks
  * (pigeonhole: hamming ≤ 3 over 4 chunks ⇒ one chunk equal).
  */
object Dedup {

  def pack: Seq[Q] =
    Seq(d40DedupExact, d41ShingleJaccard, d42MinhashLsh, d42bMinhashRecall,
      d43Simhash, d43bSimhashFidelity, d44EmbeddingNearDup,
      d45EmbeddingNearDupLsh)

  // ---------------------------------------------------------------- shingles

  /** Distinct word 3-gram shingle posting lists (doc_id, s), entirely on
    * the codegen path: posexplode tokens + two leads over (doc, pos) +
    * distinct. (A `transform(sequence(...))` HOF builds the same shingles
    * per-row but runs INTERPRETED — it was the round-1 hot spot of every
    * shingle consumer.) Docs with fewer than 3 tokens contribute their RAW
    * text as the single shingle — the raw column, not re-joined tokens,
    * which would collapse runs of spaces and diverge from the d41 oracle's
    * ELSE [text] branch.
    */
  def shinglePostings(docs: DataFrame): DataFrame = {
    val short = Q.spread(docs, "doc_id")
      .filter(size(split(col("text"), " ")) < 3)
      .select(col("doc_id"), col("text").as("s"))
    nGramPostings(docs, 3).union(short).distinct()
  }

  /** Posting lists with each shingle replaced by its [[mh60]] hash —
    * (doc_id, hs) longs, PERSISTED (callers release via
    * [[Q.materialized]]). ONE hash serves both roles: every wide consumer
    * (self-joins, document-frequency and set-size groupBys) only ever
    * needs shingle EQUALITY, so shuffling/caching 8-byte hashes instead of
    * shingle strings cuts the join payload ~5-10x — and because mh60 is
    * the cross-engine md5 decode, the same value doubles as the MinHash
    * signature base hash that makes d42/d42b fully SQL-oracled. A 60-bit
    * collision across the distinct shingles of one corpus is negligible.
    *
    * Debugging note: the DuckDB oracles (d41/d46/d48/d49) compare exact
    * shingle STRINGS, so if an hs collision ever did occur it would surface
    * as an oracle hash-compare failure on those queries — check this
    * asymmetry first before suspecting the join logic.
    */
  def hashedShingles(docs: DataFrame): DataFrame =
    shinglePostings(docs)
      .select(col("doc_id"), mh60(col("s")).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The 60-bit CROSS-ENGINE string hash: the first 15 hex chars of the
    * md5 digest decoded as an integer. md5 is the one string hash Spark
    * and DuckDB compute bit-identically; 15 hex digits keep the value
    * comfortably inside BIGINT in both engines. Shared by the MinHash
    * (d42) and SimHash (d43) sketch families — the device that makes
    * their outputs hash-oracled.
    */
  def mh60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB mirror of [[mh60]]: decode the first 15 hex chars of md5 into
    * a BIGINT (4 bits per digit, big-endian — exactly what
    * `conv(substring(md5(s),1,15),16,10)` computes in Spark). The ONE
    * definition every oracle shares (d42/d43 here, d33 in TextAnalysis) —
    * the comprehension variable is deliberately collision-proof so the
    * fragment can embed inside any outer query.
    */
  private[ops] def sqlMh(s: String): String =
    s"list_sum([CAST(strpos('0123456789abcdef', md5($s)[__hx]) - 1 AS BIGINT)" +
      s" * (CAST(1 AS BIGINT) << (4*(15-__hx))) for __hx in range(1, 16)])"

  /** Word n-gram posting lists (doc_id, g) on the codegen path
    * (posexplode + n−1 leads; distinct per doc unless `distinctPerDoc` is
    * false — repetition scoring needs the raw multiset). Docs with fewer
    * than n tokens contribute nothing — callers add their own fallback if
    * they need one (shinglePostings does; decontamination deliberately
    * does not).
    */
  def nGramPostings(docs: DataFrame, n: Int,
      distinctPerDoc: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(k => lead(col("tok"), k).over(w).as(s"t$k"))
    val grams = Q.spread(docs, "doc_id")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(Seq(col("doc_id"), col("tok")) ++ leads: _*)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok") +: (1 until n).map(k => col(s"t$k")): _*).as("s"))
    if (distinctPerDoc) grams.distinct() else grams
  }

  /** Exact dedup: keep the lowest doc_id per identical text. */
  val d40DedupExact: Q = Q(
    "d40_dedup_exact",
    (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_copies"))
        .select(col("keep_doc"), col("n_copies"))
        .orderBy(col("keep_doc")),
    Some("""
      SELECT min(doc_id) AS keep_doc, count(*) AS n_copies
      FROM documents GROUP BY text ORDER BY keep_doc"""))

  /** Max docs a shingle may appear in before it is dropped from the d41
    * posting lists (stop-shingle pruning, mirrored in the oracle SQL).
    */
  val MaxShinglePostings = 50

  /** Exact n-gram-Jaccard near-dup pairs: candidate pairs = docs sharing at
    * least one 3-gram shingle (an inverted-index join, never n²); Jaccard
    * from shared/total distinct shingle counts; report pairs ≥ 0.2.
    *
    * Stop-shingle pruning: a shingle appearing in more than
    * [[MaxShinglePostings]] docs is dropped from the posting lists before
    * the pair join — a B-doc posting list yields B² candidate pairs, so one
    * boilerplate shingle would otherwise quadratically dominate the join at
    * corpus scale (same guard as d33's winnowing index). Set sizes stay
    * unpruned, so Jaccard for surviving pairs counts shared NON-hot
    * shingles over TRUE set sizes; a pair overlapping only in hot shingles
    * is reported as no near-dup — the documented trade, mirrored exactly in
    * the oracle.
    */
  /** The exact shingle-Jaccard pair pipeline from (doc_id, hs) hashed
    * posting lists — shared by d41 and the d42b audit (which compares it
    * against the LSH pipeline over the SAME posting-list base).
    */
  private def jaccardPairsFrom(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val hot = sh.groupBy(col("hs"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShinglePostings)
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
          (col("s1.n") + col("s2.n") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy(col("d1"), col("d2"))
  }

  val d41ShingleJaccard: Q = Q(
    "d41_shingle_jaccard",
    (s, dir) => {
      // Posting lists are referenced 3x (sizes + both join sides):
      // materialize them once instead of re-running shingling per branch.
      // Shingle STRINGS are replaced by their mh60 hash before anything
      // wide runs — the self-join and both groupBys then shuffle 8-byte
      // longs instead of full shingle text (~5-10x smaller shuffle
      // payload, smaller cache too). 60-bit collisions are negligible at
      // any realistic distinct-shingle cardinality; the oracle keeps
      // exact strings. The tiny pair table materializes and the cache is
      // dropped — d46's clustering loop then consumes flat pairs instead
      // of re-executing this whole lineage per round.
      val sh = hashedShingles(t(s, dir, "documents"))
      Q.materialized(jaccardPairsFrom(sh), sh)
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
        CAST(shared AS DOUBLE)/(s1.n + s2.n - shared) AS jaccard
      FROM shared
        JOIN sizes s1 ON d1 = s1.doc_id
        JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(shared AS DOUBLE)/(s1.n + s2.n - shared) >= 0.2
      ORDER BY d1, d2"""))

  // ------------------------------------------------------------ MinHash+LSH

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands

  /** Carter-Wegman universal-hash family for re-hashing a base shingle
    * hash: h_i(x) = (A(i)·x + B(i)) mod P, P = 2³¹-1. One string hash per
    * shingle, then 32 cheap modular ops — instead of 32 string hashes — and
    * the min-aggregation runs codegen'd after an explode, which is also the
    * shape that scales horizontally (no giant per-row arrays through
    * interpreted higher-order functions). Products stay < 2⁶², so the
    * arithmetic never overflows under ANSI mode.
    *
    * The seeded (A, B) constants are generated once here and EMBEDDED
    * VERBATIM in the d42/d42b oracle SQL as a VALUES relation (the d45/e61
    * pattern), and the base hash `mh` is the cross-engine md5 decode of
    * [[hashedShingles]] — so both engines compute bit-identical signatures
    * and the sketch output itself is hash-oracled.
    */
  private val MersenneP = 2147483647L // 2^31 - 1
  private val hashFamily: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(13)
    IndexedSeq.fill(NumHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
  }

  /** The hash family as oracle-side VALUES rows (i, a, b). */
  private def famValuesSql: String =
    hashFamily.zipWithIndex
      .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(",")

  /** doc_id → 32-element MinHash signature from (doc_id, hs) hashed
    * posting lists: one codegen'd min-aggregate per hash function (one
    * shuffle on doc_id), over the cross-engine md5 base hash.
    */
  private def signaturesFromPostings(sh: DataFrame): DataFrame = {
    val hashed = sh
      .select(col("doc_id"), pmod(col("hs"), lit(MersenneP)).as("h"))
    val aggs = hashFamily.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersenneP))).as(s"m$i")
    }
    hashed.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** The full MinHash+LSH near-dup pipeline as a reusable transform:
    * shingle posting lists → signature → band buckets → in-bucket candidate
    * pairs → verify with exact Jaccard, computed by joining the candidate
    * pairs back onto the posting lists (shared-shingle counts over true set
    * sizes) — no per-row shingle ARRAYS anywhere, so every stage stays on
    * the codegen path. The only wide ops are the signature groupBy, the
    * bucket join (on band hash), the candidate dedup, and the verify join.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = hashedShingles(docs)
    val (res, sigs, cand) = minhashPairsFrom(sh, threshold)
    Q.materialized(res, sh, sigs, cand)
  }

  /** The LSH pair pipeline from (doc_id, hs) hashed posting lists; returns
    * (result, persisted signature table, checkpointed candidate table —
    * caller releases both). Shared by d42 and the d42b audit.
    */
  private def minhashPairsFrom(sh: DataFrame,
      threshold: Double): (DataFrame, DataFrame, DataFrame) = {
    // The signature table is referenced 3x downstream (banding + two
    // estimate joins); Spark re-executes shared subplans per reference,
    // so materialize it once. O(docs) rows — at warehouse scale this is
    // the "write the signature table" step of a dedup pipeline.
    val sigs = signaturesFromPostings(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col("doc_id"),
      explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // referenced 3x (doc cut, shared count, final assembly) and tiny (it
    // IS the LSH output): materialize the pair table once — three lazy
    // references would re-run the band self-join each time
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .localCheckpoint(true)
    // The verify join touches only candidate DOCS, so cut the posting lists
    // down first with a semi-join against the (tiny, broadcast) candidate
    // doc set — round 2's form expanded candidates × ALL shingles of d1
    // before the (d2, hs) probe ever pruned anything.
    val candDocs = candidates.select(col("d1").as("doc_id"))
      .union(candidates.select(col("d2").as("doc_id")))
      .distinct()
    val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // shared-shingle count PER CANDIDATE PAIR only (never the full inverted
    // self-join — that is d41's exact mode; here the LSH buckets already
    // bounded the pair set)
    val shared = candidates
      .join(shCand.select(col("doc_id").as("d1"), col("hs")), "d1")
      .join(shCand.select(col("doc_id").as("d2"), col("hs")), Seq("d2", "hs"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
    // flat 32-term codegen sum, NOT aggregate(zip_with(...)): the
    // interpreted HOF pair dragged the whole final projection off
    // whole-stage codegen
    val sigMatches = (0 until NumHashes).map { i =>
      when(element_at(col("sig1"), i + 1) === element_at(col("sig2"), i + 1),
        1).otherwise(0)
    }.reduce(_ + _)
    val res = candidates
      .join(shared, Seq("d1", "d2"), "left") // zero-overlap pairs → shared 0
      .na.fill(0L, Seq("shared"))
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .select(
        col("d1"), col("d2"),
        (sigMatches.cast("double") / NumHashes).as("est_jaccard"),
        (col("shared").cast("double") /
          (col("n1") + col("n2") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))
    (res, sigs, candidates)
  }

  /** The full MinHash+LSH pipeline as DuckDB CTEs, generated from the SAME
    * constants as the Spark plan ([[famValuesSql]], [[sqlMh]]): shingles →
    * md5 base hash → Carter-Wegman signatures → 8 bands of 4 rows →
    * in-bucket candidates → exact-Jaccard verify. The one asymmetry: Spark
    * buckets on xxhash64 of each 4-element band slice while the oracle joins
    * on the band VALUES themselves — equal slices hash equal, so the two
    * candidate sets differ only under a 64-bit band-hash collision
    * (negligible, and it would surface as a hash-compare failure here).
    * Spark-side verify counts shared hs-hashed shingles vs the oracle's
    * exact strings — the same documented d41 asymmetry.
    */
  /** Shingle posting lists + set sizes as DuckDB CTEs — the shared base of
    * the d41-family oracles (d42/d42b/d43b compose on top of it).
    */
  private def sqlShingleCtes: String = s"""
      words AS (SELECT doc_id, text, string_split(text,' ') AS words FROM documents),
      sh AS (
        SELECT doc_id,
          unnest(list_distinct(CASE WHEN len(words) >= 3
            THEN [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                  for i in range(1, len(words)-1)]
            ELSE [text] END)) AS s
        FROM words),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""

  /** The exact d41 near-dup pair set (stop-shingle-pruned candidates,
    * Jaccard >= 0.2) as CTEs over [[sqlShingleCtes]] — the ground-truth
    * side of the d42b/d43b sketch audits.
    */
  private def sqlExactPairsCtes: String = s"""
      pruned AS (
        SELECT * FROM sh
        WHERE s NOT IN (SELECT s FROM sh GROUP BY s
                        HAVING count(*) > $MaxShinglePostings)),
      eshared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
        FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      exact_pairs AS (
        SELECT d1, d2 FROM eshared
          JOIN sizes s1 ON d1 = s1.doc_id
          JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(shared AS DOUBLE)/(s1.n + s2.n - shared) >= 0.2)"""

  private def sqlMinhashCtes: String = s"""
      $sqlShingleCtes,
      mh AS (SELECT doc_id, ${sqlMh("s")} AS mh FROM sh),
      fam(i, a, b) AS (VALUES $famValuesSql),
      sigs AS (
        SELECT doc_id, f.i AS i,
          min((f.a * (mh.mh % $MersenneP) + f.b) % $MersenneP) AS m
        FROM mh CROSS JOIN fam f GROUP BY doc_id, f.i),
      bands AS (
        SELECT doc_id, i // $RowsPerBand AS band, list(m ORDER BY i) AS bs
        FROM sigs GROUP BY doc_id, i // $RowsPerBand),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bs = b.bs AND a.doc_id < b.doc_id),
      shr AS (
        SELECT c.d1, c.d2, count(*) AS shared
        FROM cand c
          JOIN sh p1 ON p1.doc_id = c.d1
          JOIN sh p2 ON p2.doc_id = c.d2 AND p2.s = p1.s
        GROUP BY c.d1, c.d2),
      est AS (
        SELECT c.d1, c.d2,
          CAST(sum(CASE WHEN s1.m = s2.m THEN 1 ELSE 0 END) AS DOUBLE)
            / $NumHashes AS est_jaccard
        FROM cand c
          JOIN sigs s1 ON s1.doc_id = c.d1
          JOIN sigs s2 ON s2.doc_id = c.d2 AND s2.i = s1.i
        GROUP BY c.d1, c.d2),
      lsh_pairs AS (
        SELECT e.d1, e.d2, e.est_jaccard,
          CAST(s.shared AS DOUBLE) / (z1.n + z2.n - s.shared) AS jaccard
        FROM est e
          JOIN shr s ON s.d1 = e.d1 AND s.d2 = e.d2
          JOIN sizes z1 ON e.d1 = z1.doc_id
          JOIN sizes z2 ON e.d2 = z2.doc_id
        WHERE CAST(s.shared AS DOUBLE) / (z1.n + z2.n - s.shared) >= 0.2)"""

  /** MinHash-LSH near-dups over the documents table, FULLY HASH-ORACLED:
    * the md5 base hash plus the VALUES-embedded hash family make both
    * engines compute bit-identical signatures, buckets, and scores (the
    * d45/e61 determinization pattern applied to the MinHash family).
    * DedupSpec additionally pins recall on planted near-duplicates, and
    * [[d42bMinhashRecall]] oracle-pins the corpus-wide recall itself.
    */
  val d42MinhashLsh: Q = Q(
    "d42_minhash_lsh",
    (s, dir) => minhashNearDups(t(s, dir, "documents"), threshold = 0.2),
    Some(s"""
      -- TRIAGE on hash mismatch: the Spark side buckets bands on xxhash64
      -- of each 4-element signature slice and verifies Jaccard over 60-bit
      -- hashed shingles; this oracle joins raw slices and exact strings.
      -- A (negligible-probability) band-hash or mh60 collision therefore
      -- shows up HERE as a hash-compare failure, not as a caught bug —
      -- rule that out before suspecting the pipeline (see sqlMinhashCtes).
      WITH $sqlMinhashCtes
      SELECT d1, d2, est_jaccard, jaccard FROM lsh_pairs ORDER BY d1, d2"""))

  /** Accuracy audit for the MinHash-LSH sketch: joins the LSH pair set
    * against the exact d41 inverted-index pair set IN-QUERY and emits one
    * row of counts + recall/precision — and since the signature pipeline is
    * cross-engine deterministic (see [[sqlMinhashCtes]]), the recall number
    * ITSELF is oracle-pinned (the e61b pattern). Semantics note: d41
    * prunes stop-shingles from candidate generation while the LSH verify
    * scores unpruned Jaccard over its own candidates, so the two sets can
    * legitimately differ beyond sketch error; recall is measured against
    * d41's output as the declared exact baseline. Both pipelines run off
    * ONE shared persisted posting-list base (shingling is their common
    * dominant cost — no point paying it twice in an audit of the same
    * corpus), released after the one-row result materializes.
    */
  val d42bMinhashRecall: Q = Q(
    "d42b_minhash_recall",
    (s, dir) => {
      val sh = hashedShingles(t(s, dir, "documents"))
      val exact = jaccardPairsFrom(sh).select(col("d1"), col("d2"))
      val (lshRes, sigs, cand) = minhashPairsFrom(sh, threshold = 0.2)
      val lsh = lshRes.select(col("d1"), col("d2"))
      val cmp = exact.withColumn("in_exact", lit(1))
        .join(lsh.withColumn("in_lsh", lit(1)), Seq("d1", "d2"), "full_outer")
        .agg(
          sum(coalesce(col("in_exact"), lit(0))).cast("long").as("n_exact"),
          sum(coalesce(col("in_lsh"), lit(0))).cast("long").as("n_lsh"),
          sum(when(col("in_exact") === 1 && col("in_lsh") === 1, 1)
            .otherwise(0)).cast("long").as("n_both"))
        .select(col("n_exact"), col("n_lsh"), col("n_both"),
          (col("n_both").cast("double") / col("n_exact")).as("recall"),
          (col("n_both").cast("double") / col("n_lsh")).as("precision"))
      Q.materialized(cmp, sh, sigs, cand)
    },
    Some(s"""
      -- TRIAGE on hash mismatch: see d42_minhash_lsh — a band-hash/mh60
      -- collision presents here as an oracle hash failure, not a caught bug.
      WITH $sqlMinhashCtes,
      $sqlExactPairsCtes,
      cmp AS (
        SELECT coalesce(e.ie, 0) AS ie, coalesce(l.il, 0) AS il
        FROM (SELECT d1, d2, 1 AS ie FROM exact_pairs) e
        FULL OUTER JOIN (SELECT d1, d2, 1 AS il FROM lsh_pairs) l
          USING (d1, d2)),
      agg AS (
        SELECT CAST(sum(ie) AS BIGINT) AS n_exact,
          CAST(sum(il) AS BIGINT) AS n_lsh,
          CAST(sum(CASE WHEN ie = 1 AND il = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_both
        FROM cmp)
      SELECT n_exact, n_lsh, n_both,
        CAST(n_both AS DOUBLE)/n_exact AS recall,
        CAST(n_both AS DOUBLE)/n_lsh AS "precision"
      FROM agg"""))

  // ------------------------------------------------- embedding-cosine near-dup

  /** Embedding-cosine near-duplicate pairs, blocked by the `label` metadata
    * column: only same-label vectors are compared (metadata blocking is the
    * first-line candidate cut in embedding dedup — at corpus scale the
    * block join replaces the all-pairs product; swap in LSH buckets when no
    * blocking key exists).
    *
    * Two-pass scoring: the codegen'd native `cosine_sim` filters every
    * in-block pair at (threshold − ε) IN THE SAME STAGE as the block join
    * (no extra shuffle), then the exact order-independent decimal cosine —
    * which keeps the oracle compare bit-stable — re-scores only the ~0.1%
    * of pairs that survive. Native double and exact decimal agree to
    * ~1e-12, so the ε = 1e-6 margin makes the prefilter lossless; the
    * final exact `>= threshold` filter reproduces the all-decimal result
    * bit-for-bit (round-1 profile: 21.8 s → the interpreted decimal now
    * touches only survivors).
    */
  val d44EmbeddingNearDup: Q = Q(
    "d44_embedding_neardup",
    (s, dir) => {
      graft.expr.GraftFunctions.register(s)
      val S = graft.ops.Similarity
      val emb = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"), col("label"), col("embedding"))
      val a = emb.select(col("label"), col("vec_id").as("v1"),
        col("embedding").as("e1"))
      val b = emb.select(col("label"), col("vec_id").as("v2"),
        col("embedding").as("e2"))
      a.join(b, Seq("label"))
        .filter(col("v1") < col("v2"))
        .filter(S.cosNative(col("e1"), col("e2")) >= 0.3 - S.Eps)
        .select(col("label"), col("v1"), col("v2"),
          S.cosExact(col("e1"), col("e2")).as("cos"))
        .filter(col("cos") >= 0.3)
        .select(col("label"), col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
        .orderBy(col("v1"), col("v2"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, label, embedding,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS norm
        FROM (SELECT vec_id, label, embedding, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id, label, embedding),
      pairs AS (
        SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
          a.embedding AS e1, b.embedding AS e2, a.norm AS n1, b.norm AS n2
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
      dots AS (
        SELECT label, v1, v2, n1, n2,
          CAST(sum(CAST(CAST(x1 AS DOUBLE)*CAST(x2 AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT label, v1, v2, n1, n2, unnest(e1) AS x1, unnest(e2) AS x2
              FROM pairs) t
        GROUP BY label, v1, v2, n1, n2)
      SELECT label, v1, v2, round(dot/(n1*n2), 6) AS cos
      FROM dots WHERE dot/(n1*n2) >= 0.3
      ORDER BY v1, v2"""))

  // ------------------------------------- LSH-gated embedding near-dup (d45)

  /** Sub-block geometry: 32 sign-planes grouped into 4 chunks of 8 bits.
    * Each plane is a SPARSE ±1 projection over [[SubPlaneCoords]] of the 64
    * embedding dims (very-sparse random projections, Achlioptas/Li family).
    * ±1 weights + exact-decimal summation make the sign BIT-STABLE across
    * engines, so the bucketing — unlike Gaussian-double hyperplanes — can
    * be mirrored verbatim in the DuckDB oracle.
    */
  val SubPlanes = 32
  val ChunkBits = 8
  val NumChunks: Int = SubPlanes / ChunkBits
  val SubPlaneCoords = 8

  /** plane → Seq[(0-based dim index, ±1 weight)], seeded deterministic. */
  private[ops] val subPlaneTable: IndexedSeq[Seq[(Int, Int)]] = {
    val rnd = new scala.util.Random(7)
    IndexedSeq.fill(SubPlanes)(
      rnd.shuffle((0 until 64).toList).take(SubPlaneCoords).sorted
        .map(i => (i, if (rnd.nextBoolean()) 1 else -1)))
  }

  /** Exact-decimal sign bit of one sparse projection — a flat codegen'd
    * expression (element_at + decimal adds), no interpreted HOF.
    */
  private def signBit(v: Column, plane: Seq[(Int, Int)]): Column =
    plane.map { case (i, w) =>
      (lit(w.toDouble) * element_at(v, i + 1).cast("double"))
        .cast(org.apache.spark.sql.types.DecimalType(20, 15))
    }.reduce(_ + _) > 0

  /** 4 (chunk index, 8-bit chunk value) rows per vector — the sub-block
    * join key. Two steps ON PURPOSE: the 32 sign bits materialize as plain
    * projection columns first (whole-stage codegen splits wide projections
    * into helper methods), and only the cheap bit-packing rides inside the
    * Generate — one fused expression tree overflowed Janino's method limit
    * and silently dropped the stage to interpreted execution.
    */
  private def withChunks(df: DataFrame, v: String): DataFrame = {
    val bits = (0 until SubPlanes).map(p =>
      signBit(col(v), subPlaneTable(p)).as(s"__b$p"))
    df.select(df.columns.map(col) ++ bits: _*)
      .select(col("vec_id"), col("label"),
        explode(array((0 until NumChunks).map { j =>
          struct(lit(j).as("j"),
            (0 until ChunkBits).map { b =>
              when(col(s"__b${j * ChunkBits + b}"), lit(1L << b)).otherwise(0L)
            }.reduce(_ + _).as("chunk"))
        }: _*)).as("c"))
      .select(col("vec_id"), col("label"), col("c.j").as("j"), col("c.chunk").as("chunk"))
  }

  /** The oracle-side mirror of [[subPlaneTable]]: VALUES rows (p, i, wt)
    * with i 0-based.
    */
  private def subPlaneValuesSql: String =
    subPlaneTable.zipWithIndex.flatMap { case (plane, p) =>
      plane.map { case (i, w) => s"($p,$i,$w)" }
    }.mkString(",")

  /** Embedding near-dup with an LSH sub-block INSIDE each label block —
    * the hot-label guard d44 deliberately omits: d44 compares all O(B²)
    * same-label pairs (exact semantics), so one degenerate label with B
    * vectors costs B² native scores. Here a candidate pair must also share
    * one of 4 8-bit sign-chunk buckets, so the join key is
    * (label, chunk_j, chunk_value) and a hot label fans out into ~256
    * sub-buckets per chunk table — pairs drop ~64× while sign-sketch
    * locality keeps high-cosine pairs co-bucketed. Recall < 1 by design
    * (standard LSH trade); the bucketing is deterministic ±1/exact-decimal
    * arithmetic, so the oracle reproduces the candidate set bit-for-bit
    * and the compare stays exact. Scoring is the same two-pass
    * native-prefilter + exact-decimal re-rank as d44.
    */
  /** The lazy d45 pipeline: (result, persisted sketch). Exposed so specs
    * can audit the pre-materialization physical plan (the Q entry wraps it
    * in [[Q.materialized]], whose RDD scan hides the executed operators);
    * callers must release the returned sketch.
    */
  def embeddingNearDupsLsh(emb: DataFrame): (DataFrame, DataFrame) = {
    val S = graft.ops.Similarity
    // both sides of the self-join read the sketch: materialize it once
    // (at warehouse scale this is the "write the sketch table" step)
    val chunked = withChunks(emb, "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = chunked.as("a")
      .join(chunked.as("b"),
        col("a.label") === col("b.label") && col("a.j") === col("b.j") &&
          col("a.chunk") === col("b.chunk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct() // a pair may co-bucket in up to 4 chunks; score it once
    val res = pairs
      .join(emb.select(col("vec_id").as("v1"), col("embedding").as("e1")), "v1")
      .join(emb.select(col("vec_id").as("v2"), col("embedding").as("e2")), "v2")
      .filter(S.cosNative(col("e1"), col("e2")) >= 0.3 - S.Eps)
      .select(col("label"), col("v1"), col("v2"),
        S.cosExact(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("label"), col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
      .orderBy(col("v1"), col("v2"))
    (res, chunked)
  }

  val d45EmbeddingNearDupLsh: Q = Q(
    "d45_embedding_neardup_lsh",
    (s, dir) => {
      graft.expr.GraftFunctions.register(s)
      val emb = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"), col("label"), col("embedding"))
      val (res, chunked) = embeddingNearDupsLsh(emb)
      Q.materialized(res, chunked)
    },
    Some(s"""
      WITH w(p, i, wt) AS (VALUES $subPlaneValuesSql),
      bits AS (
        SELECT e.vec_id, w.p,
          CASE WHEN sum(CAST(CAST(w.wt AS DOUBLE) * CAST(e.embedding[w.i + 1] AS DOUBLE)
                             AS DECIMAL(20,15))) > 0
               THEN 1 ELSE 0 END AS b
        FROM embeddings e CROSS JOIN w
        GROUP BY e.vec_id, w.p),
      chunks AS (
        SELECT vec_id, p // 8 AS j, sum(b * (1 << (p % 8))) AS chunk
        FROM bits GROUP BY vec_id, p // 8),
      cand AS (
        SELECT DISTINCT ea.label, ca.vec_id AS v1, cb.vec_id AS v2
        FROM chunks ca
          JOIN embeddings ea ON ca.vec_id = ea.vec_id
          JOIN chunks cb ON ca.j = cb.j AND ca.chunk = cb.chunk
                        AND ca.vec_id < cb.vec_id
          JOIN embeddings eb ON cb.vec_id = eb.vec_id AND eb.label = ea.label),
      norms AS (
        SELECT vec_id,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS nrm
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id),
      dots AS (
        SELECT label, v1, v2,
          CAST(sum(CAST(CAST(x1 AS DOUBLE)*CAST(x2 AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT c.label, c.v1, c.v2, unnest(e1.embedding) AS x1, unnest(e2.embedding) AS x2
              FROM cand c JOIN embeddings e1 ON e1.vec_id = c.v1
                          JOIN embeddings e2 ON e2.vec_id = c.v2) t
        GROUP BY label, v1, v2)
      SELECT d.label, d.v1, d.v2, round(d.dot/(n1.nrm*n2.nrm), 6) AS cos
      FROM dots d JOIN norms n1 ON d.v1 = n1.vec_id
                  JOIN norms n2 ON d.v2 = n2.vec_id
      WHERE d.dot/(n1.nrm*n2.nrm) >= 0.3
      ORDER BY v1, v2"""))

  // ---------------------------------------------------------------- SimHash

  /** SimHash geometry: 60 bits (the [[mh60]] cross-engine hash width) in
    * 4 chunks of 15 — hamming ≤ 3 over 4 chunks still pigeonholes to one
    * equal chunk.
    */
  val SimBits = 60
  val SimChunks = 4
  val SimChunkBits: Int = SimBits / SimChunks

  /** 60-bit SimHash per doc: hash each distinct token with the
    * cross-engine [[mh60]]; each output bit is the sign of the per-bit
    * vote sum. One explode + one groupBy shuffle. Because the base hash is
    * engine-portable, the whole sketch is hash-oracled (see d43's SQL).
    *
    * The per-bit one-counts are SIMD-packed three to a long (21-bit lanes),
    * so the shuffle/agg state is 20 longs per doc instead of 60 and each
    * input row folds with 20 adds instead of 60 conditional sums. The sign
    * test `votes_b > 0` ⟺ `2·count_b > n`, so the output bits are
    * identical to the naive form (pinned by PropertySpec). Lane arithmetic
    * is exact for up to 2²⁰ distinct tokens per document — beyond any sane
    * document; a larger doc should be chunked upstream anyway.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val LaneBits = 21
    val LanesPerPack = 3
    val packs = (0 until SimBits).grouped(LanesPerPack).toSeq.zipWithIndex.map {
      case (bs, g) =>
        sum(bs.zipWithIndex.map { case (b, j) =>
          shiftright(col("h"), b).bitwiseAND(lit(1L)) * lit(1L << (LaneBits * j))
        }.reduce(_ + _)).as(s"p$g")
    }
    val voted = Q.spread(docs, "doc_id")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .select(col("doc_id"), mh60(col("tok")).as("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), packs: _*)
    val bits = (0 until SimBits).map { b =>
      val g = b / LanesPerPack
      val j = b % LanesPerPack
      val cnt = shiftright(col(s"p$g"), LaneBits * j)
        .bitwiseAND(lit((1L << LaneBits) - 1))
      when(cnt * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(0L)
    }
    voted.select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ 3, found by chunk
    * bucketing: split the 60-bit hash into 4×15-bit chunks; any pair within
    * distance 3 shares at least one chunk (pigeonhole), so the join is on
    * (chunk index, chunk value) — never all-pairs.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val hashed = simhash(docs)
    val chunked = hashed.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until SimChunks).map { j =>
        struct(lit(j).as("j"),
          shiftright(col("simhash"), j * SimChunkBits)
            .bitwiseAND(lit((1L << SimChunkBits) - 1)).as("chunk"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.j").as("j"), col("c.chunk").as("chunk"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.j") === col("b.j") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("d1"), col("d2"))
  }

  /** The 60-bit SimHash signature table as DuckDB CTEs: distinct tokens →
    * [[sqlMh]] base hash → per-bit majority votes (the oracle unnests the
    * 60 bit positions — a 60× blowup of the token stream that only the
    * ORACLE pays; the Spark side keeps its lane-packed single aggregate).
    */
  private def sqlSimSigCtes: String = s"""
      toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok
        FROM documents),
      th AS (SELECT doc_id, ${sqlMh("tok")} AS h FROM toks),
      tcnt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
      votes AS (
        SELECT doc_id, b.bit, sum((h >> b.bit) & 1) AS ones
        FROM th CROSS JOIN (SELECT unnest(range(0, $SimBits)) AS bit) b
        GROUP BY doc_id, b.bit),
      sig AS (
        SELECT v.doc_id,
          CAST(sum(CASE WHEN 2*ones > n THEN (CAST(1 AS BIGINT) << bit)
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM votes v JOIN tcnt USING (doc_id) GROUP BY v.doc_id)"""

  /** SimHash near-dups over documents, FULLY HASH-ORACLED: the [[mh60]]
    * base hash makes both engines compute bit-identical signatures, so the
    * oracle replays the votes, the chunk bucketing, and the hamming filter
    * verbatim. DedupSpec additionally pins behavior on planted duplicates,
    * and [[d43bSimhashFidelity]] oracle-pins the corpus-wide fidelity.
    */
  val d43Simhash: Q = Q(
    "d43_simhash",
    (s, dir) => simhashNearDups(t(s, dir, "documents")),
    Some(s"""
      WITH $sqlSimSigCtes,
      chunks AS (
        SELECT doc_id, simhash, j.j,
          (simhash >> (j.j * $SimChunkBits)) & ${(1L << SimChunkBits) - 1} AS chunk
        FROM sig CROSS JOIN (SELECT unnest(range(0, $SimChunks)) AS j) j),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
          bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM chunks a JOIN chunks b
          ON a.j = b.j AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
      SELECT d1, d2, CAST(hamming AS INT) AS hamming FROM cand
      WHERE hamming <= 3 ORDER BY d1, d2"""))

  /** Fidelity audit for the SimHash sketch. The chunked candidate join of
    * [[simhashNearDups]] is COMPLETE by pigeonhole (its own recall is
    * exactly 1), so the meaningful audit is how faithfully the 60-bit
    * sketch tracks true textual similarity: take the exact d41 near-dup
    * pairs (Jaccard ≥ 0.2) and report their SimHash hamming distances —
    * count, mean, and the share within 16 bits (the SketchAuditSpec "near"
    * band). With the [[mh60]] base hash the fidelity numbers themselves
    * are oracle-pinned (the e61b pattern). One row; the d41 side is the
    * tiny materialized pair table and simhash is one extra corpus pass.
    */
  val d43bSimhashFidelity: Q = Q(
    "d43b_simhash_fidelity",
    (s, dir) => {
      val pairs = d41ShingleJaccard.run(s, dir).select(col("d1"), col("d2"))
      // referenced twice (d1 and d2 sides) and tiny (doc_id, long): compute
      // the sketch once
      val hs = simhash(t(s, dir, "documents")).localCheckpoint(true)
      val res = pairs
        .join(hs.select(col("doc_id").as("d1"), col("simhash").as("h1")), "d1")
        .join(hs.select(col("doc_id").as("d2"), col("simhash").as("h2")), "d2")
        .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
        .agg(count(lit(1)).cast("long").as("n_exact_pairs"),
          avg(col("hamming")).as("mean_hamming"),
          sum(when(col("hamming") <= 16, 1).otherwise(0)).cast("long")
            .as("n_within_16"))
        .select(col("n_exact_pairs"), col("mean_hamming"), col("n_within_16"),
          (col("n_within_16").cast("double") / col("n_exact_pairs"))
            .as("share_within_16"))
      // one-row result; release the sketch table and d41's materialized
      // pair table once it lands
      Q.materialized(res, hs, pairs)
    },
    Some(s"""
      WITH $sqlShingleCtes,
      $sqlExactPairsCtes,
      $sqlSimSigCtes,
      ph AS (
        SELECT bit_count(xor(s1.simhash, s2.simhash)) AS hamming
        FROM exact_pairs p
          JOIN sig s1 ON s1.doc_id = p.d1
          JOIN sig s2 ON s2.doc_id = p.d2)
      SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
        avg(hamming) AS mean_hamming,
        CAST(sum(CASE WHEN hamming <= 16 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_within_16,
        CAST(sum(CASE WHEN hamming <= 16 THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*) AS share_within_16
      FROM ph"""))
}
