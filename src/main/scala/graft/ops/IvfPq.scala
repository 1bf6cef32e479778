package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import Q.t

/** e60: the COMPLETE IVF-PQ search dataflow — the index layout behind
  * every billion-vector ANN deployment (FAISS `IVFx,PQy`): a coarse
  * quantizer routes each vector to an inverted list, product quantization
  * compresses the RESIDUAL (vector − its coarse centroid), and a query
  * scans only `NProbe` lists, scoring candidates against the reconstructed
  * residuals. Composes e53 (IVF routing alone, float cosine) and e57 (PQ
  * on raw vectors): here PQ encodes residuals, which is what makes the
  * combination accurate enough to ship.
  *
  * Everything runs on the e57 1/512 integer grid, so coarse assignment,
  * residuals, codebook argmins and the final ADC distances are ALL BIGINT
  * arithmetic — the whole index build + search hash-matches the DuckDB
  * oracle bit-for-bit with zero float surface. (A real deployment computes
  * the per-query subspace lookup tables once and scans codes; the scored
  * VALUE is identical — Σ_m ‖(q−c)_m − cb[m][code_m]‖² — and that
  * table-scan micro-layout is a kernel concern below the dataflow level.)
  *
  * Scale shape: the coarse codebook (1 row per list) and PQ codebook
  * (M×K rows) broadcast; corpus assignment and encode are narrow
  * cross-products against those broadcasts with map-side packed argmins
  * (e57's `min(dist·K + id)` trick, so ties break to the lowest id in
  * both engines); the search touches only the probed lists' code rows —
  * the corpus itself is never re-read at query time, exactly the
  * inverted-list contract. Codes are 8 small ints per vector: the 100 TB
  * float corpus becomes a ~1 TB code table.
  */
object IvfPq {

  def pack: Seq[Q] = Seq(e60IvfPqSearch, e62IvfPqRerank, e65IvfPqRecall)

  private val Grid = 512L
  private val Dim = 64
  private val M = 8
  private val SubDim = 8
  private val K = 16
  private val NQueries = 5
  private val NProbe = 2
  private val TopK = 10
  private val CentMod = 37
  /** Coarse-argmin pack factor: must exceed every list id; 2²⁰ keeps
    * dist·Pack ≤ ~2⁶⁰ for the ≤2³⁰ grid L2² distances. List ids are
    * DENSE (`vec_id div CentMod`, not raw vec_ids), so the bound is on
    * the NUMBER of inverted lists — and 2²⁰ lists is far beyond any IVF
    * deployment (FAISS guidance is L ≈ √corpus: a trillion vectors wants
    * ~1M lists). The assignment still fails LOUDLY (`raise_error`) rather
    * than silently corrupting if a caller ever exceeds it.
    */
  private val Pack = 1L << 20

  /** Flat 64-term integer L2² between two grid arrays — pure codegen. */
  private def l2(a: String, b: String): Column =
    (0 until Dim).map { i =>
      val d = element_at(col(a), i + 1) - element_at(col(b), i + 1)
      d * d
    }.reduce(_ + _)

  private def sqlL2(a: String, b: String): String =
    (1 to Dim).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString("+")

  /** The e60 transform over any (vec_id, embedding) frame — exposed for
    * planted-corpus specs. Queries are vec_id < NQueries; corpus ids must
    * be contiguous from NQueries (the PQ codebook trains on the first K
    * corpus residuals, selected as `cid < NQueries + K` to avoid a global
    * ordering pass — at warehouse scale codebook training is a sampled
    * offline step anyway, see e56 for the Lloyd iteration).
    */
  def ivfPqSearch(emb: DataFrame): DataFrame = ivfPqSearch(emb, rerank = false)

  /** Shortlist size for the two-stage e62 path: ADC keeps 3×TopK
    * candidates, the exact stage re-ranks them to TopK.
    */
  private val Shortlist = 30

  def ivfPqSearch(emb: DataFrame, rerank: Boolean): DataFrame = {
    val spark = emb.sparkSession
    val gridT = Q.spread(emb, "vec_id")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * Grid).cast("long")).as("gv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val coarse = gridT.filter(col("vec_id") % CentMod === 0)
      .select(
        // dense list ids (the centroids are exactly the CentMod
        // multiples) + the packed-argmin contract enforced in-plan
        when(expr(s"vec_id div $CentMod") < Pack,
          expr(s"vec_id div $CentMod"))
          .otherwise(raise_error(concat(
            lit("IVF list id overflows the argmin pack factor: "),
            col("vec_id").cast("string")))).as("list_id"),
        col("gv").as("cv"))
    val corpusG = gridT.filter(col("vec_id") >= NQueries)
      .select(col("vec_id").as("cid"), col("gv"))

    // coarse routing: packed integer argmin over the broadcast centroids
    val assign = corpusG.crossJoin(broadcast(coarse))
      .groupBy(col("cid"))
      .agg(min(l2("gv", "cv") * lit(Pack) + col("list_id")).as("p"))
      .select(col("cid"), expr(s"p % $Pack").as("list_id"))
    // the assignment aggregation (the corpus × centroids cross product) is
    // the expensive stage and feeds BOTH the encode and the codebook — and
    // the codebook is re-broadcast once per subspace with per-subspace
    // aliases, which defeats exchange reuse (ReusedExchange requires
    // identical plans). Persist the assigned rows so the cross product
    // runs once, and checkpoint the 16-row codebook flat.
    val corpusRows = corpusG.join(assign, "cid")
      .join(broadcast(coarse), "list_id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // residual PQ codebook: the first K corpus vectors' residuals
    // (interpreted zip_with is fine on K=16 rows, never the corpus)
    val cb16 = corpusRows.filter(col("cid") < NQueries + K)
      .select((col("cid") - NQueries).as("k"),
        zip_with(col("gv"), col("cv"), (a, b) => a - b).as("rcb"))
      .localCheckpoint(true)

    // encode: per-subspace packed argmin of ‖residual_m − cb[m][k]‖²
    val subDists = (0 until M).map { m =>
      val d = (0 until SubDim).map { j =>
        val i = m * SubDim + j + 1
        val term = element_at(col("gv"), i) - element_at(col("cv"), i) -
          element_at(col("rcb"), i)
        term * term
      }.reduce(_ + _)
      min(d * lit(K.toLong) + col("k")).as(s"p$m")
    }
    val codes = corpusRows.crossJoin(broadcast(cb16))
      .groupBy(col("cid"), col("list_id"))
      .agg(subDists.head, subDists.tail: _*)

    // AT-REST INVERTED-LIST LAYOUT (e60 only): persist the code table
    // PARTITIONED BY list_id — the storage form of "search touches only
    // the probed lists". Reading it back and broadcast-joining the probe
    // set on the partition column makes Spark insert a dynamic-partition-
    // pruning filter on the scan, so non-probed lists are skipped at FILE
    // level (never deserialized), not merely dropped by a join. At 100 TB
    // the code table is the ~1 TB artifact that outlives the build job; a
    // query reads NProbe/L of it. The rerank variants (e62/e65) exercise
    // the SEARCH dataflow, not the storage layout — they probe the
    // in-memory codes and skip the scratch write (the DPP property is
    // already spec-pinned on e60's path).
    val dir = if (rerank) None else Some(java.nio.file.Files
      .createTempDirectory("graft_ivfpq_codes").toString)
    val codesForSearch = dir match {
      case None => codes
      case Some(d) =>
        // cluster rows by list before the dynamic-partition write: one
        // file per list, not (tasks × lists) shards of tiny files
        codes.repartition(col("list_id"))
          .write.mode("overwrite").partitionBy("list_id").parquet(d)
        val codeFields = org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.LongType) +:
          ((0 until M).map(m => org.apache.spark.sql.types.StructField(s"p$m",
            org.apache.spark.sql.types.LongType)) :+
            org.apache.spark.sql.types.StructField("list_id",
              org.apache.spark.sql.types.LongType))
        spark.read
          .schema(org.apache.spark.sql.types.StructType(codeFields))
          .parquet(d)
    }

    val queriesG = gridT.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("gv").as("qv"))
    val res =
      if (!rerank) searchCodes(codesForSearch, cb16, coarse, queriesG)
      else {
        // stage 2: the ADC shortlist (3×TopK ids per query) fetches its
        // ORIGINAL grid vectors by key — NProbe·|list| code rows scanned,
        // only Shortlist full vectors per query ever touched — and the
        // exact integer L2 re-ranks to TopK. This is the accuracy knob of
        // every production IVF-PQ deployment: ADC error only has to keep
        // the true neighbor inside the shortlist, not rank it correctly.
        val short = searchCodes(codesForSearch, cb16, coarse, queriesG,
          k = Shortlist).select(col("qid"), col("cid"))
        val wR = Window.partitionBy(col("qid"))
          .orderBy(col("exact_dist"), col("cid"))
        short.join(corpusG, "cid")
          .join(broadcast(queriesG), "qid")
          .select(col("qid"), col("cid"), l2("qv", "gv").as("exact_dist"))
          .withColumn("rank", row_number().over(wR))
          .filter(col("rank") <= TopK)
          .orderBy(col("qid"), col("rank"))
      }
    val out = Q.materialized(res, gridT, corpusRows, cb16)
    // the checkpointed result no longer reads the scratch index — drop it
    dir.foreach { d =>
      val root = java.nio.file.Paths.get(d)
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    out
  }

  /** The LAZY probe-side search over an at-rest `list_id`-partitioned code
    * table — exposed so specs can assert the scan carries a
    * dynamic-partition-pruning filter (probed lists only, at file level).
    */
  def searchCodes(codesAtRest: DataFrame, cb16: DataFrame, coarse: DataFrame,
      queriesG: DataFrame, k: Int = TopK): DataFrame = {
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("pd"), col("list_id"))
    val probes = queriesG.crossJoin(broadcast(coarse))
      .select(col("qid"), col("list_id"), l2("qv", "cv").as("pd"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= NProbe)
      .select(col("qid"), col("list_id"))
    // the probe join lands DIRECTLY on the partitioned scan → DPP
    var rec = codesAtRest.join(broadcast(probes), "list_id")
    // reconstruction: attach each subspace's chosen codebook row
    for (m <- 0 until M)
      rec = rec.join(
        broadcast(cb16.select(col("k").as(s"k$m"), col("rcb").as(s"a$m"))),
        expr(s"p$m % $K") === col(s"k$m"))
    // ADC scoring over the probed lists only
    val adcDist = (0 until M).map { m =>
      (0 until SubDim).map { j =>
        val i = m * SubDim + j + 1
        val term = element_at(col("qv"), i) - element_at(col("cv"), i) -
          element_at(col(s"a$m"), i)
        term * term
      }.reduce(_ + _)
    }.reduce(_ + _)
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("approx_dist"), col("cid"))
    rec
      .join(broadcast(queriesG), "qid")
      .join(broadcast(coarse), "list_id")
      .select(col("qid"), col("cid"), adcDist.as("approx_dist"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** Shared oracle prefix: every CTE through `scored` (the per-candidate
    * ADC distances over the probed lists) — e60 ranks it directly, e62
    * shortlists it and exact-re-ranks.
    */
  private lazy val sqlThroughScored: String = {
      val subDistSql = (0 until M).map { m =>
        val terms = (0 until SubDim).map { j =>
          val i = m * SubDim + j + 1
          s"(r.gv[$i]-r.cv[$i]-b.rcb[$i])*(r.gv[$i]-r.cv[$i]-b.rcb[$i])"
        }.mkString("+")
        s"($terms) AS d$m"
      }.mkString(",\n            ")
      val packMins = (0 until M).map(m => s"min(d$m*$K+k) AS p$m").mkString(", ")
      val cbJoins = (0 until M)
        .map(m => s"JOIN cb cb$m ON cb$m.k = s.p$m % $K").mkString("\n          ")
      val adcSql = (0 until M).map { m =>
        (0 until SubDim).map { j =>
          val i = m * SubDim + j + 1
          s"(q.qv[$i]-co.cv[$i]-cb$m.rcb[$i])*(q.qv[$i]-co.cv[$i]-cb$m.rcb[$i])"
        }.mkString("+")
      }.mkString("\n            + ")
      s"""
      WITH grid AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv
        FROM embeddings),
      coarse AS (
        SELECT vec_id // $CentMod AS list_id, gv AS cv FROM grid
        WHERE vec_id % $CentMod = 0),
      corpus AS (SELECT vec_id AS cid, gv FROM grid WHERE vec_id >= $NQueries),
      assign AS (
        SELECT cid, CAST(min(d * $Pack + list_id) % $Pack AS BIGINT) AS list_id
        FROM (
          SELECT c.cid, co.list_id, ${sqlL2("c.gv", "co.cv")} AS d
          FROM corpus c CROSS JOIN coarse co) t
        GROUP BY cid),
      crows AS (
        SELECT c.cid, a.list_id, c.gv, co.cv
        FROM corpus c JOIN assign a USING (cid) JOIN coarse co USING (list_id)),
      cb AS (
        SELECT cid - $NQueries AS k,
          [gv[i] - cv[i] for i in range(1, ${Dim + 1})] AS rcb
        FROM crows WHERE cid < ${NQueries + K}),
      codes AS (
        SELECT cid, list_id, $packMins
        FROM (
          SELECT r.cid, r.list_id, b.k,
            $subDistSql
          FROM crows r CROSS JOIN cb b) t
        GROUP BY cid, list_id),
      queries AS (SELECT vec_id AS qid, gv AS qv FROM grid WHERE vec_id < $NQueries),
      probes AS (
        SELECT qid, list_id FROM (
          SELECT q.qid, co.list_id,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${sqlL2("q.qv", "co.cv")}, co.list_id) AS pr
          FROM queries q CROSS JOIN coarse co) t
        WHERE pr <= $NProbe),
      scored AS (
        SELECT p.qid, s.cid,
          $adcSql
            AS approx_dist
        FROM codes s JOIN probes p USING (list_id)
          JOIN queries q ON q.qid = p.qid
          JOIN coarse co ON co.list_id = s.list_id
          $cbJoins)"""
  }

  val e60IvfPqSearch: Q = Q(
    "e60_ivfpq_search",
    (s, dir) => ivfPqSearch(t(s, dir, "embeddings")),
    Some(s"""
      $sqlThroughScored
      SELECT qid, cid, approx_dist, rank FROM (
        SELECT qid, cid, approx_dist,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY approx_dist, cid) AS INT) AS rank
        FROM scored) t
      WHERE rank <= $TopK ORDER BY qid, rank"""))

  /** e62: two-stage IVF-PQ search — the e60 ADC pass keeps a 3×TopK
    * shortlist per query, then the exact integer L2 over the shortlist's
    * ORIGINAL vectors produces the final TopK. The shape every production
    * deployment ships: compressed codes bound the scan, the exact stage
    * touches only Shortlist full vectors per query (keyed point lookups,
    * not a corpus pass), and ADC quantization error only has to keep true
    * neighbors inside the shortlist rather than rank them exactly. Fully
    * integer end-to-end — hash-oracled like e60.
    */
  val e62IvfPqRerank: Q = Q(
    "e62_ivfpq_rerank",
    (s, dir) => ivfPqSearch(t(s, dir, "embeddings"), rerank = true),
    Some(s"""
      $sqlThroughScored,
      short AS (
        SELECT qid, cid FROM (
          SELECT qid, cid, row_number() OVER (PARTITION BY qid
            ORDER BY approx_dist, cid) AS r
          FROM scored) t
        WHERE r <= $Shortlist),
      rr AS (
        SELECT s.qid, s.cid, ${sqlL2("q.qv", "c.gv")} AS exact_dist
        FROM short s JOIN queries q USING (qid) JOIN corpus c USING (cid))
      SELECT qid, cid, exact_dist, rank FROM (
        SELECT qid, cid, exact_dist,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY exact_dist, cid) AS INT) AS rank
        FROM rr) t
      WHERE rank <= $TopK ORDER BY qid, rank"""))

  /** e65: the whole-index accuracy claim, ORACLE-PINNED — recall@10 of
    * the e62 two-stage IVF-PQ search against the exhaustive integer-L2
    * ranking. The e59b/e61b/e63 pattern applied to the CAPSTONE: coarse
    * routing error (a true neighbor living in a non-probed list) and ADC
    * shortlist error are both folded into one per-query number the driver
    * hash-compares, so an index regression anywhere in the e60/e62
    * dataflow fails correctness, not just vibes. Exact side is one
    * full-scan pass; the compare joins two ≤ NQueries·TopK row sets.
    */
  val e65IvfPqRecall: Q = Q(
    "e65_ivfpq_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val gridT = Q.spread(emb, "vec_id")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * Grid).cast("long")).as("gv"))
      val q = gridT.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("gv").as("qv"))
      val c = gridT.filter(col("vec_id") >= NQueries)
        .select(col("vec_id").as("cid"), col("gv").as("cv"))
      val wE = Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("cid"))
      val exact = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"), l2("qv", "cv").as("dist"))
        .withColumn("rank", row_number().over(wE))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("cid"))
      val ann = ivfPqSearch(emb, rerank = true)
        .select(col("qid"), col("cid"), lit(1).as("hit"))
      exact.join(ann, Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .select(col("qid"), col("n_exact"), col("n_overlap"),
          org.apache.spark.sql.functions.round(
            col("n_overlap").cast("double") / col("n_exact").cast("double"),
            6).as("recall_at_10"))
        .orderBy(col("qid"))
    },
    Some(s"""
      $sqlThroughScored,
      short AS (
        SELECT qid, cid FROM (
          SELECT qid, cid, row_number() OVER (PARTITION BY qid
            ORDER BY approx_dist, cid) AS r
          FROM scored) t
        WHERE r <= $Shortlist),
      rr AS (
        SELECT s.qid, s.cid, ${sqlL2("q.qv", "c.gv")} AS exact_dist
        FROM short s JOIN queries q USING (qid) JOIN corpus c USING (cid)),
      ann AS (
        SELECT qid, cid FROM (
          SELECT qid, cid, row_number() OVER (PARTITION BY qid
            ORDER BY exact_dist, cid) AS rank
          FROM rr) t
        WHERE rank <= $TopK),
      exact AS (
        SELECT qid, cid FROM (
          SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
            ORDER BY ${sqlL2("q.qv", "c.gv")}, c.cid) AS rank
          FROM corpus c CROSS JOIN queries q) t
        WHERE rank <= $TopK)
      SELECT e.qid, count(*) AS n_exact,
        CAST(sum(CASE WHEN a.cid IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS n_overlap,
        round(CAST(sum(CASE WHEN a.cid IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
          / count(*), 6) AS recall_at_10
      FROM exact e LEFT JOIN ann a ON e.qid = a.qid AND e.cid = a.cid
      GROUP BY e.qid ORDER BY e.qid"""))
}
