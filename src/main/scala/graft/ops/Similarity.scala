package graft.ops

import graft.expr.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q.t

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane LSH-bucketed
  * variant as the scale path.
  *
  * Scale design: the query set is broadcast, candidates stay distributed, so
  * brute force is a single narrow pass over the corpus (map-side top-k via
  * the rank window on qid — #queries × corpus rows, no shuffle of the
  * corpus). The LSH variant cuts the per-query work to one bucket.
  *
  * All scorers are TWO-PASS: the codegen'd native `cosine_sim` expression
  * (graft.expr.CosineSimilarity) scores every candidate, and the exact
  * order-independent decimal form re-scores only the survivors near the
  * rank/threshold boundary. Native double and exact decimal agree to
  * ~1e-12 on unit-scale 64-dim vectors, so an `Eps = 1e-6` margin around
  * the boundary guarantees the survivor set is a superset of the exact
  * answer — the output stays bit-identical to the all-decimal form while
  * the interpreted-decimal work drops from O(candidates) to O(k).
  */
object Similarity {

  def pack: Seq[Q] =
    Seq(e50CosineTopK, e51AnnLsh, e51bAnnRecall, e53AnnIvf, e54Quantize,
      e55MipsTopK, e56KmeansStep)

  /** Native-vs-exact disagreement margin (see object doc). Must exceed
    * 2× the true |native − exact| error (~1e-12) by a wide factor.
    */
  val Eps = 1e-6

  /** Exact decimal dot product of two float vectors, returned as DOUBLE.
    * Each product is widened to double (exact) then cast to decimal so the
    * sum is order-independent — bit-identical across engines, which keeps
    * ranking deterministic for the oracle compare (see Q.dec2 notes).
    * Runs INTERPRETED (higher-order functions have no codegen): use only on
    * boundary survivors of a native prefilter, never as the bulk scorer.
    */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast(DecimalType(20, 15))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(20, 15)),
      (acc, v) => (acc + v).cast(DecimalType(20, 15)))
      .cast("double")

  def l2Norm(v: Column): Column = sqrt(dotExact(v, v))

  /** Exact-decimal cosine — the oracle-parity scorer for boundary rows. */
  def cosExact(a: Column, b: Column): Column =
    dotExact(a, b) / (l2Norm(a) * l2Norm(b))

  /** Native codegen'd cosine (graft.expr.CosineSimilarity) — the bulk
    * scorer. Callers must GraftFunctions.register the session first.
    */
  def cosNative(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Native codegen'd inner product (graft.expr.DotProduct) — the MIPS
    * bulk scorer; one fused array walk, no normalization.
    */
  def dotNative(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Shared top-k tail: rank scored (qid, cid, cos) pairs per query on full
    * precision, keep k, report cos at 6dp (see dotExact on why), ordered.
    */
  def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Two-pass top-k: `fast` is natively scored pairs (qid, cid, cosf).
    * Keep the native top-k plus everything within `eps` of the k-th native
    * score (a guaranteed superset of the exact top-k), then re-score just
    * those rows with the exact-decimal `scorer` against the (qid→qv) /
    * (cid→cv) lookup sides and rank. The window shuffle carries only
    * narrow (qid, cid, cosf) rows — vectors rejoin after the cut.
    * `scorer` defaults to exact cosine; MIPS passes exact dot (whose
    * larger magnitude needs a correspondingly larger eps).
    */
  def exactRerank(fast: DataFrame, queries: DataFrame, corpus: DataFrame,
      k: Int, scorer: (Column, Column) => Column = cosExact,
      eps: Double = Eps): DataFrame = {
    val wOrd = Window.partitionBy(col("qid")).orderBy(col("cosf").desc, col("cid"))
    val wAll = Window.partitionBy(col("qid"))
    val surv = fast
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("kth", max(when(col("rk") === k, col("cosf"))).over(wAll))
      // kth is null when a query has < k candidates; rk <= k then keeps all
      .filter(col("rk") <= k || col("cosf") >= col("kth") - eps)
      .select(col("qid"), col("cid"))
    rankTopK(
      surv.join(corpus, "cid").join(broadcast(queries), "qid")
        .select(col("qid"), col("cid"), scorer(col("qv"), col("cv")).as("cos")),
      k)
  }

  /** Brute-force cosine top-10 for query vectors vec_id < 5 against the
    * rest of the corpus: one narrow native-scored pass over the corpus,
    * exact-decimal re-rank of ~k rows per query.
    */
  val e50CosineTopK: Q = Q(
    "e50_cosine_topk",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"), cosNative(col("qv"), col("cv")).as("cosf"))
      exactRerank(fast, q, c, k = 10)
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 5),
      qn AS (
        SELECT qid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS qnorm
        FROM (SELECT qid, unnest(qv) AS x FROM q) t GROUP BY qid),
      cn AS (
        SELECT cid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS cnorm
        FROM (SELECT cid, unnest(cv) AS x FROM c) t GROUP BY cid),
      dots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid)
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM (
        SELECT d.qid, d.cid, d.dot/(qn.qnorm*cn.cnorm) AS cos,
          CAST(row_number() OVER (PARTITION BY d.qid
                             ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS INT) AS rank
        FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
      WHERE rank <= 10 ORDER BY qid, rank"""))

  /** Symmetric int8 quantization quality report per embedding: per-vector
    * scale = max|x|/127, elements round-clamped to [-127, 127], and the
    * reconstruction error (MSE + max abs) of the dequantized vector — the
    * compression-loss audit run before shipping a quantized ANN index.
    * Every step is IEEE-exact or decimal-staged (max, /, round-half-up,
    * −, ×; squared errors sum through DECIMAL(20,15)), so the doubles
    * compare bit-exact against the oracle with no output rounding.
    * Per-row narrow HOF work, no shuffle beyond the output sort.
    */
  val e54Quantize: Q = Q(
    "e54_embedding_quantize",
    (s, dir) =>
      Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"), col("embedding"))
        .withColumn("scale",
          array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127)
        .filter(col("scale") > 0) // an all-zero vector has nothing to quantize
        .withColumn("err", transform(col("embedding"), x => {
          val xd = x.cast("double")
          val q = least(greatest(round(xd / col("scale")), lit(-127.0)), lit(127.0))
          xd - q * col("scale")
        }))
        .select(
          col("vec_id"), col("scale"),
          (aggregate(
            transform(col("err"), e => (e * e).cast(DecimalType(20, 15))),
            lit(java.math.BigDecimal.ZERO).cast(DecimalType(20, 15)),
            (acc, v) => (acc + v).cast(DecimalType(20, 15))).cast("double") /
            size(col("err"))).as("mse"),
          array_max(transform(col("err"), e => abs(e))).as("max_err"))
        .orderBy(col("vec_id")),
    Some("""
      WITH s AS (
        SELECT vec_id, max(abs(CAST(x AS DOUBLE)))/127 AS scale
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id),
      e AS (
        SELECT t.vec_id, s.scale,
          CAST(x AS DOUBLE)
            - least(greatest(round(CAST(x AS DOUBLE)/s.scale), -127), 127) * s.scale
            AS err
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        JOIN s ON t.vec_id = s.vec_id
        WHERE s.scale > 0)
      SELECT vec_id, scale,
        CAST(sum(CAST(err*err AS DECIMAL(20,15))) AS DOUBLE)/count(*) AS mse,
        max(abs(err)) AS max_err
      FROM e GROUP BY vec_id, scale ORDER BY vec_id"""))

  /** Maximum-inner-product top-k (MIPS — the retrieval objective when
    * embeddings are trained un-normalized, e.g. recommendation towers):
    * rank candidates by raw dot product, not cosine. The fast pass is the
    * native `dot_product` expression (graft.expr.DotProduct — one fused
    * codegen loop per pair), and the exact-decimal dot re-ranks only the
    * boundary — [[exactRerank]] with the dot scorer and an eps sized for
    * dot magnitudes. Corpus stays distributed; queries broadcast. Oracle:
    * all-decimal dots ranked in DuckDB.
    */
  val e55MipsTopK: Q = Q(
    "e55_mips_topk",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          dotNative(col("qv"), col("cv")).as("cosf"))
      exactRerank(fast, q, c, k = 10, scorer = dotExact, eps = 1e-4)
        .withColumnRenamed("cos", "dot")
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 5),
      dots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid)
      SELECT qid, cid, round(dot, 6) AS dot, rank FROM (
        SELECT qid, cid, dot,
          CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY dot DESC, cid) AS INT) AS rank
        FROM dots) t
      WHERE rank <= 10 ORDER BY qid, rank"""))

  /** One Lloyd iteration of k-means over the embedding corpus (the
    * training step the IVF index doc defers to offline): assign every
    * vector to its nearest centroid by exact cosine (two-pass: native
    * prefilter, decimal re-rank — e53's assignment shape with keep=1),
    * then emit the updated centroid as per-dimension exact-decimal means,
    * one row per (centroid, dim). The assignment is a broadcast join (the
    * centroid set is tiny by construction); the update is one shuffle on
    * (centroid, dim) with partial aggregation — the canonical distributed
    * k-means dataflow, fully oracle-checked.
    */
  val e56KmeansStep: Q = Q(
    "e56_kmeans_step",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"), col("embedding"))
      // the SAME two-pass assignment the IVF index uses (keep=1) — one
      // definition, so an eps/tiebreak change cannot diverge them
      val assigned =
        assignToCentroids(emb, modCentroids(emb), "vec_id", "embedding", keep = 1)
      assigned
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(count(lit(1)).cast("long").as("n_members"),
          // 6dp output rounding, the repo-wide parity pattern (see e50):
          // the double→decimal cast accumulates ~1e-15 engine-specific ulp
          // noise over a few hundred addends, far below 6dp
          round(sum(col("x").cast("double").cast(DecimalType(20, 15)))
            .cast("double") / count(lit(1)), 6).as("mean_val"))
        .orderBy(col("centroid_id"), col("dim"))
    },
    Some("""
      WITH cents AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings WHERE vec_id % 37 = 0),
      norms AS (
        SELECT vec_id,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS nrm
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id),
      vc AS (
        SELECT vec_id, centroid_id,
          CAST(sum(CAST(CAST(vx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT e.vec_id, c.centroid_id,
                unnest(e.embedding) AS vx, unnest(c.centroid) AS cx
              FROM embeddings e CROSS JOIN cents c) p
        GROUP BY vec_id, centroid_id),
      assign AS (
        SELECT vec_id, centroid_id FROM (
          SELECT vc.vec_id, vc.centroid_id,
            row_number() OVER (PARTITION BY vc.vec_id
              ORDER BY vc.dot/(nv.nrm*nc.nrm) DESC, vc.centroid_id) AS rn
          FROM vc JOIN norms nv ON vc.vec_id = nv.vec_id
                  JOIN norms nc ON vc.centroid_id = nc.vec_id) t
        WHERE rn = 1)
      SELECT a.centroid_id, CAST(r.i AS INT) AS dim,
        CAST(count(*) AS BIGINT) AS n_members,
        round(CAST(sum(CAST(CAST(e.embedding[r.i + 1] AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)
          / count(*), 6) AS mean_val
      FROM assign a
        JOIN embeddings e ON e.vec_id = a.vec_id
        CROSS JOIN range(0, 64) r(i)
      GROUP BY a.centroid_id, r.i
      ORDER BY centroid_id, dim"""))

  // ------------------------------------------------------- LSH-bucketed ANN

  val NumTables = 4
  val PlanesPerTable = 8

  /** Deterministic SPARSE TERNARY hyperplanes (seeded per dimension),
    * shared by index and query sides: NumTables independent tables of
    * PlanesPerTable planes, each plane 8 nonzero ±1 coordinates (the
    * Achlioptas very-sparse projection family — preserves the sign-LSH
    * guarantee). ±1 weights + exact-decimal sign sums make every bucket bit
    * BIT-STABLE across engines (the d45/e61 determinization), which is what
    * lets e51/e51b carry full SQL oracles: the constants below are embedded
    * verbatim in the generated oracle SQL. Memoized per embedding width —
    * the coordinate indices must stay inside the vector.
    */
  private val NonzeroPerPlane = 8
  private val planeCache =
    new scala.collection.concurrent.TrieMap[Int, IndexedSeq[Seq[(Int, Int)]]]()

  /** plane → Seq[(0-based dim index, ±1 weight)]. */
  private def planeTables(dim: Int): IndexedSeq[Seq[(Int, Int)]] =
    planeCache.getOrElseUpdate(dim, {
      val rnd = new scala.util.Random(42L + dim)
      IndexedSeq.fill(NumTables * PlanesPerTable)(
        rnd.shuffle((0 until dim).toList).take(NonzeroPerPlane).sorted
          .map(i => (i, if (rnd.nextBoolean()) 1 else -1)))
    })

  /** Exact-decimal sign bit of one sparse projection — a flat codegen'd
    * 8-term expression; order-independent decimal sum, so both engines
    * compute the identical bit.
    */
  private def signBitSparse(v: Column, plane: Seq[(Int, Int)]): Column =
    plane.map { case (i, w) =>
      (lit(w.toDouble) * element_at(v, i + 1).cast("double"))
        .cast(DecimalType(20, 15))
    }.reduce(_ + _) > 0

  /** (id, bucket) rows: the NumTables table-tagged sign-buckets of each
    * vector. Two steps ON PURPOSE (the d45 lesson): the 32 sign bits
    * materialize as plain projection columns first, and only the cheap
    * bit-packing rides inside the Generate — one fused expression tree
    * overflows Janino's method limit and silently drops to interpretation.
    */
  private def bucketTable(df: DataFrame, idCol: String, vCol: String,
      dim: Int): DataFrame = {
    val planes = planeTables(dim)
    val bits = planes.indices.map(p =>
      signBitSparse(col(vCol), planes(p)).as(s"__b$p"))
    df.select(col(idCol) +: bits: _*)
      .select(col(idCol), explode(array((0 until NumTables).map { ti =>
        (0 until PlanesPerTable).map { i =>
          when(col(s"__b${ti * PlanesPerTable + i}"), lit(1L << i)).otherwise(0L)
        }.reduce(_ + _) + lit(ti.toLong * (1L << PlanesPerTable))
      }: _*)).as("bucket"))
  }

  /** The one embedding width the e51/e51b oracles are generated for — the
    * testdata width. [[annTopK]] requires dim == OracleDim so the Spark
    * plan and [[planeValuesSql]] can never silently use different plane
    * families (they'd diverge only as a confusing hash mismatch).
    */
  private val OracleDim = 64

  /** The nonzero plane entries of the OracleDim family as oracle-side
    * VALUES rows (p, i, wt), i 0-based.
    */
  private def planeValuesSql: String =
    planeTables(OracleDim).zipWithIndex.flatMap { case (plane, p) =>
      plane.map { case (i, w) => s"($p,$i,$w)" }
    }.mkString(",")

  /** ANN top-k via multi-table hyperplane LSH: a candidate is any corpus
    * vector sharing at least one table-bucket with the query; native cosine
    * scores candidates and exact decimal re-ranks the boundary. Multiple
    * independent tables trade one bucket's miss-rate for a union of buckets
    * — recall rises as 1-(1-r)^T while the probed fraction of the corpus
    * stays tiny, which is the 100 TB path where scanning the corpus per
    * query is off the table.
    *
    * The QUERY side multi-probes: besides its own bucket it probes the
    * PlanesPerTable single-bit-flip neighbor buckets of each table (the
    * standard multi-probe LSH recall knob — a near neighbor that disagrees
    * on exactly one plane still gets found). Probe fan-out rides only the
    * tiny broadcast query side — the corpus index is bucketed ONCE and
    * untouched, which is exactly how the knob stays cheap at warehouse
    * scale. e51b measures the resulting recall in-query.
    * SimilaritySpec pins recall on planted near-identical vectors; the
    * deterministic ternary planes make the candidate set — and hence the
    * whole output — hash-oracled.
    */
  def annTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      dim: Int = 64): DataFrame = {
    require(dim == OracleDim,
      s"e51 oracle plane constants are generated for dim=$OracleDim; got $dim")
    GraftFunctions.register(emb.sparkSession)
    val corpus = Q.spread(emb.filter(col("vec_id") >= nQueries), "vec_id")
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // candidate pairs first (cheap bucket columns only), dedup across
    // tables, THEN score each surviving pair exactly once — a pair matching
    // in all 4 tables must not pay the scoring cost 4 times
    val qb = bucketTable(queries, "qid", "qv", dim)
      .withColumnRenamed("bucket", "b0")
      // multi-probe: the bucket itself + its single-bit-flip neighbors
      // (bit flips stay inside the low PlanesPerTable bits, so the table
      // tag in the high bits is preserved and tables never cross-match)
      .select(col("qid"), explode(array(
        col("b0") +: (0 until PlanesPerTable).map(i =>
          col("b0").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
    val cb = bucketTable(corpus, "cid", "cv", dim)
    val candidates = cb.join(broadcast(qb), "bucket")
      .select(col("qid"), col("cid")).distinct()
    val fast = candidates
      .join(corpus, "cid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("cid"), cosNative(col("qv"), col("cv")).as("cosf"))
    exactRerank(fast, queries, corpus, k)
  }

  /** The e51 candidate set + exact-cosine ranking as DuckDB CTEs, generated
    * from the SAME plane constants as the Spark plan. The Spark side's
    * native-prefilter survivor cut is a guaranteed superset of the exact
    * top-k among candidates (see [[exactRerank]]), so the oracle ranks ALL
    * candidates exactly — same output, no native scorer to mirror.
    */
  private def sqlAnnCtes: String = s"""
      w(p, i, wt) AS (VALUES $planeValuesSql),
      q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 5),
      qbits AS (
        SELECT q.qid, w.p,
          CASE WHEN sum(CAST(CAST(w.wt AS DOUBLE) * CAST(q.qv[w.i + 1] AS DOUBLE)
                             AS DECIMAL(20,15))) > 0 THEN 1 ELSE 0 END AS b
        FROM q CROSS JOIN w GROUP BY q.qid, w.p),
      qbuck AS (
        SELECT qid,
          CAST(sum(b * (1 << (p % $PlanesPerTable))) AS BIGINT)
            + (p // $PlanesPerTable) * ${1L << PlanesPerTable} AS b0
        FROM qbits GROUP BY qid, p // $PlanesPerTable),
      qprobe AS (
        SELECT qid, unnest([b0${(0 until PlanesPerTable)
          .map(i => s", xor(b0, ${1L << i})").mkString}]) AS bucket
        FROM qbuck),
      cbits AS (
        SELECT c.cid, w.p,
          CASE WHEN sum(CAST(CAST(w.wt AS DOUBLE) * CAST(c.cv[w.i + 1] AS DOUBLE)
                             AS DECIMAL(20,15))) > 0 THEN 1 ELSE 0 END AS b
        FROM c CROSS JOIN w GROUP BY c.cid, w.p),
      cbuck AS (
        SELECT cid,
          CAST(sum(b * (1 << (p % $PlanesPerTable))) AS BIGINT)
            + (p // $PlanesPerTable) * ${1L << PlanesPerTable} AS bucket
        FROM cbits GROUP BY cid, p // $PlanesPerTable),
      cand AS (SELECT DISTINCT qid, cid FROM cbuck JOIN qprobe USING (bucket)),
      qn AS (
        SELECT qid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS qnorm
        FROM (SELECT qid, unnest(qv) AS x FROM q) t GROUP BY qid),
      cn AS (
        SELECT cid, sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS cnorm
        FROM (SELECT cid, unnest(cv) AS x FROM c) t GROUP BY cid),
      cdots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT cand.qid, cand.cid, unnest(q.qv) AS qx, unnest(c.cv) AS cx
              FROM cand JOIN q USING (qid) JOIN c USING (cid)) t
        GROUP BY qid, cid),
      ann AS (
        SELECT d.qid, d.cid, d.dot/(qn.qnorm*cn.cnorm) AS cos,
          CAST(row_number() OVER (PARTITION BY d.qid
            ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS INT) AS rank
        FROM cdots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid)"""

  val e51AnnLsh: Q = Q(
    "e51_ann_lsh",
    (s, dir) => annTopK(t(s, dir, "embeddings")),
    Some(s"""
      WITH $sqlAnnCtes
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM ann
      WHERE rank <= 10 ORDER BY qid, rank"""))

  /** Accuracy audit for the hyperplane-LSH ANN: per query, recall@10 of
    * [[annTopK]] against the brute-force exact top-10 (e50's pipeline),
    * computed in-query. With the deterministic ternary planes both sides
    * are bit-stable, so the recall number ITSELF is oracle-pinned (the
    * e61b pattern). The exact side is one narrow native-scored pass (the
    * e50 cost), the ANN side its usual bucket probe; the compare itself is
    * a join of two ≤ nQueries·k row sets.
    */
  val e51bAnnRecall: Q = Q(
    "e51b_ann_recall",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val ann = annTopK(emb).select(col("qid"), col("cid"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"), cosNative(col("qv"), col("cv")).as("cosf"))
      val exact = exactRerank(fast, q, c, k = 10)
        .select(col("qid"), col("cid"), col("rank"))
      exact
        .join(ann.withColumn("hit", lit(1)), Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).cast("long").as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"),
          max(when(col("rank") === 1 && col("hit") === 1, 1).otherwise(0))
            .cast("long").as("hit_at_1"))
        .select(col("qid"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall_at_10"),
          col("hit_at_1"))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH $sqlAnnCtes,
      alldots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid),
      exact AS (
        SELECT qid, cid, rank FROM (
          SELECT d.qid, d.cid,
            CAST(row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS INT) AS rank
          FROM alldots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= 10),
      hits AS (SELECT qid, cid, 1 AS hit FROM ann WHERE rank <= 10)
      SELECT e.qid, CAST(count(*) AS BIGINT) AS n_exact,
        CAST(sum(coalesce(h.hit, 0)) AS BIGINT) AS n_hit,
        CAST(sum(coalesce(h.hit, 0)) AS DOUBLE) / count(*) AS recall_at_10,
        CAST(max(CASE WHEN e.rank = 1 AND h.hit = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS hit_at_1
      FROM exact e LEFT JOIN hits h ON e.qid = h.qid AND e.cid = h.cid
      GROUP BY e.qid ORDER BY e.qid"""))

  // ---------------------------------------------------------------- IVF ANN

  /** IVF-style ANN: a deterministic coarse quantizer (every 37th vector is
    * a "centroid") partitions the corpus into inverted lists; a query
    * probes only its `nprobe` nearest lists and re-ranks exactly inside
    * them. Centroid assignment is one broadcast join + argmin; the probe
    * is a bucket-equi join. This is the IVF index shape (coarse quantize →
    * inverted lists → probe few lists) with the k-means training step
    * replaced by deterministic sampling — training is a separate offline
    * concern; the serving-path dataflow is what must scale.
    *
    * Assignment and final ranking are both two-pass (see object doc): the
    * whole dataflow still matches the all-decimal oracle bit-for-bit, but
    * only ~keep rows per vector ever pay the interpreted-decimal cost.
    */
  /** Deterministic coarse centroids (every 37th vector), broadcast with
    * precomputed exact norms — shared by the IVF index and the k-means
    * step so they quantize against the identical codebook.
    */
  private def modCentroids(emb: DataFrame): DataFrame =
    broadcast(
      emb.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
        .withColumn("centroid_norm", l2Norm(col("centroid"))))

  /** Two-pass nearest-centroid assignment, ONE definition shared by the
    * IVF index (corpus keep=1, queries keep=nprobe) and the k-means Lloyd
    * step (keep=1) — an eps or tiebreak change cannot silently diverge
    * them. Pass 1: native cosine vs every (broadcast) centroid, keep the
    * top `keep` plus the Eps boundary; pass 2: exact-decimal re-rank of
    * the survivors. Returns (idCol, vCol, centroid_id).
    */
  private def assignToCentroids(df: DataFrame, centroids: DataFrame,
      idCol: String, vCol: String, keep: Int): DataFrame = {
    val wf = Window.partitionBy(col(idCol)).orderBy(col("simf").desc, col("centroid_id"))
    val wAll = Window.partitionBy(col(idCol))
    val surv = df.join(centroids)
      .select(col(idCol), col("centroid_id"),
        cosNative(col(vCol), col("centroid")).as("simf"))
      .withColumn("rk", row_number().over(wf))
      .withColumn("kth", max(when(col("rk") === keep, col("simf"))).over(wAll))
      .filter(col("rk") <= keep || col("simf") >= col("kth") - Eps)
      .select(col(idCol), col("centroid_id"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("centroid_id"))
    surv.join(df, idCol)
      .join(centroids, "centroid_id")
      .select(col(idCol), col(vCol), col("centroid_id"),
        (dotExact(col(vCol), col("centroid")) /
          (l2Norm(col(vCol)) * col("centroid_norm"))).as("sim"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
      .drop("sim", "crank")
  }

  def ivfTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val centroids = modCentroids(emb)
    val corpus = assignToCentroids(
      Q.spread(emb.filter(col("vec_id") >= nQueries), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv")),
      centroids, "cid", "cv", keep = 1)
    val queries = assignToCentroids(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      centroids, "qid", "qv", keep = nprobe)
    val candidates = corpus.select(col("cid"), col("centroid_id"))
      .join(broadcast(queries.select(col("qid"), col("centroid_id"))), "centroid_id")
      .select(col("qid"), col("cid")).distinct()
    val corpusAll = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val queriesAll = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val fast = candidates
      .join(corpusAll, "cid")
      .join(broadcast(queriesAll), "qid")
      .select(col("qid"), col("cid"), cosNative(col("qv"), col("cv")).as("cosf"))
    exactRerank(fast, queriesAll, corpusAll, k)
  }

  val e53AnnIvf: Q = Q(
    "e53_ann_ivf",
    (s, dir) => ivfTopK(t(s, dir, "embeddings")),
    Some("""
      WITH cents AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings WHERE vec_id % 37 = 0),
      norms AS (
        SELECT vec_id,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE)) AS nrm
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) t
        GROUP BY vec_id),
      vc AS (
        SELECT vec_id, centroid_id,
          CAST(sum(CAST(CAST(vx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT e.vec_id, c.centroid_id,
                unnest(e.embedding) AS vx, unnest(c.centroid) AS cx
              FROM embeddings e CROSS JOIN cents c) p
        GROUP BY vec_id, centroid_id),
      sims AS (
        SELECT vc.vec_id, vc.centroid_id, vc.dot/(nv.nrm*nc.nrm) AS sim
        FROM vc JOIN norms nv ON vc.vec_id = nv.vec_id
                JOIN norms nc ON vc.centroid_id = nc.vec_id),
      assign_c AS (
        SELECT vec_id AS cid, centroid_id FROM (
          SELECT vec_id, centroid_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
          FROM sims WHERE vec_id >= 5) t WHERE rn = 1),
      assign_q AS (
        SELECT vec_id AS qid, centroid_id FROM (
          SELECT vec_id, centroid_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
          FROM sims WHERE vec_id < 5) t WHERE rn <= 4),
      cand AS (
        SELECT DISTINCT q.qid, a.cid
        FROM assign_q q JOIN assign_c a USING (centroid_id)),
      dots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT cand.qid, cand.cid,
                unnest(eq.embedding) AS qx, unnest(ec.embedding) AS cx
              FROM cand JOIN embeddings eq ON eq.vec_id = cand.qid
                        JOIN embeddings ec ON ec.vec_id = cand.cid) p
        GROUP BY qid, cid)
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM (
        SELECT d.qid, d.cid, d.dot/(nq.nrm*nc.nrm) AS cos,
          CAST(row_number() OVER (PARTITION BY d.qid
                 ORDER BY d.dot/(nq.nrm*nc.nrm) DESC, d.cid) AS INT) AS rank
        FROM dots d JOIN norms nq ON d.qid = nq.vec_id
                    JOIN norms nc ON d.cid = nc.vec_id) t
      WHERE rank <= 10 ORDER BY qid, rank"""))
}
