package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.t

/** Vector-index MAINTENANCE: the incremental path that keeps an ANN index
  * alive between rebuilds.
  */
object Similarity5 {

  def pack: Seq[Q] = Seq(e75IvfDelta, e76NprobeSweep, e77EmbeddingHealth,
    e78IntraListDiversity, e79PqDistortion)

  // NOTE: these constants MUST precede every Q val that interpolates them
  // into an oracle string — Scala object vals initialize in declaration
  // order, and a forward reference silently reads 0 (e79's oracle once
  // printed `*0` and NaN'd its whole report this way).
  private val Grid = 512L
  private val Shift = 512L
  private val KCents = 16

  // e57's PQ geometry, mirrored (M subspaces × SubDim dims, K codewords
  // on the signed 1/Grid grid)
  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 16

  /** e79: PQ DISTORTION BY SUBSPACE — which of e57's eight codebooks is
    * actually losing the information: per subspace, the corpus-mean
    * quantization MSE and its share of total distortion in bp. A skewed
    * share says "re-train THAT codebook / give that subspace more bits"
    * — the index-quality drill-down next to e72's list balance and e77's
    * input health. Long-format dataflow (no width-cliff expressions),
    * integer grid distances, DECIMAL(38,0) accumulation, one 8-row
    * report.
    */
  val e79PqDistortion: Q = Q(
    "e79_pq_distortion",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val emb = t(s, dir, "embeddings")
      val vecs = Q.spread(emb, "vec_id")
        .select(col("vec_id"),
          posexplode(transform(col("embedding"),
            e => round(e.cast("double") * Grid).cast("long")))
            .as(Seq("dim", "w")))
        .withColumn("m", expr(s"dim div $PqSubDim"))
      val cents = vecs.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("cid"), col("dim"), col("m"),
          col("w").as("c"))
      val d = vecs.join(broadcast(cents.drop("m")), "dim")
        .select(col("vec_id"), col("m"), col("cid"),
          ((col("w") - col("c")) * (col("w") - col("c"))).as("d2"))
        .groupBy(col("vec_id"), col("m"), col("cid"))
        .agg(sum(col("d2")).as("d"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(col("d") * PqK + col("cid")).as("pk"))
        .select(col("m"), expr(s"pk div $PqK").as("d"))
      val per = d.groupBy(col("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("d").cast(DecimalType(38, 0))).as("sd"))
      val tot = per.agg(sum(col("sd")).as("grand"))
      per.crossJoin(broadcast(tot))
        .select(col("m").as("subspace"), col("n").as("n_vectors"),
          (col("sd").cast("double") /
            (col("n") * PqSubDim).cast("double") / (Grid * Grid))
            .as("mean_mse"),
          expr("CAST(sd * 10000 div grand AS BIGINT)").as("share_bp"))
        .orderBy(col("subspace"))
    },
    Some {
      val dists = (0 until PqM).map { m =>
        val terms = (0 until PqSubDim).map { j =>
          val i = m * PqSubDim + j + 1
          s"(v.qv[$i]-c.qc[$i])*(v.qv[$i]-c.qc[$i])"
        }.mkString(" + ")
        s"($terms) AS d$m"
      }.mkString(",\n          ")
      val packMins = (0 until PqM)
        .map(m => s"min(d$m*$PqK+cid) AS p$m").mkString(", ")
      val unpiv = (0 until PqM)
        .map(m => s"SELECT vec_id, $m AS m, p$m // $PqK AS d FROM packs")
        .mkString("\n        UNION ALL ")
      s"""
      WITH qv AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS qv
        FROM embeddings),
      cents AS (SELECT vec_id AS cid, qv AS qc FROM qv WHERE vec_id < $PqK),
      dist AS (
        SELECT v.vec_id, c.cid,
          $dists
        FROM qv v CROSS JOIN cents c),
      packs AS (SELECT vec_id, $packMins FROM dist GROUP BY vec_id),
      d AS (
        $unpiv),
      per AS (
        SELECT m, count(*) AS n, sum(CAST(d AS DECIMAL(38,0))) AS sd
        FROM d GROUP BY m),
      tot AS (SELECT sum(sd) AS grand FROM per)
      SELECT m AS subspace, n AS n_vectors,
        CAST(sd AS DOUBLE) / CAST(n * $PqSubDim AS DOUBLE)
          / ${Grid * Grid} AS mean_mse,
        CAST(CAST(sd AS HUGEINT) * 10000 // CAST(grand AS HUGEINT)
             AS BIGINT) AS share_bp
      FROM per CROSS JOIN tot
      ORDER BY subspace"""
    })

  /** e78: INTRA-LIST DIVERSITY of the exact top-10 result lists — mean
    * pairwise cosine DISTANCE among each query's results: the metric MMR
    * (e74) exists to raise, measured on the undiversified baseline. Low
    * ILD = the list is ten near-copies of one answer. Pairwise work is
    * k²-per-query AFTER retrieval (never corpus-scale); distances are
    * exact-decimal cosines, the mean is decimal-staged, 6dp.
    */
  val e78IntraListDiversity: Q = Q(
    "e78_intra_list_diversity",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      graft.expr.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
      val top = Similarity.exactRerank(fast, q, c, k = 10)
        .select(col("qid"), col("cid"))
      val cv = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val members = top.join(cv, "cid")
      members.as("a")
        .join(members.as("b"),
          col("a.qid") === col("b.qid") && col("a.cid") < col("b.cid"))
        .select(col("a.qid").as("qid"),
          (lit(1.0) - Similarity.cosExact(col("a.cv"), col("b.cv")))
            .cast(DecimalType(18, 12)).as("dist"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("dist")).cast("double") / count(lit(1)), 6)
            .as("ild"))
        .orderBy(col("qid"))
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
        GROUP BY qid, cid),
      top AS (
        SELECT qid, cid FROM (
          SELECT d.qid, d.cid,
            row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(qn.qnorm*cn.cnorm) DESC, d.cid) AS rank
          FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.cid = cn.cid) t
        WHERE rank <= 10),
      pairs AS (
        SELECT a.qid, a.cid AS ca, b.cid AS cb
        FROM top a JOIN top b ON a.qid = b.qid AND a.cid < b.cid),
      pdots AS (
        SELECT qid, ca, cb,
          CAST(sum(CAST(CAST(xa AS DOUBLE)*CAST(xb AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT p.qid, p.ca, p.cb,
                unnest(ea.embedding) AS xa, unnest(eb.embedding) AS xb
              FROM pairs p
              JOIN embeddings ea ON ea.vec_id = p.ca
              JOIN embeddings eb ON eb.vec_id = p.cb) t
        GROUP BY qid, ca, cb)
      SELECT qid, count(*) AS n_pairs,
        round(CAST(sum(CAST(1.0 - p.dot/(na.cnorm*nb.cnorm)
                            AS DECIMAL(18,12))) AS DOUBLE) / count(*), 6)
          AS ild
      FROM pdots p
      JOIN cn na ON na.cid = p.ca
      JOIN cn nb ON nb.cid = p.cb
      GROUP BY qid ORDER BY qid"""))

  /** e77: EMBEDDING HEALTH REPORT — the pre-index sanity panel: vector
    * count, dimensionality, zero vectors (unindexable under cosine),
    * NaN-poisoned vectors (one NaN silently corrupts every distance it
    * touches), element range, and mean L2 norm. Run before e5x indexing
    * the way q43 profiles a relational table.
    *
    * One narrow pass per vector (exact-decimal norm, the e50 parity
    * device), one global aggregate row; the mean norm is decimal-staged
    * and 6dp-rounded (d52 playbook).
    */
  val e77EmbeddingHealth: Q = Q(
    "e77_embedding_health",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val v = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"),
          size(col("embedding")).as("dims"),
          Similarity.l2Norm(col("embedding")).as("nrm"),
          exists(col("embedding"), x => isnan(x.cast("double"))).as("has_nan"),
          array_min(col("embedding")).cast("double").as("vmin"),
          array_max(col("embedding")).cast("double").as("vmax"))
      v.agg(
        count(lit(1)).as("n_vectors"),
        min(col("dims")).as("min_dims"),
        max(col("dims")).as("max_dims"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
        min(col("vmin")).as("min_val"),
        max(col("vmax")).as("max_val"),
        sum(col("nrm").cast(DecimalType(28, 12))).as("snrm"))
        .select(col("n_vectors"), col("min_dims"), col("max_dims"),
          col("n_zero"), col("n_nan"), col("min_val"), col("max_val"),
          round(col("snrm").cast("double") / col("n_vectors"), 6)
            .as("mean_norm"))
    },
    Some("""
      WITH per AS (
        SELECT vec_id, len(embedding) AS dims,
          sqrt(CAST(sum(CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
                            AS DECIMAL(20,15))) AS DOUBLE)) AS nrm,
          max(CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 1 ELSE 0 END) AS has_nan,
          min(CAST(x AS DOUBLE)) AS vmin, max(CAST(x AS DOUBLE)) AS vmax
        FROM (SELECT vec_id, embedding, unnest(embedding) AS x
              FROM embeddings) t
        GROUP BY vec_id, embedding)
      SELECT count(*) AS n_vectors,
        CAST(min(dims) AS BIGINT) AS min_dims,
        CAST(max(dims) AS BIGINT) AS max_dims,
        CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        CAST(sum(has_nan) AS BIGINT) AS n_nan,
        min(vmin) AS min_val, max(vmax) AS max_val,
        round(CAST(sum(CAST(nrm AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
          AS mean_norm
      FROM per"""))

  /** e76: NPROBE RECALL SWEEP — the tuning curve every IVF deployment
    * reads before picking its operating point: recall@10 against the
    * exact top-10 at nprobe ∈ {1, 2, 4}. Each setting re-runs the e53
    * probe pipeline (shared centroids, corpus assignment identical —
    * only the probe width changes); the truth set is the e50 brute-force
    * top-10. Per (nprobe, query): hit count and recall in integer basis
    * points — all ranking boundaries exact-decimal-rescored, so the
    * whole CURVE is hash-oracled, not just sampled.
    *
    * Scale: the corpus-side assignment is the dominant pass and is the
    * same work an index BUILD already does; the sweep itself only varies
    * the per-query probe list (nprobe·queries rows).
    */
  val e76NprobeSweep: Q = Q(
    "e76_nprobe_sweep",
    (s, dir) => {
      graft.expr.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = Q.spread(emb.filter(col("vec_id") >= 5), "vec_id")
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val fast = c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
      val truth = Similarity.exactRerank(fast, q, c, k = 10)
        .select(col("qid"), col("cid")).localCheckpoint(true)
      val perProbe = Seq(1, 2, 4).map { np =>
        Similarity.ivfTopK(emb, nprobe = np)
          .select(lit(np).as("nprobe"), col("qid"), col("cid"))
      }.reduce(_ unionAll _)
      val hits = perProbe.join(truth, Seq("qid", "cid"))
        .groupBy(col("nprobe"), col("qid")).agg(count(lit(1)).as("hits"))
      import s.implicits._
      val grid = s.range(0, 5).toDF("qid")
        .crossJoin(Seq(1, 2, 4).toDF("nprobe"))
      val out = grid.join(hits, Seq("nprobe", "qid"), "left")
        .na.fill(0L, Seq("hits"))
        .select(col("nprobe"), col("qid"), col("hits"),
          (col("hits") * 1000).as("recall_bp"))
        .orderBy(col("nprobe"), col("qid"))
      Q.materialized(out, truth)
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
        SELECT vec_id AS qid, centroid_id, rn FROM (
          SELECT vec_id, centroid_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
          FROM sims WHERE vec_id < 5) t WHERE rn <= 4),
      probes AS (SELECT unnest([1, 2, 4]) AS np),
      cand AS (
        SELECT DISTINCT p.np, q.qid, a.cid
        FROM assign_q q
        JOIN probes p ON q.rn <= p.np
        JOIN assign_c a USING (centroid_id)),
      cdots AS (
        SELECT np, qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT cand.np, cand.qid, cand.cid,
                unnest(eq.embedding) AS qx, unnest(ec.embedding) AS cx
              FROM cand JOIN embeddings eq ON eq.vec_id = cand.qid
                        JOIN embeddings ec ON ec.vec_id = cand.cid) p
        GROUP BY np, qid, cid),
      ivf AS (
        SELECT np, qid, cid FROM (
          SELECT d.np, d.qid, d.cid,
            row_number() OVER (PARTITION BY d.np, d.qid
              ORDER BY d.dot/(nq.nrm*nc.nrm) DESC, d.cid) AS rank
          FROM cdots d JOIN norms nq ON d.qid = nq.vec_id
                       JOIN norms nc ON d.cid = nc.vec_id) t
        WHERE rank <= 10),
      tdots AS (
        SELECT qid, cid,
          CAST(sum(CAST(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE) AS DECIMAL(20,15))) AS DOUBLE) AS dot
        FROM (SELECT q.vec_id AS qid, c.vec_id AS cid,
                unnest(q.embedding) AS qx, unnest(c.embedding) AS cx
              FROM embeddings q CROSS JOIN embeddings c
              WHERE q.vec_id < 5 AND c.vec_id >= 5) p
        GROUP BY qid, cid),
      truth AS (
        SELECT qid, cid FROM (
          SELECT d.qid, d.cid,
            row_number() OVER (PARTITION BY d.qid
              ORDER BY d.dot/(nq.nrm*nc.nrm) DESC, d.cid) AS rank
          FROM tdots d JOIN norms nq ON d.qid = nq.vec_id
                       JOIN norms nc ON d.cid = nc.vec_id) t
        WHERE rank <= 10),
      hits AS (
        SELECT np, qid, count(*) AS hits
        FROM ivf JOIN truth USING (qid, cid)
        GROUP BY np, qid),
      grid AS (
        SELECT p.np, q.qid
        FROM probes p CROSS JOIN (SELECT DISTINCT qid FROM truth) q)
      SELECT g.np AS nprobe, g.qid,
        CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        CAST(coalesce(h.hits, 0) * 1000 AS BIGINT) AS recall_bp
      FROM grid g LEFT JOIN hits h ON g.np = h.np AND g.qid = h.qid
      ORDER BY nprobe, g.qid"""))

  /** Long-format grid view (vec_id, dim, w) of an embedding frame on the
    * +Shift-ed non-negative 1/Grid integer grid (the e68/e72 convention).
    */
  private def gridVecs(emb: DataFrame): DataFrame =
    Q.spread(emb, "vec_id")
      .select(col("vec_id"),
        posexplode(transform(col("embedding"),
          e => round(e.cast("double") * Grid).cast("long") + Shift))
          .as(Seq("dim", "w")))

  /** Packed-argmin nearest-centroid assignment of `vecs` (long format)
    * against broadcast `cents` — one (vec, dim)-keyed join + two keyed
    * aggregates, the e72 dataflow.
    */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.join(broadcast(cents), "dim")
      .select(col("vec_id"), col("cid"),
        ((col("w") - col("c")) * (col("w") - col("c"))).as("d2"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("d2")).as("d"))
      .groupBy(col("vec_id"))
      .agg(min(col("d") * KCents + col("cid")).as("pk"))
      .select(col("vec_id"), pmod(col("pk"), lit(KCents.toLong)).as("cid"))

  /** e75: INCREMENTAL IVF MAINTENANCE — a delta batch (the newest 20% of
    * vec_ids) arrives against an index built over the base corpus. The
    * maintenance pass assigns ONLY the delta vectors to the existing
    * (frozen) centroids — the base assignment is the stored index, here
    * recomputed once and checkpointed to stand in for the metadata read —
    * then merges per-list counts into the post-ingest balance audit:
    * members before/after, the delta's share of each list, and
    * ratio-to-mean drift. The report shows whether incoming data drifts
    * into a few lists (the signal to retrain centroids and rebuild).
    *
    * Scale shape: the recurring cost is ONE narrow pass over the DELTA
    * (grid explode → broadcast-centroid join → keyed argmin) — the base
    * corpus is never rescanned in steady state — and the audit output is
    * K rows regardless of corpus or delta size. All arithmetic integer
    * (e72's grid), so the full report hash-matches the oracle.
    */
  val e75IvfDelta: Q = Q(
    "e75_ivf_delta",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ncnt = emb.agg(count(lit(1)).as("nn"))
      val withCut = emb.crossJoin(broadcast(ncnt))
        .select(col("vec_id"), col("embedding"),
          (col("vec_id") >= expr("nn * 8 div 10")).as("is_delta"))
      val base = gridVecs(withCut.filter(!col("is_delta"))
        .select(col("vec_id"), col("embedding")))
      val delta = gridVecs(withCut.filter(col("is_delta"))
        .select(col("vec_id"), col("embedding")))
      val cents = base.filter(col("vec_id") < KCents)
        .select(col("vec_id").as("cid"), col("dim"), col("w").as("c"))
      // the "stored index": base assignment materialized once
      val baseAssign = assign(base, cents).localCheckpoint(true)
      val deltaAssign = assign(delta, cents)
      val counts = baseAssign.withColumn("is_delta", lit(false))
        .unionAll(deltaAssign.withColumn("is_delta", lit(true)))
        .groupBy(col("cid"))
        .agg(sum(when(col("is_delta"), 0L).otherwise(1L)).as("n_base"),
          sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      val tot = counts.agg(sum(col("n_base") + col("n_delta")).as("n_vectors"))
      val out = counts.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_base"), col("n_delta"),
          (col("n_base") + col("n_delta")).as("n_total"),
          expr("n_delta * 10000 div (n_base + n_delta)").as("delta_share_bp"),
          expr(s"(n_base + n_delta) * $KCents * 10000 div n_vectors")
            .as("ratio_to_mean_bp"))
        .orderBy(col("cid"))
      Q.materialized(out, baseAssign)
    },
    Some(s"""
      WITH cut AS (SELECT count(*) * 8 // 10 AS cut FROM embeddings),
      vecs AS MATERIALIZED (
        SELECT vec_id, CAST(u.i AS INT) AS dim,
          CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * $Grid) AS BIGINT)
            + $Shift AS w,
          vec_id >= (SELECT cut FROM cut) AS is_delta
        FROM embeddings, range(0, 64) u(i)),
      cents AS MATERIALIZED (
        SELECT vec_id AS cid, dim, w AS c FROM vecs
        WHERE vec_id < $KCents AND NOT is_delta),
      dist AS MATERIALIZED (
        SELECT v.vec_id, v.is_delta, c.cid,
          CAST(sum((v.w - c.c) * (v.w - c.c)) AS BIGINT) AS d
        FROM vecs v JOIN cents c ON v.dim = c.dim
        GROUP BY v.vec_id, v.is_delta, c.cid),
      assign AS MATERIALIZED (
        SELECT vec_id, is_delta,
          CAST(min(d * $KCents + cid) % $KCents AS BIGINT) AS cid
        FROM dist GROUP BY vec_id, is_delta),
      counts AS (
        SELECT cid,
          CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
          CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
        FROM assign GROUP BY cid),
      tot AS (SELECT CAST(sum(n_base + n_delta) AS BIGINT) AS n_vectors
              FROM counts)
      SELECT cid, n_base, n_delta, n_base + n_delta AS n_total,
        n_delta * 10000 // (n_base + n_delta) AS delta_share_bp,
        (n_base + n_delta) * $KCents * 10000 // (SELECT n_vectors FROM tot)
          AS ratio_to_mean_bp
      FROM counts ORDER BY cid"""))
}
