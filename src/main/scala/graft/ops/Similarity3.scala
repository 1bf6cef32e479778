package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.t

/** Vector-training additions, round 6 (continuation): the multi-iteration
  * k-means TRAINING LOOP (e56 is one Lloyd step; a real IVF/PQ codebook
  * runs Lloyd to a horizon) — on the 1/512 integer grid so every round,
  * and therefore the converged codebook itself, is hash-oracle-checkable.
  */
object Similarity3 {

  def pack: Seq[Q] = Seq(e68KmeansTrain, e69HardNegatives, e70RadiusSearch,
    e71PowerIteration, e72IvfBalance)

  private val Grid = 512L
  private val KCents = 16
  private val Iters = 3
  /** Grid values are shifted +512 into [0, 1024] for the WHOLE loop:
    * centroid updates divide sums by counts, and the two engines disagree
    * on negative integer division (Spark `div` truncates toward zero,
    * DuckDB `//` floors) — on a non-negative domain they agree exactly.
    * Outputs unshift at the end.
    */
  private val Shift = 512L

  /** The e68 loop over any (vec_id, embedding) frame — exposed for specs.
    * Long-format dataflow throughout: vectors and centroids live as
    * (id, dim, val) rows, the per-round distance is a dim-keyed join +
    * keyed sum (narrow shuffles, no 64-term codegen expressions to trip
    * the width cliff), the argmin is the e57 packed `min(d·K + cid)`, and
    * the centroid update is an integer mean on the shifted grid. Each
    * round's centroid table is O(K·dim) rows; superseded rounds are
    * released (≤2 live). Returns the final centroids long-format:
    * (cid, dim, center_val, n_members).
    */
  def kmeansTrain(emb: DataFrame, iters: Int): DataFrame = {
    val vecs = Q.spread(emb, "vec_id")
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        (round(col("x").cast("double") * Grid).cast("long") + Shift).as("w"))
      .localCheckpoint(true)
    var cents = vecs.filter(col("vec_id") < KCents)
      .select(col("vec_id").as("cid"), col("dim"), col("w").as("c"))
      .localCheckpoint(true)
    var assignN: DataFrame = null
    for (_ <- 1 to iters) {
      val dist = vecs.join(broadcast(cents), "dim")
        .select(col("vec_id"), col("cid"),
          ((col("w") - col("c")) * (col("w") - col("c"))).as("d2"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum(col("d2")).as("d"))
      val assign = dist.groupBy(col("vec_id"))
        .agg(min(col("d") * KCents + col("cid")).as("pk"))
        .select(col("vec_id"), pmod(col("pk"), lit(KCents.toLong)).as("cid"))
      val next = vecs.join(assign.hint("shuffle_hash"), "vec_id")
        .groupBy(col("cid"), col("dim"))
        .agg(expr("sum(w) div count(1)").as("c"),
          count(lit(1)).as("n"))
        .localCheckpoint(true)
      Q.releaseBlocks(cents)
      cents = next.select(col("cid"), col("dim"), col("c"))
      assignN = next
    }
    val out = assignN
      .select(col("cid"), col("dim"), (col("c") - Shift).as("center_val"),
        col("n").as("n_members"))
      .orderBy(col("cid"), col("dim"))
      .localCheckpoint(true)
    Q.releaseBlocks(vecs)
    Q.releaseBlocks(assignN)
    out
  }

  private def iterSql(i: Int): String = s"""
      dist$i AS MATERIALIZED (
        SELECT v.vec_id, c.cid,
          CAST(sum((v.w - c.c) * (v.w - c.c)) AS BIGINT) AS d
        FROM vecs v JOIN cents${i - 1} c ON v.dim = c.dim
        GROUP BY v.vec_id, c.cid),
      assign$i AS MATERIALIZED (
        SELECT vec_id, CAST(min(d * $KCents + cid) % $KCents AS BIGINT) AS cid
        FROM dist$i GROUP BY vec_id),
      cents$i AS MATERIALIZED (
        SELECT a.cid, v.dim, CAST(sum(v.w) AS BIGINT) // count(*) AS c,
          count(*) AS n
        FROM vecs v JOIN assign$i a ON v.vec_id = a.vec_id
        GROUP BY a.cid, v.dim)"""

  /** e68: K-MEANS TRAINING to a fixed horizon — `Iters` full Lloyd rounds
    * (assign to nearest centroid by integer L2, recompute centroid means)
    * over the grid-quantized embeddings, initial centroids = the first
    * K vectors. This is the codebook-training loop behind e53's IVF lists
    * and e57/e60's PQ codebooks; e56 pins a single float-path step, this
    * pins the LOOP — every intermediate assignment and the final
    * codebook are integer, so the oracle replays all three rounds
    * bit-exact through unrolled (materialized) CTEs.
    */
  val e68KmeansTrain: Q = Q(
    "e68_kmeans_train",
    (s, dir) => kmeansTrain(t(s, dir, "embeddings"), Iters),
    Some(s"""
      WITH vecs AS MATERIALIZED (
        SELECT vec_id, CAST(u.i AS INT) AS dim,
          CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * $Grid) AS BIGINT)
            + $Shift AS w
        FROM embeddings, range(0, 64) u(i)),
      cents0 AS MATERIALIZED (
        SELECT vec_id AS cid, dim, w AS c FROM vecs WHERE vec_id < $KCents),
      ${(1 to Iters).map(iterSql).mkString(",")}
      SELECT cid, dim, c - $Shift AS center_val, CAST(n AS BIGINT)
          AS n_members
      FROM cents$Iters ORDER BY cid, dim"""))

  /** e69: HARD-NEGATIVE MINING — for each query, the top-k NEAREST
    * candidates with a DIFFERENT label: the contrastive-training staple
    * (a random negative is trivially far; the negatives that teach are
    * the near-misses). e66 is the equality complement (search within my
    * label); this is its training-side twin. The label constraint is a
    * pre-filter on the scan side of the broadcast-queries pass — the
    * corpus never shuffles and a query scores only rows the filter
    * admits; at warehouse scale a label-partitioned layout turns the
    * filter into partition pruning. Integer-grid L2 end to end.
    */
  val e69HardNegatives: Q = {
    def l2 = (1 to 64).map { i =>
      val d = element_at(col("qv"), i) - element_at(col("cv"), i)
      d * d
    }.reduce(_ + _)
    def sqlL2 =
      (1 to 64).map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])")
        .mkString("+")
    Q(
      "e69_hard_negatives",
      (s, dir) => {
        val gv = Q.spread(t(s, dir, "embeddings"), "vec_id")
          .select(col("vec_id"), col("label"),
            transform(col("embedding"),
              x => round(x.cast("double") * Grid).cast("long")).as("gv"))
        val q = gv.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("gv").as("qv"))
        val c = gv.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("label").as("clabel"),
            col("gv").as("cv"))
        val scored = c.join(broadcast(q), col("clabel") =!= col("qlabel"))
          .select(col("qid"), col("cid"), col("clabel"), l2.as("d2"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("d2"), col("cid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("cid"), col("clabel"), col("d2"),
            col("rank"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""
      WITH gv AS (
        SELECT vec_id, label,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, label AS qlabel, gv AS qv
            FROM gv WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, label AS clabel, gv AS cv
            FROM gv WHERE vec_id >= 5),
      scored AS (
        SELECT qid, cid, clabel, $sqlL2 AS d2
        FROM c JOIN q ON c.clabel <> q.qlabel)
      SELECT qid, cid, clabel, d2, rank FROM (
        SELECT qid, cid, clabel, d2,
          CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, cid)
            AS INT) AS rank
        FROM scored) t
      WHERE rank <= 10 ORDER BY qid, rank"""))
  }

  /** e70: FIXED-RADIUS SEARCH — every candidate within integer-grid L2
    * distance r of the query, plus a per-query census row shape (count +
    * nearest-in-radius), the OTHER canonical vector API next to top-k:
    * dedup thresholds, geo/embedding "everything this close", and density
    * estimation all ask radius questions, and a top-k API answers them
    * wrongly at both extremes (dense queries truncate, sparse queries
    * pad with junk). Same broadcast-queries scan shape as e50/e69; the
    * radius predicate prunes map-side, so only in-radius (qid, cid, d²)
    * rows ever shuffle. The radius is a squared-grid-integer constant —
    * exact in both engines.
    */
  val e70RadiusSearch: Q = {
    def l2 = (1 to 64).map { i =>
      val d = element_at(col("qv"), i) - element_at(col("cv"), i)
      d * d
    }.reduce(_ + _)
    def sqlL2 =
      (1 to 64).map(i => s"(q.qv[$i]-c.cv[$i])*(q.qv[$i]-c.cv[$i])")
        .mkString("+")
    val R2 = 400000L // squared grid radius: selective (~5-15%) but non-empty
    Q(
      "e70_radius_search",
      (s, dir) => {
        val gv = Q.spread(t(s, dir, "embeddings"), "vec_id")
          .select(col("vec_id"),
            transform(col("embedding"),
              x => round(x.cast("double") * Grid).cast("long")).as("gv"))
        val q = gv.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("gv").as("qv"))
        val c = gv.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("gv").as("cv"))
        c.crossJoin(broadcast(q))
          .select(col("qid"), col("cid"), l2.as("d2"))
          .filter(col("d2") <= R2)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_in_radius"),
            min(col("d2")).as("nearest_d2"),
            max(col("d2")).as("farthest_d2"))
          .orderBy(col("qid"))
      },
      Some(s"""
      WITH gv AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE)*$Grid) AS BIGINT)) AS gv
        FROM embeddings),
      q AS (SELECT vec_id AS qid, gv AS qv FROM gv WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, gv AS cv FROM gv WHERE vec_id >= 5),
      scored AS (
        SELECT qid, cid, $sqlL2 AS d2 FROM c CROSS JOIN q)
      SELECT qid, count(*) AS n_in_radius,
        CAST(min(d2) AS BIGINT) AS nearest_d2,
        CAST(max(d2) AS BIGINT) AS farthest_d2
      FROM scored WHERE d2 <= $R2
      GROUP BY qid ORDER BY qid"""))
  }

  private val PowScale = 1000000L
  private val PowIters = 2

  /** e71: POWER ITERATION for the corpus's top singular direction — the
    * matrix-free PCA building block (dimensionality reduction, whitening,
    * spectral initialization): v ← Xᵀ(Xv), normalized, iterated. Nothing
    * ever materializes XᵀX (64×64 here, but 10⁶×10⁶ for wide features) —
    * each half-step is a keyed join + keyed sum over the LONG-FORMAT
    * corpus ((id, dim, val) rows, the e68 discipline): s_id = Σ x·v joins
    * on dim; u_dim = Σ s·x joins on id. Normalization after each round is
    * integer max-scaling with the SIGN SPLIT (|u|·10⁶ div max|u|, sign
    * re-applied — the engines disagree on negative division), so every
    * round is exact in both engines and the converged direction is
    * hash-oracled. Overflow guard: |u| reaches rows·dims·grid·scale
    * (≈10¹⁷ at sf0.1), so |u|·10⁶ would overflow BIGINT — u and max|u|
    * are first both divided by d = max|u| div 2⁴³ + 1 (d = 1 on small
    * corpora, so the formula degrades to the exact one; identical
    * arithmetic in both engines either way, and (m div d)·10⁶ < 2⁶³ by
    * construction).
    */
  /** The e71 loop over any (vec_id, embedding) frame — exposed for the
    * planted rank-1 spec.
    */
  def powerIteration(emb: DataFrame, iters: Int): DataFrame = {
      val s = emb.sparkSession
      val x = Q.spread(emb, "vec_id")
        .select(col("vec_id"),
          posexplode(transform(col("embedding"),
            e => round(e.cast("double") * Grid).cast("long")))
            .as(Seq("dim", "w")))
        .localCheckpoint(true)
      var v = s.range(0, 2 * 32).toDF("dim")
        .select(col("dim").cast("int").as("dim"), lit(1000L).as("v"))
        .localCheckpoint(true)
      for (_ <- 1 to iters) {
        val sv = x.join(broadcast(v), "dim")
          .groupBy(col("vec_id")).agg(sum(col("w") * col("v")).as("s"))
        val u = x.join(sv.hint("shuffle_hash"), "vec_id")
          .groupBy(col("dim")).agg(sum(col("s") * col("w")).as("u"))
        val m = u.agg(max(abs(col("u"))).as("m"))
        val next = u.crossJoin(broadcast(m))
          .withColumn("d", expr(s"m div ${1L << 43} + 1"))
          .select(col("dim"),
            (signum(col("u")).cast("long") *
              expr(s"(abs(u) div d) * $PowScale div (m div d)")).as("v"))
          .localCheckpoint(true)
        Q.releaseBlocks(v)
        v = next
      }
      val out = v.orderBy(col("dim")).localCheckpoint(true)
      Q.releaseBlocks(x)
      Q.releaseBlocks(v)
      out
  }

  val e71PowerIteration: Q = Q(
    "e71_power_iteration",
    (s, dir) => powerIteration(t(s, dir, "embeddings"), PowIters),
    Some(s"""
      WITH x AS MATERIALIZED (
        SELECT vec_id, CAST(u.i AS INT) AS dim,
          CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * $Grid) AS BIGINT)
            AS w
        FROM embeddings, range(0, 64) u(i)),
      v0 AS (SELECT CAST(i AS INT) AS dim, CAST(1000 AS BIGINT) AS v
             FROM range(0, 64) t(i)),
      ${(1 to PowIters).map { r => s"""
      s$r AS MATERIALIZED (
        SELECT vec_id, CAST(sum(x.w * p.v) AS BIGINT) AS s
        FROM x JOIN v${r - 1} p USING (dim) GROUP BY vec_id),
      u$r AS MATERIALIZED (
        SELECT dim, CAST(sum(s$r.s * x.w) AS BIGINT) AS u
        FROM x JOIN s$r USING (vec_id) GROUP BY dim),
      m$r AS (
        SELECT max(abs(u)) AS m, max(abs(u)) // ${1L << 43} + 1 AS d
        FROM u$r),
      v$r AS MATERIALIZED (
        SELECT dim, CAST(sign(u) AS BIGINT) *
          ((abs(u) // (SELECT d FROM m$r)) * $PowScale
            // ((SELECT m FROM m$r) // (SELECT d FROM m$r))) AS v
        FROM u$r)""" }.mkString(",")}
      SELECT dim, v FROM v$PowIters ORDER BY dim"""))

  /** e72: IVF LIST-BALANCE AUDIT — per-list member counts and share of
    * corpus (integer bp) for the e68-style grid assignment, plus each
    * list's ratio-to-mean in bp: the index-health check run BEFORE
    * deploying an IVF index (one hot list = one hot probe = the index's
    * p99; rebalance/re-train when the ratio drifts). Same dataflow as one
    * e68 assignment round (dim-keyed long-format distances, packed
    * integer argmin — no float surface), then one keyed count; the report
    * is K rows at any corpus size.
    */
  val e72IvfBalance: Q = Q(
    "e72_ivf_balance",
    (s, dir) => {
      val vecs = Q.spread(t(s, dir, "embeddings"), "vec_id")
        .select(col("vec_id"),
          posexplode(transform(col("embedding"),
            e => round(e.cast("double") * Grid).cast("long") + Shift))
            .as(Seq("dim", "w")))
      val cents = vecs.filter(col("vec_id") < KCents)
        .select(col("vec_id").as("cid"), col("dim"), col("w").as("c"))
      val assign = vecs.join(broadcast(cents), "dim")
        .select(col("vec_id"), col("cid"),
          ((col("w") - col("c")) * (col("w") - col("c"))).as("d2"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum(col("d2")).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(col("d") * KCents + col("cid")).as("pk"))
        .select(col("vec_id"), pmod(col("pk"), lit(KCents.toLong)).as("cid"))
      val n = assign.agg(count(lit(1)).as("n_vectors"))
      assign.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
        .crossJoin(broadcast(n))
        .select(col("cid"), col("n_members"), col("n_vectors"),
          expr("n_members * 10000 div n_vectors").as("share_bp"),
          expr(s"n_members * $KCents * 10000 div n_vectors")
            .as("ratio_to_mean_bp"))
        .orderBy(col("cid"))
    },
    Some(s"""
      WITH vecs AS MATERIALIZED (
        SELECT vec_id, CAST(u.i AS INT) AS dim,
          CAST(round(CAST(embedding[u.i + 1] AS DOUBLE) * $Grid) AS BIGINT)
            + $Shift AS w
        FROM embeddings, range(0, 64) u(i)),
      cents AS MATERIALIZED (
        SELECT vec_id AS cid, dim, w AS c FROM vecs WHERE vec_id < $KCents),
      dist AS MATERIALIZED (
        SELECT v.vec_id, c.cid,
          CAST(sum((v.w - c.c) * (v.w - c.c)) AS BIGINT) AS d
        FROM vecs v JOIN cents c ON v.dim = c.dim
        GROUP BY v.vec_id, c.cid),
      assign AS MATERIALIZED (
        SELECT vec_id, CAST(min(d * $KCents + cid) % $KCents AS BIGINT)
          AS cid
        FROM dist GROUP BY vec_id),
      n AS (SELECT count(*) AS n_vectors FROM assign)
      SELECT cid, count(*) AS n_members,
        (SELECT n_vectors FROM n) AS n_vectors,
        count(*) * 10000 // (SELECT n_vectors FROM n) AS share_bp,
        count(*) * $KCents * 10000 // (SELECT n_vectors FROM n)
          AS ratio_to_mean_bp
      FROM assign GROUP BY cid ORDER BY cid"""))
}
