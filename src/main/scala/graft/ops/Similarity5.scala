package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Q.t

/** Vector-index MAINTENANCE: the incremental path that keeps an ANN index
  * alive between rebuilds.
  */
object Similarity5 {

  def pack: Seq[Q] = Seq(e75IvfDelta)

  private val Grid = 512L
  private val Shift = 512L
  private val KCents = 16

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
