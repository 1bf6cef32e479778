package graft.ops

import graft.expr.{CountMinAggregator, GraftFunctions, Scored, TopKAggregator}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q.t

/** Queries exercising the engine's custom Catalyst surface: the native
  * codegen `cosine_sim` expression and the typed Aggregator UDAFs
  * (exact top-k, count-min sketch).
  */
object CustomExprQueries {

  def pack: Seq[Q] = Seq(e52CosineExpr, q26TopKUdaf, q53CmsHeavyHitters,
    q72TopkPhysical)

  /** q72: q07's per-brand top-3 re-planned through the CUSTOM PHYSICAL
    * OPERATOR ([[graft.plans.TopKPerKeyNode]] → partial/final
    * [[graft.plans.TopKPerKeyExec]] via the injected strategy) instead of
    * a rank window. Same rows, same oracle as q07 — the hash match plus
    * the plan-shape spec prove the operator end to end. The point at
    * scale: the window form shuffles EVERY aggregated row to its key's
    * partition; the operator's partial stage caps shuffle input at
    * k rows per (key, partition) — the partial/final contract hash
    * aggregation uses, applied to top-k.
    */
  val q72TopkPhysical: Q = Q(
    "q72_topk_physical",
    (s, dir) => {
      GraftFunctions.register(s)
      val li = t(s, dir, "lineitem")
      val part = broadcast(t(s, dir, "part"))
      val rev = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum(Q.discPrice).cast("double").as("revenue"))
      graft.plans.TopKPerKey.topK(rev, Seq(col("p_brand")),
          Seq(col("revenue").desc, col("l_partkey")), 3)
        .orderBy(col("p_brand"), col("revenue").desc, col("l_partkey"))
    },
    Relational.q07TopKPerBrand.oracle)

  /** e50's top-k re-run through the native expression — the throughput
    * path. Scores match the HOF/decimal variant to ~1e-15; output rounds to
    * 6dp so the oracle compare is unaffected by summation-order ulps.
    */
  val e52CosineExpr: Q = Q(
    "e52_cosine_expr",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = emb.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      Similarity.rankTopK(
        c.crossJoin(broadcast(q))
          .select(col("qid"), col("cid"),
            call_function("cosine_sim", col("qv"), col("cv")).as("cos")),
        k = 10)
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      c AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 5),
      dots AS (
        SELECT qid, cid,
          sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
          sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qq,
          sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cc
        FROM (SELECT qid, cid, unnest(qv) AS qx, unnest(cv) AS cx
              FROM q CROSS JOIN c) t
        GROUP BY qid, cid)
      SELECT qid, cid, round(cos, 6) AS cos, rank FROM (
        SELECT qid, cid, dot/(sqrt(qq)*sqrt(cc)) AS cos,
          CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY dot/(sqrt(qq)*sqrt(cc)) DESC, cid) AS INT) AS rank
        FROM dots) t
      WHERE rank <= 10 ORDER BY qid, rank"""))

  /** Exact top-3 orders per market segment via the typed Aggregator — the
    * shuffle carries only k rows per group (vs the window form, which
    * shuffles every row). The UDAF output array is ordered, so posexplode
    * yields the rank directly.
    */
  val q26TopKUdaf: Q = Q(
    "q26_topk_udaf",
    (s, dir) => {
      val topk = udaf(new TopKAggregator(3))
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      customer.join(orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(
          col("c_mktsegment"),
          (col("pos") + 1).cast("int").as("rank"),
          col("s.id").as("o_orderkey"),
          col("s.score").as("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank"))
    },
    Some("""
      SELECT c_mktsegment, CAST(rn AS INT) AS rank, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM customer JOIN orders ON c_custkey = o_custkey) t
      WHERE rn <= 3 ORDER BY c_mktsegment, rank"""))

  /** q53: count-min-sketch heavy hitters with an IN-QUERY exact audit.
    * One pass builds the constant-size sketch ([[CountMinAggregator]]:
    * partial sketches merge element-wise, so the shuffle ships one
    * depth×width array per partition no matter the input size); the exact
    * top-10 keys then read their point estimates back out of the sketch
    * and the output carries est − exact, so the dumped parquet PINS the
    * sketch's one-sided error like the d42b/e51b audits. The lookup UDF
    * runs on 10 rows against the broadcast one-row sketch — never on the
    * data path — and shares [[CountMinAggregator.bucket]] with the update
    * path so the two hashes cannot drift. No oracle (sketch internals are
    * engine-specific); `CmsSpec` enforces the never-undercount invariant
    * and the εN over-count envelope.
    */
  val q53CmsHeavyHitters: Q = Q(
    "q53_cms_heavy_hitters",
    (s, dir) => {
      val depth = 5
      val width = 8192
      val cms = udaf(new CountMinAggregator(depth, width))
      // referenced twice (sketch + exact audit side): pay the scan and the
      // spread shuffle once
      val ev = Q.spread(t(s, dir, "events"), "event_id")
        .select(col("user_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sketch = ev.agg(cms(col("user_id")).as("sk"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(10)
      val est = udf((sk: Seq[Long], key: Long) =>
        CountMinAggregator.estimate(sk.toArray, depth, width, key))
      val res = exact.crossJoin(broadcast(sketch))
        .select(col("user_id"), col("n_exact"),
          est(col("sk"), col("user_id")).as("n_est"))
        .withColumn("overcount", col("n_est") - col("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id"))
      Q.materialized(res, ev)
    },
    None)
}
