package graft.ops

import graft.SparkSpec

/** Pins the LSH-bucketed ANN on planted geometry: a near-identical vector
  * must be retrieved at rank 1; retrieved candidates must carry correct
  * exact cosine scores.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val rows =
      Seq((0L, base)) ++                       // query
        (5L until 80L).map(i => (i, vec())) ++ // random candidates
        Seq((80L, nearDup))                    // planted neighbor
    rows.toDF("vec_id", "embedding")
  }

  test("LSH ANN returns the planted near-duplicate at rank 1") {
    val top = Similarity.annTopK(emb, nQueries = 1, k = 5).collect()
    assert(top.nonEmpty, "ANN returned no candidates")
    val r1 = top.find(r => r.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("cid") === 80L)
    assert(r1.getAs[Double]("cos") > 0.99)
  }

  test("IVF ANN returns the planted near-duplicate at rank 1") {
    // centroids = vec_id % 37 == 0 → {0, 37, 74}: a real multi-list index
    val top = Similarity.ivfTopK(emb, nQueries = 1, k = 5).collect()
    assert(top.nonEmpty, "IVF returned no candidates")
    val r1 = top.find(r => r.getAs[Int]("rank") == 1).get
    assert(r1.getAs[Long]("cid") === 80L)
    assert(r1.getAs[Double]("cos") > 0.99)
  }

  test("ANN scores agree with the exact cosine of the brute-force path") {
    import org.apache.spark.sql.functions._
    val ann = Similarity.annTopK(emb, nQueries = 1, k = 5)
      .select(col("cid"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute-force exact cosine for the same query over all candidates
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qv"), Similarity.l2Norm(col("embedding")).as("qn"))
    val brute = emb.filter(col("vec_id") >= 5L)
      .crossJoin(q)
      .select(col("vec_id"),
        round(Similarity.dotExact(col("qv"), col("embedding")) /
          (col("qn") * Similarity.l2Norm(col("embedding"))), 6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (cid, cos) =>
      assert(math.abs(brute(cid) - cos) < 1e-9, s"cid=$cid ann=$cos brute=${brute(cid)}")
    }
  }

  test("two-pass queries keep the native scorer in their plans") {
    // guards the round-2 perf property: if a future edit drops the
    // codegen'd cosine_sim bulk scorer, these queries silently fall back
    // to interpreted decimal scoring (a ~10x regression the oracle compare
    // cannot see)
    Seq("e50_cosine_topk", "e53_ann_ivf", "d44_embedding_neardup").foreach {
      name =>
        val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        assert(plan.contains("cosine_sim"),
          s"$name lost the native cosine_sim scorer")
    }
    assert(graft.SparkEntry.queries("e55_mips_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString.contains("dot_product"),
      "e55_mips_topk lost the native dot_product scorer")
    // d45's Q entry eagerly materializes (its executed plan is an RDD
    // scan), so audit the lazy pipeline builder directly
    graft.expr.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val emb45 = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
    val (res45, sketch45) = Dedup.embeddingNearDupsLsh(emb45)
    try assert(res45.queryExecution.executedPlan.toString.contains("cosine_sim"),
      "d45_embedding_neardup_lsh lost the native cosine_sim scorer")
    finally sketch45.unpersist()
  }

  test("two-pass (native prefilter + exact re-rank) equals full exact top-k") {
    import org.apache.spark.sql.functions._
    graft.expr.GraftFunctions.register(spark)
    import spark.implicits._
    // fresh random geometry, intentionally different from the planted set;
    // includes near-ties (clustered directions) to stress the Eps boundary
    val rnd = new scala.util.Random(99)
    def vec(): Seq[Float] = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val anchor = vec()
    def nearAnchor(): Seq[Float] =
      anchor.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rows = (0L until 3L).map(i => (i, vec())) ++        // queries
      (3L until 40L).map(i => (i, if (i % 2 == 0) nearAnchor() else vec()))
    val emb2 = rows.toDF("vec_id", "embedding")
    val q = emb2.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb2.filter(col("vec_id") >= 3)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // full exact: every pair through the interpreted decimal scorer
    val full = Similarity.rankTopK(
      c.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          Similarity.cosExact(col("qv"), col("cv")).as("cos")),
      k = 10).collect().toSeq
    // two-pass: native bulk scoring, exact only near the boundary
    val fast = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        Similarity.cosNative(col("qv"), col("cv")).as("cosf"))
    val twoPass = Similarity.exactRerank(fast, q, c, k = 10).collect().toSeq
    assert(twoPass === full)
  }
}
