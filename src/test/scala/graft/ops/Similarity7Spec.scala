package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the int8 scalar-quantization search (e85/e85b): a planted
  * near-identical neighbor must survive quantization, and the real-data
  * recall audit must stay high — SQ8 at 64 dims with a 4× rerank
  * shortlist loses almost nothing, which is why serving stacks default
  * to it.
  */
class Similarity7Spec extends SparkSpec {

  import spark.implicits._

  private def embOf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("e85: a planted near-duplicate of the query ranks first through int8 codes") {
    val rnd = new scala.util.Random(7)
    def randVec(): Seq[Float] = Seq.fill(64)(rnd.nextFloat() * 2f - 1f)
    val q0 = randVec()
    // corpus 100 = q0 nudged by ~1e-3 per dim — far inside SQ8 resolution
    val near = q0.map(x => x + 0.001f)
    val far = (1 to 30).map(i => (100L + i, randVec()))
    val out = Similarity7.sqTopK(
      embOf(Seq((0L, q0), (100L, near)) ++ far: _*), nQueries = 1, k = 5)
      .collect()
    assert(out.head.getAs[Long]("cid") === 100L)
    assert(out.head.getAs[Int]("rank") === 1)
    assert(out.head.getAs[Double]("cos") > 0.999)
    // ranks are dense 1..5 for the single query
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
  }

  test("e85: quantizer drops all-zero vectors instead of emitting NaN codes") {
    val rnd = new scala.util.Random(11)
    def randVec(): Seq[Float] = Seq.fill(64)(rnd.nextFloat() * 2f - 1f)
    val corpus = (1 to 8).map(i => (100L + i, randVec())) :+
      (200L, Seq.fill(64)(0f)) // must not appear and must not poison ranks
    val out = Similarity7.sqTopK(
      embOf(Seq((0L, randVec())) ++ corpus: _*), nQueries = 1, k = 20)
      .collect()
    assert(!out.exists(_.getAs[Long]("cid") == 200L))
    assert(out.forall(r => !r.getAs[Double]("cos").isNaN))
  }

  test("e86: recall is monotone in the shortlist size and C=40 equals e85b") {
    val sweep = graft.SparkEntry.queries("e86_sq_refine_sweep")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("refine_c"), r.getAs[Long]("qid")) ->
        r.getAs[Long]("n_hit")).toMap
    assert(sweep.size === 15) // 3 settings x 5 queries
    (0L to 4L).foreach { qid =>
      assert(sweep((10, qid)) <= sweep((20, qid)), s"qid $qid 10->20")
      assert(sweep((20, qid)) <= sweep((40, qid)), s"qid $qid 20->40")
    }
    // the C=40 column IS e85's serving configuration — must agree with e85b
    val b = graft.SparkEntry.queries("e85b_sq_recall")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_hit")).toMap
    (0L to 4L).foreach(qid => assert(sweep((40, qid)) === b(qid), s"qid $qid"))
  }

  test("e85b: real-data recall@10 of the SQ8 search stays high") {
    val rows = graft.SparkEntry.queries("e85b_sq_recall")(spark, sf0001).collect()
    assert(rows.length === 5) // one row per query
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 10L)
      assert(r.getAs[Double]("recall_at_10") >= 0.8,
        s"qid ${r.getAs[Long]("qid")} recall ${r.getAs[Double]("recall_at_10")}")
    }
  }
}
