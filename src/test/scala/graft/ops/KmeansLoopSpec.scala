package graft.ops

import graft.SparkSpec

/** Planted pins for e68's k-means training loop: exact-duplicate corpora
  * have a closed-form fixpoint (every centroid stays at its seed vector,
  * membership = itself + its duplicates), so three Lloyd rounds must
  * reproduce it exactly on the integer grid.
  */
class KmeansLoopSpec extends SparkSpec {
  import spark.implicits._

  test("e68: duplicate-of-seed corpus converges to the seeds with exact counts") {
    // 16 well-separated seeds (vec i: +0.5 at dim i, -0.5/(i+2) elsewhere);
    // ids 16-18 duplicate seed 3, id 19 duplicates seed 7
    def seed(i: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == i) 0.5f else -0.5f / (i + 2))
    val emb = ((0 until 16).map(i => (i.toLong, seed(i))) ++
      Seq((16L, seed(3)), (17L, seed(3)), (18L, seed(3)), (19L, seed(7))))
      .toDF("vec_id", "embedding")
    val rows = Similarity3.kmeansTrain(emb, iters = 3).collect()
    assert(rows.length === 16 * 64)
    val members = rows.groupBy(_.getAs[Long]("cid"))
      .view.mapValues(_.map(_.getAs[Long]("n_members")).distinct.toList).toMap
    (0L until 16L).foreach { c =>
      val expect = c match { case 3L => 4L; case 7L => 2L; case _ => 1L }
      assert(members(c) === List(expect), s"cid $c")
    }
    // centroids sit exactly on their seed's grid points
    val grid = (i: Long, d: Int) =>
      math.round((if (d == i) 0.5f else -0.5f / (i + 2)).toDouble * 512)
    rows.foreach { r =>
      val (c, d) = (r.getAs[Long]("cid"), r.getAs[Int]("dim"))
      assert(r.getAs[Long]("center_val") === grid(c, d), s"cid $c dim $d")
    }
  }

  test("e71: a rank-1 corpus recovers its direction exactly") {
    import spark.implicits._
    // u = (0.5, 0.25, 0, ..., 0) with power-of-two scales — every grid
    // snap is EXACT, so the data is exactly rank-1 and the converged
    // vector must be exactly (10^6, 500000, 0, ..., 0)
    def v(scale: Float): Array[Float] =
      Array.tabulate(64)(d => if (d == 0) 0.5f * scale
        else if (d == 1) 0.25f * scale else 0f)
    val emb = Seq((0L, v(1f)), (1L, v(2f)), (2L, v(0.5f)), (3L, v(0.25f)))
      .toDF("vec_id", "embedding")
    val got = Similarity3.powerIteration(emb, iters = 2).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Long]("v")).toMap
    assert(got(0) === 1000000L)
    assert(got(1) === 500000L)
    (2 until 64).foreach(d => assert(got(d) === 0L, s"dim $d"))
  }

  test("e72: list census reconciles — members sum to corpus, bp consistent") {
    val rows = Similarity3.e72IvfBalance.run(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val n = rows.head.getAs[Long]("n_vectors")
    assert(rows.map(_.getAs[Long]("n_members")).sum === n)
    rows.foreach { r =>
      val m = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("share_bp") === m * 10000 / n)
      assert(r.getAs[Long]("ratio_to_mean_bp") === m * 16 * 10000 / n)
    }
  }

  test("e71: the normalized output is bounded with the max dim at ±10^6") {
    val rows = Similarity3.powerIteration(
      spark.read.parquet(s"$sf0001/embeddings.parquet"), iters = 2).collect()
    assert(rows.length === 64)
    val vals = rows.map(_.getAs[Long]("v"))
    assert(vals.map(math.abs).max === 1000000L)
    assert(vals.forall(x => math.abs(x) <= 1000000L))
  }
}
