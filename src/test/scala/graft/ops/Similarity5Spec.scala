package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for e75 incremental IVF maintenance. */
class Similarity5Spec extends SparkSpec {

  test("e75: counts reconcile and the delta is exactly the newest 20%") {
    val rows = Similarity5.e75IvfDelta.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val nDelta = rows.map(_.getAs[Long]("n_delta")).sum
    val nBase = rows.map(_.getAs[Long]("n_base")).sum
    assert(nBase + nDelta === n)
    assert(nDelta === n - n * 8 / 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") ===
        r.getAs[Long]("n_base") + r.getAs[Long]("n_delta"))
      val bp = r.getAs[Long]("delta_share_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("e79: subspace shares sum to ~10000 bp and MSEs are positive") {
    val rows = Similarity5.e79PqDistortion.run(spark, sf0001).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_mse") > 0.0)
      assert(r.getAs[Long]("share_bp") > 0L)
    }
    val total = rows.map(_.getAs[Long]("share_bp")).sum
    assert(total >= 10000 - 8 && total <= 10000, s"shares sum to $total")
    val n = rows.map(_.getAs[Long]("n_vectors")).distinct
    assert(n.length === 1)
  }

  test("e78: ILD matches a driver-side pairwise recompute") {
    val rows = Similarity5.e78IntraListDiversity.run(spark, sf0001).collect()
    assert(rows.length === 5)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      d / (na / 1 * nb)
    }
    val cands = vecs.keys.filter(_ >= 5).toSeq
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val top = cands.map(c => (c, cos(vecs(qid), vecs(c))))
        .sortBy { case (c, x) => (-x, c) }.take(10).map(_._1)
      val pairs = for (i <- top.indices; j <- (i + 1) until top.length)
        yield 1.0 - cos(vecs(top(i)), vecs(top(j)))
      assert(r.getAs[Long]("n_pairs") === pairs.length.toLong)
      assert(math.abs(r.getAs[Double]("ild") -
        pairs.sum / pairs.length) < 1e-5)
    }
  }

  test("e77: health panel matches a driver-side recompute") {
    val row = Similarity5.e77EmbeddingHealth.run(spark, sf0001).collect().head
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(_.getSeq[Float](1).toArray)
    assert(row.getAs[Long]("n_vectors") === vecs.length.toLong)
    assert(row.getAs[Int]("min_dims") === vecs.map(_.length).min)
    assert(row.getAs[Int]("max_dims") === vecs.map(_.length).max)
    assert(row.getAs[Long]("n_nan") ===
      vecs.count(_.exists(_.isNaN)).toLong)
    assert(row.getAs[Double]("min_val") ===
      vecs.flatten.min.toDouble)
    assert(row.getAs[Double]("max_val") ===
      vecs.flatten.max.toDouble)
    val meanNorm = vecs.map(v =>
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)).sum / vecs.length
    assert(math.abs(row.getAs[Double]("mean_norm") - meanNorm) < 1e-5)
  }

  test("e76: recall is monotone in nprobe and bounded by k") {
    val rows = Similarity5.e76NprobeSweep.run(spark, sf0001).collect()
    assert(rows.length === 15) // 3 probe settings x 5 queries
    rows.foreach { r =>
      val h = r.getAs[Long]("hits")
      assert(h >= 0 && h <= 10)
      assert(r.getAs[Long]("recall_bp") === h * 1000)
    }
    // widening the probe list can only add candidates → recall monotone
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byNp = rs.sortBy(_.getAs[Int]("nprobe"))
        .map(_.getAs[Long]("hits")).toSeq
      assert(byNp === byNp.sorted, s"recall not monotone: $byNp")
    }
  }

  test("e75: delta assignment agrees with a full e72-style reassignment") {
    // the incremental path must give every delta vector the same list the
    // batch path would: recompute a single-pass assignment driver-side
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def grid(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 512) + 512)
    val cents = (0L until 16L).map(i => i -> grid(emb(i))).toMap
    def assignOf(v: Array[Float]): Long = {
      val g = grid(v)
      cents.map { case (cid, c) =>
        val d = g.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        d * 16 + cid
      }.min % 16
    }
    val expected = emb.keys.toSeq.map(id => assignOf(emb(id)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Similarity5.e75IvfDelta.run(spark, sf0001).collect()
    val got = rows.map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_total"))
      .toMap
    assert(got === expected.filter(_._2 > 0))
  }
}
