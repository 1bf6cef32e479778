package graft.ops

import graft.SparkSpec

/** Pins for the vector wave: e73 NN-descent refinement, e74 MMR selection. */
class Similarity4Spec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap

  test("e73: one round never degrades the initial ring graph") {
    val rows = Similarity4.e73NnDescent.run(spark, sf0001).collect()
    val n = vecs.size
    val byNode = rows.groupBy(_.getAs[Long]("qid"))
    assert(byNode.size === n)
    byNode.foreach { case (node, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4))
      // refined top-4 is chosen from a superset of the initial ring
      // neighbors, so its total similarity can only improve
      val refined = rs.map(_.getAs[Double]("cos")).sum
      val ring = (1 to 4)
        .map(d => cos(vecs(node), vecs((node + d) % n))).sum
      assert(refined >= ring - 1e-9, s"node $node got worse")
      // and neighbors are distinct, never the node itself
      val nbrs = rs.map(_.getAs[Long]("cid"))
      assert(nbrs.distinct.length === 4 && !nbrs.contains(node))
    }
  }

  test("e74: picks replay a driver-side greedy MMR exactly") {
    val rows = Similarity4.e74MmrSelect.run(spark, sf0001).collect()
    val qids = vecs.keys.filter(_ < 5)
    val cands = vecs.keys.filter(_ >= 5).toSeq.sorted
    def uInt(x: Double): Long = // round-half-away-from-zero, as both engines
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = qids.flatMap { q =>
      // candidate pool: top-10 by FULL-precision cosine (ties → lower
      // cid, matching the engine's rank order), relevance on the µ grid
      val pool = cands.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, x) => (-x, c) }.take(10)
      val rel = pool.map { case (c, x) =>
        c -> uInt(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.toMap
      var selected = Vector.empty[Long]
      (1 to 5).foreach { _ =>
        val pick = rel.keys.filterNot(selected.contains).minBy { c =>
          val msim = if (selected.isEmpty) 0L
            else selected.map(sc => uInt(cos(vecs(c), vecs(sc)))).max
          (6000001L - (rel(c) * 2 - msim)) * 4294967296L + c
        }
        selected :+= pick
      }
      selected.zipWithIndex.map { case (c, i) => (q, i + 1) -> c }
    }.toMap
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Int]("pick")) ->
      r.getAs[Long]("cid")).toMap
    assert(got === expected)
  }
}
