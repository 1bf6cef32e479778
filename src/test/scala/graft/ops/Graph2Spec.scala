package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the second graph wave: g67 label propagation, g68
  * common-neighbor link prediction.
  */
class Graph2Spec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("g67: two cliques joined by a bridge settle into two communities") {
    val edges = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
    val got = Graph2.labelPropagation(edges, Graph2.LpaIters).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    // hand-traced deterministic (max-count, min-label) sync dynamics:
    // clique A converges to label 1, clique B to label 3
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("g67: community sizes reconcile with the node count") {
    val rows = Graph2.g67LabelProp.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byComm = rows.groupBy(_.getAs[Long]("community"))
    byComm.foreach { case (_, rs) =>
      // every row of one community reports that community's true size
      rs.foreach(r => assert(r.getAs[Long]("community_size") === rs.length))
    }
    assert(byComm.valuesIterator.map(_.length).sum === rows.length)
  }

  test("g68: pair metrics match a driver-side recompute on sf0.001") {
    val rows = Graph2.g68LinkPred.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val cs = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = cs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byCust = cs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      sa <- bySupp.keys; sb <- bySupp.keys if sa < sb
      common = (bySupp(sa) & bySupp(sb)).size if common >= 2
    } yield (sa, sb) -> common).toMap
    assert(rows.map(r => (r.getAs[Long]("s_a"), r.getAs[Long]("s_b")) ->
      r.getAs[Long]("common")).toMap === expected)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[Long]("s_a"), r.getAs[Long]("s_b"))
      val inter = bySupp(sa) & bySupp(sb)
      val union = (bySupp(sa) | bySupp(sb)).size
      assert(r.getAs[Long]("jaccard_bp") === inter.size * 10000L / union)
      val aa = inter.toSeq.map(c => 1.0 / math.log(byCust(c).size.toDouble)).sum
      assert(math.abs(r.getAs[Double]("adamic_adar") - aa) < 1e-5)
      assert(r.getAs[Long]("n_a") === bySupp(sa).size)
      assert(r.getAs[Long]("n_b") === bySupp(sb).size)
    }
  }
}
