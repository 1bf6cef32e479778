package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for q80 ordered aggregation and g71 clustering coefficient. */
class OrderedAggSpec extends SparkSpec {

  test("q80: argmax and cheapest-3 list match a driver-side recompute") {
    val rows = Relational6.q80OrderedAgg.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select(col("p_brand"), col("p_partkey"), col("p_name"),
        col("p_retailprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val brand = r.getAs[String]("p_brand")
      val ps = parts(brand)
      assert(r.getAs[Long]("n_parts") === ps.length)
      val top = ps.maxBy(p => (p._4, p._2))
      assert(r.getAs[String]("priciest_part") === top._3)
      assert(r.getAs[Double]("max_price") === top._4)
      val cheap3 = ps.sortBy(p => (p._4, p._2)).take(3).map(_._3)
      assert(r.getAs[String]("cheapest3") === cheap3.mkString("|"))
    }
  }

  test("g71: coefficients match a driver-side triangle recompute") {
    val rows = Graph3.g71ClusteringCoef.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val lp = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = lp.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val n = r.getAs[Long]("p_partkey")
      val deg = adj(n).size.toLong
      assert(r.getAs[Long]("deg") === deg)
      val tri = adj(n).toSeq.combinations(2)
        .count { case Seq(u, v) => edges.contains(if (u < v) (u, v) else (v, u)) }
      assert(r.getAs[Long]("n_triangles") === tri.toLong)
      assert(r.getAs[Long]("clustering_bp") ===
        tri.toLong * 10000 / (deg * (deg - 1) / 2))
    }
    // deg-1 nodes are excluded by contract
    rows.foreach(r => assert(r.getAs[Long]("deg") >= 2))
  }
}
