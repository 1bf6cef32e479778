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

  test("q81: cells reconcile — totals, expected mass, chi2 nonnegative") {
    val rows = Relational6.q81ChiSquare.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getAs[Long]("n")).sum
    // every segment's cells sum to its reported seg_total; same for cols
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, rs) =>
      val tot = rs.map(_.getAs[Long]("n")).sum
      rs.foreach(r => assert(r.getAs[Long]("seg_total") === tot))
    }
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, rs) =>
      val tot = rs.map(_.getAs[Long]("n")).sum
      rs.foreach(r => assert(r.getAs[Long]("pri_total") === tot))
    }
    rows.foreach { r =>
      val e = r.getAs[Double]("expected")
      assert(e === r.getAs[Long]("seg_total").toDouble *
        r.getAs[Long]("pri_total") / grand)
      assert(r.getAs[Double]("chi2_contrib") >= 0.0)
    }
    // expected mass sums back to the grand total
    assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - grand) < 1e-6)
  }

  test("d80: slope matches a driver-side least-squares fit") {
    val row = Corpus4.d80ZipfFit.run(spark, sf0001).collect().head
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(500)
    val xs = top.indices.map(i => math.log((i + 1).toDouble))
    val ys = top.map(t => math.log(t._2.toDouble))
    val v = top.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (v * sxy - sx * sy) / (v * sxx - sx * sx)
    assert(row.getAs[Long]("v") === top.length.toLong)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-5)
    assert(row.getAs[Double]("zipf_slope") < 0.0,
      "frequency must fall with rank")
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
