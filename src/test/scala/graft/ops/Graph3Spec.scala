package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the third graph wave: g69 weighted SSSP, g70 assortativity. */
class Graph3Spec extends SparkSpec {
  import spark.implicits._

  test("g69 core: frontier Bellman-Ford finds known shortest paths") {
    // 1 →(5)→ 2 →(1)→ 3 ; 1 →(10)→ 3 ; 3 →(1)→ 4 ; isolated 9 unreached
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 1L),
      (9L, 9L, 1L)).toDF("src", "dst", "len")
    val seeds = Seq((1L, 0L)).toDF("node", "d")
    val got = Graph3.sssp(edges, seeds, rounds = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    assert(got === Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 7L))
  }

  test("g69 core: horizon cuts exactly at `rounds` relaxations") {
    // a chain 0-1-2-3: 2 rounds reach node 2 but not node 3
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "len")
    val seeds = Seq((0L, 0L)).toDF("node", "d")
    val got = Graph3.sssp(edges, seeds, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("g69: distances satisfy the triangle property on sf0.001") {
    val rows = Graph3.g69Sssp.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // exactly one node at distance 0 (the source), everything else > 0
    val zero = rows.filter(_.getAs[Long]("dist") == 0L)
    assert(zero.length === 1 && zero.head.getAs[String]("kind") === "customer")
    rows.foreach(r => assert(r.getAs[Long]("dist") >= 0))
  }

  test("g72: modularity is bounded and reconciles with a driver recompute") {
    val row = Graph3.g72Modularity.run(spark, sf0001).collect().head
    val q = row.getAs[Double]("modularity")
    assert(q >= -0.5 && q <= 1.0) // Newman's hard bounds
    // recompute from the same LPA labels driver-side
    val pairs = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = pairs ++ pairs.map(p => (p._2, p._1))
    val edgesDf = {
      import spark.implicits._
      sym.toSeq.toDF("src", "dst")
    }
    val labels = Graph2.labelPropagation(edgesDf, Graph2.LpaIters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigL = sym.length.toDouble
    val byComm = sym.groupBy(e => labels(e._1))
    val expected = byComm.values.map { es =>
      val dC = es.length.toDouble
      val intra = es.count(e => labels(e._1) == labels(e._2)).toDouble
      intra / bigL - (dC / bigL) * (dC / bigL)
    }.sum
    assert(math.abs(q - expected) < 1e-9)
    assert(row.getAs[Long]("m_edges") === pairs.length.toLong)
    assert(row.getAs[Long]("n_communities") === byComm.size.toLong)
  }

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("g75: buckets reconcile with driver-side degrees; CCDF descends") {
    val rows = Graph3.g75DegreeHistogram.run(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    val pairs = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = deg.values
      .groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d.toLong))
      .view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r.getAs[Long]("bucket").toInt ->
      r.getAs[Long]("n_nodes")).toMap === expected)
    rows.foreach(r => assert(r.getAs[Long]("min_degree") ===
      (1L << r.getAs[Long]("bucket"))))
    val ccdf = rows.map(_.getAs[Long]("ccdf_bp"))
    ccdf.sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo); case _ => ()
    }
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === deg.size.toLong)
  }

  test("g73: double sweep is exact on a path graph") {
    // path 2-4-6-8-10 (even ids so parity decoding never applies):
    // anchor = 2, farthest = 10, second sweep eccentricity = 4
    val edges = sym(Seq((2L, 4L), (4L, 6L), (6L, 8L), (8L, 10L)))
      .withColumn("len", lit(1L))
    val anchor = edges.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0L).as("d"))
    val s1 = Graph3.sssp(edges, anchor, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1(10L) === 4L)
    val far = Seq((10L, 0L)).toDF("node", "d")
    val s2 = Graph3.sssp(edges, far, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s2.values.max === 4L) // true diameter of the path
  }

  test("g73: report is internally consistent on sf0.001") {
    val row = Graph3.g73Diameter.run(spark, sf0001).collect().head
    assert(row.getAs[Long]("diameter_lb") >= 1L)
    assert(row.getAs[Long]("diameter_lb") <= Graph3.BfsRounds.toLong)
    assert(row.getAs[Long]("n_reached") >= 2L)
    assert(row.getAs[Long]("anchor_node") % 2 === 0L) // a customer node
  }

  test("g70: hand-sized graph matches a driver-side Pearson recompute") {
    val row = Graph3.g70Assortativity.run(spark, sf0001).collect().head
    val pairs = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map { case (a, _) => deg(a).toDouble }
    val ys = edges.map { case (_, b) => deg(b).toDouble }
    val m = edges.length.toDouble
    val r = (m * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) /
      (math.sqrt(m * xs.map(x => x * x).sum - xs.sum * xs.sum) *
        math.sqrt(m * ys.map(y => y * y).sum - ys.sum * ys.sum))
    assert(row.getAs[Long]("m") === edges.length.toLong)
    assert(math.abs(row.getAs[Double]("assortativity") - r) < 1e-9)
    assert(row.getAs[Double]("assortativity") >= -1.0 &&
      row.getAs[Double]("assortativity") <= 1.0)
  }
}
