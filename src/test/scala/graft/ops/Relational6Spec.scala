package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the wave of classic warehouse shapes: q75 relational division,
  * q76 gaps-and-islands, q77 batch sessionization.
  */
class Relational6Spec extends SparkSpec {

  test("q75: exactly the customers covering every priority class") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val nPri = orders.select(col("o_orderpriority")).distinct().count()
    val expected = orders
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n"))
      .filter(col("n") === nPri)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val got = Relational6.q75Division.run(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getAs[Long]("c_custkey")).toSet === expected)
    got.foreach(r => assert(r.getAs[Long]("n_priorities") === nPri))
  }

  test("q76: islands are maximal consecutive runs of distinct order dates") {
    val rows = Relational6.q76Islands.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val dates = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d")).distinct()
      .collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Date](1).toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val cust = r.getAs[Long]("o_custkey")
      val s0 = r.getAs[java.sql.Date]("island_start").toLocalDate
      val s1 = r.getAs[java.sql.Date]("island_end").toLocalDate
      val n = r.getAs[Long]("n_days")
      // run is dense: every day inside the island is an order date
      assert(java.time.temporal.ChronoUnit.DAYS.between(s0, s1) + 1 === n)
      (0L until n).foreach(i => assert(dates(cust).contains(s0.plusDays(i))))
      // and maximal: the days flanking the island are NOT order dates
      assert(!dates(cust).contains(s0.minusDays(1)))
      assert(!dates(cust).contains(s1.plusDays(1)))
      assert(n >= 2)
    }
  }

  test("q77: sessions partition each user's events with >30min gaps between") {
    val rows = Relational6.q77BatchSessions.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val gapUs = 30L * 60 * 1000000
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000
    // per-user: session ids are 1..k in start order, consecutive sessions
    // separated by MORE than the timeout, and event counts reconcile
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      assert(sorted.map(_.getAs[Long]("session_id")).toSeq ===
        (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(us(b.getAs[java.sql.Timestamp]("session_start")) -
            us(a.getAs[java.sql.Timestamp]("session_end")) > gapUs,
            s"user $uid sessions not separated by >30min")
        case _ => ()
      }
      sorted.foreach { r =>
        assert(us(r.getAs[java.sql.Timestamp]("session_start")) <=
          us(r.getAs[java.sql.Timestamp]("session_end")))
      }
    }
    val perUser = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getAs[Long]("user_id")).view
      .mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    assert(got === perUser)
  }
}
