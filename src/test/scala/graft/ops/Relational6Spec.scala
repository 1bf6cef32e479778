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

  test("q78: classes are revenue-contiguous and the A block stops at 80%") {
    val rows = Relational6.q78AbcPareto.run(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSet === Set("A", "B", "C"))
    // in cumulative (rank) order the class sequence is A* B* C*
    val byRank = rows.sortBy(_.getAs[Long]("cum_bp"))
    val classes = byRank.map(_.getAs[String]("abc_class")).toSeq
    assert(classes === classes.sorted)
    // every A row sits at ≤80% cumulative share; the first B row crosses it
    byRank.foreach { r =>
      val bp = r.getAs[Long]("cum_bp")
      r.getAs[String]("abc_class") match {
        case "A" => assert(bp <= 8000)
        case "B" => assert(bp <= 9500)
        case _   => ()
      }
    }
    val firstB = byRank.find(_.getAs[String]("abc_class") == "B").get
    val lastA = byRank.reverse.find(_.getAs[String]("abc_class") == "A").get
    assert(firstB.getAs[Long]("cum_bp") > 8000 ||
      lastA.getAs[Long]("cum_bp") <= 8000)
    // revenue ordering respects the class ladder: min(A) >= max(B) etc.
    def revs(c: String) =
      rows.filter(_.getAs[String]("abc_class") == c).map(_.getAs[Double]("revenue"))
    assert(revs("A").min >= revs("B").max)
    assert(revs("B").min >= revs("C").max)
  }

  test("q93: twenty ranks per year; verdicts match null patterns") {
    val rows = Relational6.q93LeaderboardChurn.run(spark, sf0001).collect()
    assert(rows.count(!_.isNullAt(1)) === 20) // rank_1999 populated
    assert(rows.count(!_.isNullAt(2)) === 20) // rank_2000 populated
    rows.foreach { r =>
      val v = r.getAs[String]("verdict")
      (r.isNullAt(1), r.isNullAt(2)) match {
        case (false, false) => assert(v === "stayed")
        case (true, false)  => assert(v === "entered")
        case (false, true)  => assert(v === "exited")
        case _ => fail("row with no rank at all")
      }
    }
    // each year's ranks are exactly 1..20
    assert(rows.filter(!_.isNullAt(1)).map(_.getAs[Int]("rank_1999"))
      .sorted.toSeq === (1 to 20))
    assert(rows.filter(!_.isNullAt(2)).map(_.getAs[Int]("rank_2000"))
      .sorted.toSeq === (1 to 20))
  }

  test("q92: the curve is dense, monotone, and ends at total distinct users") {
    val rows = Relational6.q92CumulativeUniques.run(spark, sf0001).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("new_users")
      assert(r.getAs[Long]("cumulative_users") === cum)
    }
    val nUsers = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(cum === nUsers)
    // dense calendar: consecutive days
    rows.map(_.getAs[java.sql.Date]("day").toLocalDate).sliding(2).foreach {
      case Array(a, b) => assert(b === a.plusDays(1)); case _ => ()
    }
  }

  test("q91: twelve months, shares sum to one, index averages to 10000") {
    val rows = Relational6.q91Seasonality.run(spark, sf0001).collect()
    assert(rows.map(_.getAs[Int]("month")).sorted.toSeq === (1 to 12))
    val total = rows.map(_.getAs[Double]("revenue")).sum
    rows.foreach { r =>
      val expected = (BigDecimal(r.getAs[Double]("revenue")) * 12 * 10000 /
        BigDecimal(total)).toLong
      // integer division truncation: within 1 bp of the rational value
      assert(math.abs(r.getAs[Long]("seasonality_bp") - expected) <= 1)
    }
    val meanIdx = rows.map(_.getAs[Long]("seasonality_bp")).sum / 12.0
    assert(math.abs(meanIdx - 10000.0) < 12.0)
  }

  test("q89: every reported supplier was top-3 in all its active years") {
    val rows = Relational6.q89ConsistentTop.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the (nation, year) rankings
    val rev = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), year(col("l_shipdate")).as("yr"),
        col("s_suppkey"))
      .agg((sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount")).cast("decimal(4,2)")) * 10000)
        .cast("long").as("u"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byCell = rev.groupBy(r => (r._1, r._2))
    val top3 = byCell.values.flatMap { cell =>
      cell.sortBy(r => (-r._4, r._3)).take(3).map(r => (r._3, r._2))
    }.toSet
    val active = rev.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    val expected = active.filter { case (sk, yrs) =>
      yrs.forall(y => top3.contains((sk, y)))
    }.keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet === expected)
    rows.foreach(r => assert(r.getAs[Long]("n_years_active") ===
      active(r.getAs[Long]("s_suppkey")).size.toLong))
  }

  test("q90: by-name union never pairs brand with price") {
    val rows = Relational6.q90SchemaEvolution.run(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("writer")).toSeq === Seq("v1", "v2"))
    val nPart = spark.read.parquet(s"$sf0001/part.parquet").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === nPart)
    rows.foreach { r =>
      if (r.getAs[String]("writer") == "v1") {
        assert(r.getAs[Long]("null_brand") === 0L)
        assert(r.getAs[Long]("null_price") === r.getAs[Long]("n_rows"))
      } else {
        assert(r.getAs[Long]("null_brand") === r.getAs[Long]("n_rows"))
        assert(r.getAs[Long]("null_price") === 0L)
      }
    }
  }

  test("q88: one row per customer; cold customers zero-filled, not dropped") {
    val rows = Relational6.q88FeatureStore.run(spark, sf0001).collect()
    val nCust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(rows.length.toLong === nCust)
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length.toLong === nCust)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      if (n == 0L) {
        assert(r.getAs[Double]("total_spend") === 0.0)
        assert(r.isNullAt(r.fieldIndex("recency_days")))
        assert(r.getAs[Long]("n_lines") === 0L)
      } else {
        assert(r.getAs[Long]("n_urgent") <= n)
        assert(r.getAs[Int]("recency_days") >= 0)
      }
    }
    // totals reconcile with the raw fact tables
    assert(rows.map(_.getAs[Long]("n_orders")).sum ===
      spark.read.parquet(s"$sf0001/orders.parquet").count())
    assert(rows.map(_.getAs[Long]("n_lines")).sum ===
      spark.read.parquet(s"$sf0001/lineitem.parquet").count())
  }

  test("q87: rank percentiles match a driver-side sorted pick") {
    val rows = Relational6.q87LatencyPercentiles.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val lat = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("days"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def rankPick(vs: IndexedSeq[Long], p: Int): Long =
      vs(math.max(0, (vs.length * p + 99) / 100 - 1))
    rows.foreach { r =>
      val vs = lat(r.getAs[String]("o_orderpriority"))
      assert(r.getAs[Long]("n_lines") === vs.length.toLong)
      assert(r.getAs[Long]("p50") === rankPick(vs, 50))
      assert(r.getAs[Long]("p90") === rankPick(vs, 90))
      assert(r.getAs[Long]("p99") === rankPick(vs, 99))
      assert(math.abs(r.getAs[Double]("mean_days") -
        vs.sum.toDouble / vs.length) < 1e-9)
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p90"))
      assert(r.getAs[Long]("p90") <= r.getAs[Long]("p99"))
    }
  }

  test("q86: effects decompose the delta exactly (residual identity)") {
    val rows = Relational6.q86MixShift.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("delta") -
        (r.getAs[Double]("rev_2000") - r.getAs[Double]("rev_1999"))) < 1e-9)
      if (!r.isNullAt(r.fieldIndex("volume_effect"))) {
        // the two effects sum back to the delta by construction
        assert(math.abs(r.getAs[Double]("volume_effect") +
          r.getAs[Double]("price_effect") - r.getAs[Double]("delta")) < 1e-9)
      }
    }
  }

  test("q84: census matches a driver-side Q22 recompute") {
    val rows = Relational6.q84DormantValue.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val segs = Set("AUTOMOBILE", "BUILDING", "MACHINERY")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(c => segs.contains(c._2))
    val avg = {
      val pos = cust.filter(_._3 > 0)
      pos.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / pos.length
    }
    val recent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val expected = cust.filter(c => c._3 > avg && !recent.contains(c._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getAs[String]("c_mktsegment") ->
      r.getAs[Long]("n_custs")).toMap === expected)
  }

  test("q85: deviations reconcile with a driver-side header-vs-lines sum") {
    val rows = Relational6.q85ParentChildRecon.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === nOrders)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("mean_abs_dev_u") ===
        r.getAs[Long]("abs_dev_u") / r.getAs[Long]("n_orders"))
    }
  }

  test("q78 plan: only shard-level aggregates see an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val res = Relational6.q78AbcPareto.run(spark, sf0001)
    val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overShardTotals = w.child.collect {
        case a: Aggregate if a.groupingExpressions
          .exists(_.references.exists(_.name == "shard")) => a
      }
      assert(overShardTotals.nonEmpty,
        s"unpartitioned window over part-level rows:\n$w")
    }
  }

  test("q79: medians match a driver-side recompute; fences are robust") {
    val rows = Relational6.q79MadOutliers.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val data = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def lowerMedian(vs: IndexedSeq[Double]): Double = vs((vs.length - 1) / 2)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vs = data(et)
      val med = lowerMedian(vs)
      assert(r.getAs[Double]("median_value") === med)
      assert(r.getAs[Double]("mad") === lowerMedian(vs.map(v => math.abs(v - med)).sorted))
      assert(r.getAs[Long]("n_events") === vs.length)
      val mad = r.getAs[Double]("mad")
      assert(r.getAs[Long]("n_outliers") ===
        vs.count(v => math.abs(v - med) > 3 * mad))
    }
  }

  test("q82: trailing medians match a driver-side recompute") {
    val rows = Relational6.q82MovingMedian.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toLocalDate,
        r.getLong(2)))
    val byNation = daily.groupBy(_._1)
    rows.foreach { r =>
      val nation = r.getAs[String]("nation")
      val day = r.getAs[java.sql.Date]("day").toLocalDate
      val win = byNation(nation)
        .filter(d => !d._2.isAfter(day) && d._2.isAfter(day.minusDays(7)))
        .sortBy(d => (d._3, d._2.toEpochDay))
      assert(r.getAs[Long]("n_days") === win.length.toLong)
      val med = win((win.length - 1) / 2)._3
      assert(r.getAs[Double]("trailing_median") === med.toDouble / 100)
    }
  }

  test("d81: round-robin interleave — consecutive positions rotate langs") {
    val rows = Corpus4.d81InterleaveSchedule.run(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("global_pos"))
    assert(rows.length === 100)
    val langs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang")).distinct().collect().map(_.getString(0)).sorted
    val l = langs.length
    // positions are unique and every block of L positions covers each
    // lang exactly once (while all langs still have docs remaining)
    assert(rows.map(_.getAs[Long]("global_pos")).distinct.length === 100)
    rows.take(l * (100 / l)).grouped(l).foreach { block =>
      assert(block.map(_.getAs[String]("lang")).sorted.toSeq === langs.toSeq)
    }
    // and doc_ids never repeat
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 100)
  }

  test("q83: interpolated points sit on the segment between their brackets") {
    val rows = Relational6.q83LinearInterp.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val srcs = rows.map(_.getAs[String]("src")).toSet
    assert(srcs.contains("actual"))
    // grid is dense per region: consecutive days, no holes
    rows.groupBy(_.getAs[String]("region")).foreach { case (_, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate)
        .sortBy(_.toEpochDay)
      days.sliding(2).foreach {
        case Array(a, b) => assert(b === a.plusDays(1))
        case _ => ()
      }
      // interpolated values are between their neighbors' actual values
      val series = rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      series.zipWithIndex.filter(_._1.getAs[String]("src") == "interpolated")
        .foreach { case (r, i) =>
          val before = series.take(i).reverse
            .find(_.getAs[String]("src") == "actual").get.getAs[Double]("value")
          val after = series.drop(i + 1)
            .find(_.getAs[String]("src") == "actual").get.getAs[Double]("value")
          val v = r.getAs[Double]("value")
          assert(v >= math.min(before, after) - 0.02 &&
            v <= math.max(before, after) + 0.02,
            s"interpolation out of bracket: $v not in [$before, $after]")
        }
      // edge rows only at the ends, with null value
      series.filter(_.getAs[String]("src") == "edge")
        .foreach(r => assert(r.isNullAt(r.fieldIndex("value"))))
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
