package graft.ops

import graft.SparkSpec

/** Pins for the round-6 analytics additions: q60 cohort retention, q61
  * interval-sweep peak concurrency (two-phase prefix sum), q62 Bloom
  * pre-join (runtime-filter semi-join reduction).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q60: retention cells are consistent and month-0 is the full cohort") {
    val rows = Relational4.q60CohortRetention.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val active = r.getAs[Long]("active_customers")
      val size = r.getAs[Long]("cohort_size")
      assert(active >= 1 && active <= size)
      assert(r.getAs[Long]("retention_bp") === active * 10000 / size)
      // months_since = 0 row exists per cohort and counts the whole cohort
      if (r.getAs[Int]("months_since") == 0) assert(active === size)
    }
    // every cohort has its month-0 row
    val cohorts = rows.map(_.getAs[java.sql.Date]("cohort_month")).distinct
    val m0 = rows.filter(_.getAs[Int]("months_since") == 0)
      .map(_.getAs[java.sql.Date]("cohort_month"))
    assert(m0.toSet === cohorts.toSet)
  }

  test("q61: planted intervals produce the known peak and first-peak time") {
    // [0,100) [50,150) [140,240): peak 2 first reached at t=50;
    // a fourth interval [60, 80) pushes the peak to 3 at t=60
    val ev = Seq((0L, 100L), (50L, 100L), (140L, 100L), (60L, 20L))
      .toDF("t0", "dur")
    val r = Relational4.peakConcurrency(ev).collect().head
    assert(r.getAs[Long]("peak_concurrency") === 3L)
    assert(r.getAs[java.sql.Timestamp]("first_peak_at").getTime === 0L ||
      // 60 µs after epoch — getTime is ms, so compare via the µs column
      true)
    val t = r.getAs[java.sql.Timestamp]("first_peak_at")
    assert(t.toInstant.getNano / 1000 + t.toInstant.getEpochSecond * 1000000
      === 60L)
  }

  test("q61: back-to-back endpoints — end applies before start (half-open)") {
    // [0,10) and [10,20): never concurrent, peak must be 1
    val ev = Seq((0L, 10L), (10L, 10L)).toDF("t0", "dur")
    val r = Relational4.peakConcurrency(ev).collect().head
    assert(r.getAs[Long]("peak_concurrency") === 1L)
  }

  test("q61 plan: only shard-level aggregates see an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val res = Relational4.q61PeakConcurrency.run(spark, sf0001)
    val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overShardTotals = w.child.collect {
        case a: Aggregate if a.groupingExpressions
          .exists(_.references.exists(_.name == "shard")) => a
      }
      assert(overShardTotals.nonEmpty,
        s"unpartitioned window over event-level rows:\n$w")
    }
  }

  test("q62: planted keys — zero false negatives, counts reconcile") {
    val dim = Seq(3L, 17L, 923L).toDF("k")
    val fact = (1L to 1000L).map(i => (i, i.toDouble / 100))
      .toDF("k", "l_extendedprice")
    val r = Relational4.bloomPrejoin(dim, fact).collect().head
    assert(r.getAs[Long]("n_fact") === 1000L)
    assert(r.getAs[Long]("n_true") === 3L) // all three dim keys in range
    // Bloom guarantee: every true match survives the probe
    assert(r.getAs[Long]("n_bloom_pass") >=  r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("n_bloom_pass") ===
      r.getAs[Long]("n_true") + r.getAs[Long]("n_false_pos"))
    assert(r.getAs[Double]("matched_revenue") ===
      (3.0 + 17.0 + 923.0) / 100)
  }

  test("q63: boundaries are the least values reaching their exact targets") {
    val rows = Relational4.q63ExactDeciles.run(spark, sf0001).collect()
    assert(rows.length === 9)
    val n = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    val prices = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_extendedprice").as[Double].collect().sorted
    rows.foreach { r =>
      val k = r.getAs[Long]("decile")
      val target = (k * n + 9) / 10
      assert(r.getAs[Long]("target_count") === target)
      // the driver-side recompute: target-th smallest value (1-based)
      assert(r.getAs[Double]("boundary_price") === prices(target.toInt - 1))
      assert(r.getAs[Long]("cum_count") >= target)
    }
  }

  test("q63 plan: only shard-level aggregates see an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val res = Relational4.q63ExactDeciles.run(spark, sf0001)
    val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overShardTotals = w.child.collect {
        case a: Aggregate if a.groupingExpressions
          .exists(_.references.exists(_.name == "shard")) => a
      }
      assert(overShardTotals.nonEmpty,
        s"unpartitioned window over value-level rows:\n$w")
    }
  }

  test("q64: planted orphans are detected and counted per occurrence and key") {
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Relational5.fkAudit(child, "fk", parent, "pk", "t").collect().head
    assert(r.getAs[Long]("child_rows") === 4L)
    assert(r.getAs[Long]("orphan_rows") === 2L)
    assert(r.getAs[Long]("orphan_keys") === 1L)
    // and the full audit over the driver's FK-consistent star is all zeros
    val rows = Relational5.q64FkOrphans.run(spark, sf0001).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Long]("orphan_rows") === 0L))
  }

  test("q65: each verdict classifies correctly with per-column change counts") {
    val old = Seq((1L, "A", BigDecimal(10)), (2L, "A", BigDecimal(20)),
      (3L, "B", BigDecimal(30))).toDF("k", "status", "price")
    val neu = Seq((2L, "Z", BigDecimal(20)), (3L, "B", BigDecimal(30)),
      (4L, "C", BigDecimal(40))).toDF("k", "status", "price")
    val got = Relational5.tableDiff(old, neu).collect()
      .map(r => r.getAs[String]("verdict") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("status_changes"),
          r.getAs[Long]("price_changes"))).toMap
    assert(got === Map(
      "added" -> ((1L, 0L, 0L)),
      "removed" -> ((1L, 0L, 0L)),
      "changed" -> ((1L, 1L, 0L)),
      "unchanged" -> ((1L, 0L, 0L))))
  }

  test("q66: planted touches split credit equally; orphan purchases report") {
    // purchase 100 (user 1, t=1000): touches view@900, click@950 → 500000
    // each; purchase 200 (user 2): no touches → unattributed; a touch
    // AFTER the purchase (user 1 view@1100) must not credit
    val ev = Seq(
      (1L, 1L, "view", 900L), (2L, 1L, "click", 950L),
      (100L, 1L, "purchase", 1000L), (3L, 1L, "view", 1100L),
      (200L, 2L, "purchase", 500L))
      .toDF("event_id", "user_id", "event_type", "t")
    val got = Relational5.multitouch(ev).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("credit_total"))).toMap
    assert(got === Map(
      "view" -> ((1L, 500000L)),
      "click" -> ((1L, 500000L)),
      "unattributed" -> ((1L, 0L))))
  }

  test("q62 plan: the bloom-word probe joins broadcast (constant-size build)") {
    val res = Relational4.q62BloomPrejoin.run(spark, sf0001)
    res.collect() // finalize AQE
    val plan = res.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 3, s"expected >=3 broadcast probes, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no probe may shuffle the fact side:\n$plan")
  }
}
