package graft.ops

import graft.SparkSpec

/** e69 hard-negative mining pins: the label constraint excludes the
  * query's own class, ranks are dense per query, and the mined negatives
  * really are the nearest wrong-label rows.
  */
class HardNegativesSpec extends SparkSpec {

  test("e69: no mined negative shares its query's label; ranks are dense") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qLabels = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label"))
      .toMap
    val rows = graft.SparkEntry.queries("e69_hard_negatives")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("clabel") !== qLabels(r.getAs[Long]("qid")))
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toList ===
        (1 to rs.length).toList)
      // distances are non-decreasing in rank — the negatives are truly
      // the nearest wrong-label rows
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("d2"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q67: movers order by absolute swing with consistent delta columns") {
    val rows = Relational5.q67PeriodMovers.run(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val d = r.getAs[Long]("delta_e4")
      assert(d === r.getAs[Long]("cur_e4") - r.getAs[Long]("prev_e4"))
      assert(math.signum(r.getAs[Long]("delta_bp").toDouble) ===
        math.signum(d.toDouble))
    }
    val mags = rows.map(r => math.abs(r.getAs[Long]("delta_e4")))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
  }

  test("q68: transitions reconcile — total pairs and row-stochastic bp") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    val rows = Relational5.q68TransitionMatrix.run(spark, sf0001).collect()
    // every event except each user's first contributes exactly one pair
    assert(rows.map(_.getAs[Long]("n")).sum === total - users)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val rowTotal = rs.map(_.getAs[Long]("n")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("p_bp") ===
          r.getAs[Long]("n") * 10000 / rowTotal)
      }
      // truncation: row sums to at most 10000 bp
      assert(rs.map(_.getAs[Long]("p_bp")).sum <= 10000L)
    }
  }

  test("q69: WAU bounds DAU and matches a driver-side window recompute") {
    import org.apache.spark.sql.functions._
    val rows = Relational5.q69ActiveUsers.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ud = Q.t(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[Long]("user_id")))
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val expectWau = ud.filter { case (ud2, _) =>
        !ud2.isAfter(d) && ud2.isAfter(d.minusDays(7)) }.map(_._2).distinct.length
      val expectDau = ud.count(_._1 == d)
      assert(r.getAs[Long]("dau") === expectDau.toLong)
      assert(r.getAs[Long]("wau") === expectWau.toLong)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      assert(r.getAs[Long]("stickiness_bp") ===
        r.getAs[Long]("dau") * 10000 / r.getAs[Long]("wau"))
    }
  }

  test("q70: aggregate rewrite equals a literal sole-late recompute") {
    import org.apache.spark.sql.functions._
    val li = Q.t(spark, sf0001, "lineitem")
      .join(Q.t(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 90).as("late"))
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"),
        r.getAs[Boolean]("late")))
    // literal Q21 semantics, computed naively per order
    val byOrder = li.groupBy(_._1)
    val soleLate = byOrder.values.flatMap { rows =>
      val supps = rows.map(_._2).distinct
      val late = rows.filter(_._3).map(_._2).distinct
      if (supps.length >= 2 && late.length == 1) late else Nil
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val names = Q.t(spark, sf0001, "supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val expect = soleLate.toSeq
      .map { case (sk, n) => (names(sk), n) }
      .sortBy { case (nm, n) => (-n, nm) }.take(20)
    val got = Relational5.q70SoleLateSupplier.run(spark, sf0001).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toSeq
    assert(got === expect)
  }

  test("d74: the distributed grid walk equals a sequential recompute") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
      .sortBy(_._1)
    val total = docs.map(_._2).sum
    val step = total / 25
    var cum = 0L
    val expect = docs.flatMap { case (id, w) =>
      val before = cum; cum += w
      if (before / step < cum / step) Some(id) else None
    }.toList
    val got = Corpus3.d74WeightedSystematic.run(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toList
    assert(got === expect)
    // PPS property: every doc at least `step` wide is always selected
    docs.filter(_._2 >= step).foreach { case (id, _) =>
      assert(got.contains(id))
    }
  }

  test("d73: per-language OOV counts reconcile with the corpus totals") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    import org.apache.spark.sql.functions._
    val totalOcc = docs.select(explode(split(col("text"), " "))).count()
    val rows = Corpus3.d73VocabCoverage.run(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_occurrences")).sum === totalOcc)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_occurrences"))
      assert(r.getAs[Long]("oov_bp") ===
        r.getAs[Long]("n_oov") * 10000 / r.getAs[Long]("n_occurrences"))
    }
  }
}
