package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavior pins for the round-6 third-continuation wave: BM25 retrieval
  * (e80), temperature-scaled source mixing (d88), and RFM segmentation
  * (q94).
  */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  test("bm25: tf raises score, length normalization breaks tf ties") {
    // doc 1 mentions the term three times; doc 2 once; doc 3 not at all.
    // docs 4/5 tie on tf but 5 is shorter — BM25 must prefer 5.
    val docs = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad"),
      (4L, "hash pad pad pad pad pad pad pad"),
      (5L, "hash pad")).toDF("doc_id", "text")
    val got = Similarity6.bm25TopK(docs, Seq(1 -> "spark", 2 -> "hash"), 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    val q1 = got.filter(_._1 == 1).sortBy(_._3).map(_._2)
    assert(q1.toSeq === Seq(1L, 2L)) // tf dominance; doc 3 never scored
    val q2 = got.filter(_._1 == 2).sortBy(_._3).map(_._2)
    assert(q2.toSeq === Seq(5L, 4L)) // shorter doc wins the tf tie
  }

  test("bm25: rarer term contributes more (idf ordering)") {
    // "rare" appears in 1 of 4 docs, "common" in all 4; equal tf and dl
    // in the probe docs, so the idf factor alone must separate them.
    val docs = Seq(
      (1L, "rare common x"),
      (2L, "common y z"),
      (3L, "common y z"),
      (4L, "common y z")).toDF("doc_id", "text")
    val scores = Similarity6.bm25TopK(docs,
        Seq(1 -> "rare", 2 -> "common"), 1)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(scores(1) > scores(2))
  }

  test("temperature mix: T=2 flattens toward uniform, budget conserved") {
    val docs = Seq(
      (0 until 100).map(i => ("big", s"doc $i tok tok")),
      Seq(("small", "one doc here")))
      .flatten.toDF("source", "text")
    val rows = Corpus5.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (big, small) = (rows("big"), rows("small"))
    // natural: 400 vs 3 tokens; flat: sqrt -> 20 vs ~1.73 — the small
    // source's share must strictly rise and the big source's fall
    assert(small.getAs[Long]("flat_bp") > small.getAs[Long]("natural_bp"))
    assert(big.getAs[Long]("flat_bp") < big.getAs[Long]("natural_bp"))
    // the 1M-token budget is conserved up to div truncation
    val alloc = rows.values.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= 1000000L && alloc > 1000000L - rows.size)
    // flattening oversamples the small source strictly more than the big
    assert(small.getAs[Long]("epochs_bp") > big.getAs[Long]("epochs_bp"))
  }

  test("subspace rebalance: snake never balances worse than natural") {
    val rows = graft.SparkEntry.queries("e81_subspace_rebalance")(
      spark, sf0001).collect()
    def imbalance(scheme: String): Double = {
      val vs = rows.filter(_.getAs[String]("scheme") == scheme)
        .map(_.getAs[Double]("var_sum"))
      assert(vs.length === 8)
      vs.max / vs.min
    }
    assert(imbalance("snake") <= imbalance("natural"))
    assert(rows.forall(_.getAs[Long]("n_dims") === 8L))
  }

  test("shipment span: priority rollup is complete and bounded") {
    val rows = graft.SparkEntry.queries("q95_shipment_span")(spark, sf0001)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      // the generator ships some items before the order date, so the
      // first-ship lag may be negative — but never below the -5000 shift
      val lag = r.getAs[Long]("avg_first_ship_days")
      assert(lag > -5000L && lag < 5000L)
      assert(r.getAs[Long]("avg_span_days") >= 0L)
      val bp = r.getAs[Long]("multi_ship_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("dwell matrix: non-negative dwell, mean bounded by max") {
    val rows = graft.SparkEntry.queries("q96_dwell_matrix")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L)
      assert(r.getAs[Long]("avg_dwell_us") >= 0L)
      assert(r.getAs[Long]("max_dwell_us") >= r.getAs[Long]("avg_dwell_us"))
    }
  }

  test("tokenizer fertility: char fallback only ever adds tokens") {
    val rows = graft.SparkEntry.queries("d90_tokenizer_fertility")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every in-vocab hit costs 1 <= token length, every OOV costs its
      // chars: the bill sits between word count and char count
      assert(r.getAs[Long]("fertility_bp") >= 10000L)
      assert(r.getAs[Long]("compression_bp") <= 10000L)
      assert(r.getAs[Long]("effective_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Long]("effective_tokens") <= r.getAs[Long]("word_chars"))
    }
  }

  test("ndcg: bounded by the ideal, idcg is the fixed profile price") {
    val rows = graft.SparkEntry.queries("e82_ndcg_eval")(spark, sf0001)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val bp = r.getAs[Long]("ndcg_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(r.getAs[Long]("idcg_micro") === 9622950L)
      assert(r.getAs[Long]("dcg_micro") <= r.getAs[Long]("idcg_micro"))
    }
  }

  test("gini: zero for equal revenues, rises with planted concentration") {
    // bounds check via the query at sf0.001: 0 <= G < 1, top-decile
    // share between its uniform floor and 100%
    val rows = graft.SparkEntry.queries("q97_revenue_gini")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0)
      val share = r.getAs[Long]("top10_share_bp")
      // top decile can never hold less than a uniform share of revenue
      assert(share * r.getAs[Long]("n_customers") >=
        1000L * (r.getAs[Long]("n_customers") / 10))
      assert(share <= 10000L)
    }
  }

  test("survivorship: per-source docs reconcile, losses match survivors") {
    val rows = graft.SparkEntry.queries("d91_dedup_survivorship")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    var totalDocs = 0L; var totalSurv = 0L
    rows.foreach { r =>
      val (n, sv, lw, lo) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("survivors"), r.getAs[Long]("lost_within_source"),
        r.getAs[Long]("lost_to_other_source"))
      assert(sv + lw + lo === n) // every doc is exactly one of the three
      totalDocs += n; totalSurv += sv
    }
    // survivors = number of distinct head keys, < total iff dups exist
    assert(totalSurv <= totalDocs)
  }

  test("heldout perplexity: positive nll, oov priced at the uniform floor") {
    val rows = graft.SparkEntry.queries("d92_heldout_perplexity")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0L)
      // add-1 smoothing bounds every -ln p by ln(c1+V) <= ln(train size+V):
      // nll is positive and finite
      assert(r.getAs[Long]("avg_nll_micro") > 0L)
      val bp = r.getAs[Long]("unseen_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("skyline: frontier is mutually non-dominated and covers everyone") {
    val frontier = graft.SparkEntry.queries("q98_skyline")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("recency_days"),
        r.getAs[Long]("monetary_cents")))
    assert(frontier.nonEmpty)
    // mutual non-domination inside the frontier
    for (a <- frontier; b <- frontier if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 &&
        (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates fellow frontier member $b")
    // every customer is dominated-or-equal by some frontier member
    val all = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last"),
        (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("mon"))
      .select(datediff(lit("2001-09-01").cast("timestamp"), col("last"))
        .as("rec"), col("mon"))
      .collect().map(r => (r.getAs[Int]("rec"), r.getAs[Long]("mon")))
    all.foreach { c =>
      assert(frontier.exists(f => f._1 <= c._1 && f._2 >= c._2),
        s"customer $c escapes the frontier")
    }
  }

  test("prf expansion: feedback terms retrieve docs the query missed") {
    // q1 = "alpha": docs 1-3 match and are saturated with "beta"; doc 4
    // has beta but NO alpha, so stage 1 cannot score it. Expansion must
    // mine "beta" (feedback tf 9 beats any singleton's idf edge) and
    // pull doc 4 into the final list.
    val docs = Seq(
      (1L, "alpha beta beta beta"), (2L, "alpha beta beta beta"),
      (3L, "alpha beta beta beta"),
      (4L, "beta gamma w"), (5L, "gamma delta v"))
      .toDF("doc_id", "text")
    val out = Similarity6.prfTopK(docs, Seq(1 -> "alpha"),
      fbDocs = 3, expTerms = 1, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(4L), "expanded query must reach the beta-only doc")
    assert(!out.contains(5L), "doc without query or expansion terms stays out")
  }

  test("cusum: three ranked candidates with sign-consistent verdicts") {
    val rows = graft.SparkEntry.queries("q99_cusum_changepoint")(
      spark, sf0001).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    var last = Long.MaxValue
    rows.foreach { r =>
      val c = r.getAs[Long]("cusum_n")
      assert(math.abs(c) <= last); last = math.abs(c)
      assert(r.getAs[String]("verdict") ===
        (if (c > 0) "level_drop_after" else "level_rise_after"))
    }
  }

  test("stats histogram: 32 near-equal buckets, monotone bounds, ndv sane") {
    val rows = graft.SparkEntry.queries("q100_stats_histogram")(
      spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq === (0L to 31L))
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1L) // equi-depth quota
    rows.foreach { r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("ndv") >= 1L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
    }
    val total = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(sizes.sum === total)
  }

  test("feature hash: norms reconcile with their chunk's components") {
    val rows = graft.SparkEntry.queries("d93_feature_hash_embed")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach {
      case (_, chunk) =>
        val n2 = chunk.head.getAs[Long]("norm2")
        assert(chunk.map(r => { val v = r.getAs[Long]("v"); v * v }).sum
          === n2)
        chunk.foreach { r =>
          val dim = r.getAs[Long]("dim")
          assert(dim >= 0L && dim <= 15L)
        }
    }
  }

  test("expectations: the clean driver tables pass every contract") {
    val rows = graft.SparkEntry.queries("q101_expectations")(spark, sf0001)
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[String]("status") === "pass",
        s"${r.getAs[String]("test")} unexpectedly failed")
      assert(r.getAs[Long]("n_violations") === 0L)
      assert(r.getAs[Long]("n_checked") > 0L)
    }
  }

  test("hashed search: scores rank descending within each query") {
    val rows = graft.SparkEntry.queries("e84_hashed_chunk_search")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("qid")).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ===
        (1 to byRank.length))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("score") >= b.getAs[Long]("score"))
        case _ =>
      }
    }
  }

  test("contrastive pairs: labels partition correctly, negatives genuine") {
    val rows = graft.SparkEntry.queries("d94_contrastive_pairs")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val (pos, neg) = rows.partition(_._3 == 1)
    assert(pos.nonEmpty)
    pos.foreach { case (a, p, _) => assert(a < p) }
    neg.foreach { case (a, p, _) => assert(a != p) }
    // a negative is only mined for anchors that have a positive
    assert(neg.map(_._1).toSet.subsetOf(pos.map(_._1).toSet))
    // and never collides with that anchor's positive partner set
    val posSet = pos.map(t => (t._1, t._2)).toSet
    neg.foreach { case (a, p, _) => assert(!posSet.contains((a, p))) }
  }

  test("spearman: rho bounded, strongly positive for freq-vs-spend") {
    val rows = graft.SparkEntry.queries("q102_spearman")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val rhos = rows.map(_.getAs[Double]("spearman_rho"))
    rhos.foreach(rho => assert(rho >= -1.0 && rho <= 1.0))
    // more orders mechanically means more lifetime spend — individual
    // tiny nations at sf0.001 are noisy, but the average must be
    // clearly positive
    assert(rhos.sum / rhos.length > 0.3)
  }

  test("canary: every planted marker recovers, none corrupt, ~2% planted") {
    val rows = graft.SparkEntry.queries("d95_canary_roundtrip")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    var planted = 0L; var docs = 0L
    rows.foreach { r =>
      assert(r.getAs[String]("verdict") === "recovered")
      assert(r.getAs[Long]("n_detected") === r.getAs[Long]("n_planted"))
      assert(r.getAs[Long]("n_corrupted") === 0L)
      planted += r.getAs[Long]("n_planted"); docs += r.getAs[Long]("n_docs")
    }
    assert(planted > 0L && planted < docs / 10)
  }

  test("rfm: census covers every customer once, quartiles near-equal") {
    val census = graft.SparkEntry.queries("q94_rfm_segments")(spark, sf0001)
      .collect()
    val n = census.map(_.getAs[Long]("n_customers")).sum
    val nCust = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey")).distinct().count()
    assert(n === nCust)
    // segment grammar + per-dimension quota: each quartile holds
    // floor/ceil(n/4) customers
    val seg = "r([1-4])f([1-4])m([1-4])".r
    for (dim <- 0 to 2) {
      val byBucket = census.groupBy { r =>
        r.getAs[String]("segment") match {
          case seg(a, b, c) => Seq(a, b, c)(dim)
        }
      }.view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
      assert(byBucket.keySet === Set("1", "2", "3", "4"))
      assert(byBucket.values.max - byBucket.values.min <= 1)
    }
    // labels agree with their segment digits
    census.foreach { r =>
      (r.getAs[String]("segment"), r.getAs[String]("label")) match {
        case (seg("1", "1", "1"), l) => assert(l === "champion")
        case (seg("4", "4", _), l)   => assert(l === "lost")
        case (seg(a, _, "1"), l) if a >= "3" => assert(l === "at_risk_whale")
        case (seg("1", _, _), l)     => assert(l === "recent")
        case (_, l)                  => assert(l === "regular")
      }
    }
  }
}
