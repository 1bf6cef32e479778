package graft.ops

import graft.SparkSpec
import graft.expr.GraftFunctions
import org.apache.spark.sql.DataFrame

/** Planted-corpus invariants for the round-4 curation operators (d52-d55,
  * e57-e58): hand-computable inputs whose expected outputs follow from the
  * operator definitions, independent of the driver corpus.
  */
class CorpusSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("d52: entropy is 0 for a constant doc and log2(n) for all-distinct") {
    val out = Corpus.entropyStats(docs(
      1L -> "a a a a",            // one type, 4 tokens → H = 0
      2L -> "a b c d e f g h"))   // 8 distinct → H = 3 bits
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("ttr"),
          r.getAs[Double]("entropy_bits"))).toMap
    assert(out(1L) === ((4L, 0.25, 0.0)))
    assert(out(2L) === ((8L, 1.0, 3.0)))
  }

  test("d53: a doc fully inside a bigger doc scores containment 1.0") {
    val d = docs(
      1L -> "one two three four five",                 // 3 shingles
      2L -> "zero one two three four five six seven",  // superset: 6 shingles
      3L -> "entirely unrelated words here")
    val sh = Dedup.hashedShingles(d)
    val rows = Corpus.containmentPairs(sh, 0.8).collect()
    sh.unpersist()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("d1") === 1L && r.getAs[Long]("d2") === 2L)
    assert(r.getAs[Double]("containment") === 1.0)
    assert(r.getAs[Long]("contained_doc") === 1L) // the smaller side
  }

  test("d54: common-token docs score a higher mean logprob than rare-token docs") {
    // corpus: "a" appears 9x, each rare token once → 12 total
    val out = Corpus.unigramScores(docs(
      1L -> "a a a a a a a a a", // all common: lp = ln(9/12)
      2L -> "x y z"))           // all rare:   lp = ln(1/12)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_logprob")).toMap
    assert(math.abs(out(1L) - math.log(9.0 / 12)) < 1e-6)
    assert(math.abs(out(2L) - math.log(1.0 / 12)) < 1e-6)
    assert(out(1L) > out(2L))
  }

  test("d55: corpus dup beats batch dup beats kept, in doc_id order") {
    val corpus = docs(0L -> "seen before", 2L -> "other corpus text")
    val batch = docs(
      1L -> "seen before",   // in corpus → dup_of_corpus
      3L -> "fresh text",    // first of its fp → kept
      5L -> "fresh text",    // later same fp  → dup_in_batch
      7L -> "only once")     // unique         → kept
    val out = Corpus.incrementalDedup(corpus, batch)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("verdict")).toMap
    assert(out === Map(1L -> "dup_of_corpus", 3L -> "kept",
      5L -> "dup_in_batch", 7L -> "kept"))
  }

  test("e57: codebook vectors encode to themselves with zero error") {
    val rows = Similarity2.pqCodes(
        Q.t(spark, sf0001, "embeddings"))
      .collect()
    assert(rows.length === 500)
    rows.filter(_.getAs[Long]("vec_id") < 16).foreach { r =>
      val id = r.getAs[Long]("vec_id").toInt
      (0 until 8).foreach(m => assert(r.getAs[Int](s"code$m") === id,
        s"codebook vec $id did not self-code in subspace $m"))
      assert(r.getAs[Double]("mse") === 0.0)
    }
    // every code in range, every mse a non-negative exact multiple of 2^-24
    rows.foreach { r =>
      (0 until 8).foreach { m =>
        val c = r.getAs[Int](s"code$m"); assert(c >= 0 && c < 16)
      }
      val mse = r.getAs[Double]("mse")
      assert(mse >= 0.0 && (mse * 64 * 512 * 512) == math.rint(mse * 64 * 512 * 512))
    }
  }

  test("d63: cross-doc repeated blocks drop, unique blocks survive") {
    val common = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = Seq(
      (1L, "s1", s"$common a1 a2 a3"),          // identical to doc 2
      (2L, "s1", s"$common a1 a2 a3"),          // → both blocks df=2, all drop
      (3L, "s2", s"$common x1 x2 x3 x4 x5 x6 x7 x8"), // shares only block 0
      (4L, "s3", "c1 c2 c3 c4 c5 c6 c7 c8 c9")  // fully unique
    ).toDF("doc_id", "source", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val out = Corpus2.blockDedup(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_tokens_kept"), r.getAs[String]("clean_md5"))).toMap
    assert(out(1L) === ((2L, 2L, 0L, md5hex(""))))
    assert(out(2L) === ((2L, 2L, 0L, md5hex(""))))
    assert(out(3L) === ((2L, 1L, 8L, md5hex("x1 x2 x3 x4 x5 x6 x7 x8"))))
    assert(out(4L) === ((2L, 0L, 9L, md5hex("c1 c2 c3 c4 c5 c6 c7 c8 c9"))))
  }

  test("d64: first-seen attribution goes to the lowest doc_id's source") {
    val common = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = Seq(
      (1L, "s1", s"$common a1 a2 a3"),
      (2L, "s1", s"$common a1 a2 a3"),
      (3L, "s2", s"$common x1 x2 x3 x4 x5 x6 x7 x8"),
      (4L, "s3", "c1 c2 c3 c4 c5 c6 c7 c8 c9")
    ).toDF("doc_id", "source", "text")
    // 5 distinct blocks: common+"a1 a2 a3" first in doc1 (s1), the x-block
    // first in doc3 (s2), doc4's two blocks (s3)
    val blocks = Corpus2.blockRows(d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    import org.apache.spark.sql.functions.{col, min_by, count, lit}
    val first = blocks.groupBy(col("block"))
      .agg(min_by(col("source"), col("doc_id")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("n")).toMap
    blocks.unpersist()
    assert(first === Map("s1" -> 2L, "s2" -> 1L, "s3" -> 2L))
  }

  test("d65: one-token edits match with exact distance; two-token rewrites don't") {
    val d = docs(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delt",   // one char dropped inside one token
      3L -> "alpha beta gamma delta",  // identical title → collapses into 1
      4L -> "alpha XXXX gamma YYYY")   // two tokens rewritten — outside the
                                       // deletion-neighborhood envelope
    val out = Corpus2.fuzzyMatches(d).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        ((r.getAs[Int]("dist"), r.getAs[Long]("n1"), r.getAs[Long]("n2"))))
      .toMap
    // the identical pair (1,3) is exact-dedup's (d40) output, not d65's;
    // its multiplicity surfaces as n1 = 2 on the representative's matches
    assert(out === Map((1L, 2L) -> ((1, 2L, 1L))))
  }

  test("d65: 1k byte-identical titles cost one representative, not N²/2 pairs") {
    val mirrored = (1L to 1000L).map(_ -> "alpha beta gamma delta")
    val d = docs(mirrored :+ (2000L -> "alpha beta gamma delt"): _*)
    val out = Corpus2.fuzzyMatches(d).collect()
    // N²/2 would be 499_500 exact pairs; the guard collapses the mirror
    // group before blocking, so the only emitted row is the near-match
    // against the representative, carrying the group's multiplicity
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("dist"),
      r.getAs[Long]("n1"), r.getAs[Long]("n2")) === ((1L, 2000L, 1, 1000L, 1L)))
  }

  test("d66: two-phase shard rank equals the global selection through a tie") {
    // 8 docs → quota 2. The three byte-identical en docs share one exact
    // score (the target slice, so they rank top) and the quota cuts
    // through that tie group — the doc_id tie-break is load-bearing.
    val d = Seq(
      (10L, "en", "alpha beta alpha"), (7L, "en", "alpha beta alpha"),
      (3L, "en", "alpha beta alpha"), (4L, "fr", "zeta eta theta"),
      (5L, "fr", "zeta eta theta"), (6L, "fr", "iota kappa"),
      (8L, "de", "mu nu xi"), (9L, "de", "omicron pi"))
      .toDF("doc_id", "lang", "text")
    val rows = Corpus2.dsirSelect(d).collect()
    assert(rows.length === 8)
    val quota = 8 / Corpus2.SelectDenom
    assert(rows.map(_.getAs[Int]("selected")).sum === quota)
    // the distributed two-phase rank must equal a plain local sort
    val globalOrder = rows
      .sortBy(r => (-r.getAs[Double]("dsir_score"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id"))
    val selected = rows.filter(_.getAs[Int]("selected") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(selected === globalOrder.take(quota).toSet)
    // the en docs do tie exactly, and the cut lands inside the tie group:
    // doc 3 and 7 in, doc 10 out
    val scores = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_score")).toMap
    assert(scores(3L) === scores(7L) && scores(7L) === scores(10L))
    assert(selected === Set(3L, 7L))
  }

  test("d66 plan: the only unpartitioned window ranks shard totals, not docs") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val (res, inter) = Corpus2.dsirSelectPlan(
      Seq((1L, "en", "a b"), (2L, "fr", "c d")).toDF("doc_id", "lang", "text"))
    try {
      val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty)
      val global = wins.filter(_.partitionSpec.isEmpty)
      assert(global.nonEmpty) // the shard-prefix window is deliberately global
      global.foreach { w =>
        // …but only over one-row-per-shard aggregates: anything else is
        // the single-task O(docs) sort this operator must never contain
        val overShardTotals = w.child.collect {
          case a: Aggregate if a.groupingExpressions
            .exists(_.references.exists(_.name == "shard")) => a
        }
        assert(overShardTotals.nonEmpty,
          s"unpartitioned window over doc-level rows:\n$w")
      }
    } finally inter.foreach(_.unpersist())
  }

  test("d67: exact ceil quotas per stratum, two-phase rank = global sort") {
    // strata of size 5, 4, 1: quotas ⌈5/4⌉=2, ⌈4/4⌉=1, ⌈1/4⌉=1
    val d = ((1L to 5L).map(i => (i, "a")) ++ (6L to 9L).map(i => (i, "b")) ++
      Seq((10L, "c"))).toDF("doc_id", "source")
    val rows = Corpus2.stratifiedSample(d).collect()
    assert(rows.length === 10)
    val picked = rows.filter(_.getAs[Int]("selected") == 1)
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(picked === Map("a" -> 2, "b" -> 1, "c" -> 1))
    // the distributed two-phase rank must equal a per-stratum local sort
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val quota = (rs.length + 3) / 4
      val expect = rs.sortBy(r => (r.getAs[Long]("skey"),
        r.getAs[Long]("doc_id"))).take(quota)
        .map(_.getAs[Long]("doc_id")).toSet
      val got = rs.filter(_.getAs[Int]("selected") == 1)
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got === expect)
    }
  }

  test("d67 plan: every window is partitioned — no global sort anywhere") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val (res, inter) = Corpus2.stratifiedSamplePlan(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "source"))
    try {
      val wins = res.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty)
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in the d67 plan:\n$w"))
    } finally inter.foreach(_.unpersist())
  }

  test("d68: keep-first semantic dedup inside clusters, blind across them") {
    // cluster 1: ids 5 and 9 are parallel vectors (cos = 1) → 9 drops,
    // 5 stays; id 7 is orthogonal → stays. cluster 2: id 6 duplicates
    // id 5's DIRECTION but sits in another cluster → must survive
    // (SemDeDup only compares within a cluster). All on exact grid points.
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val ortho = Array.tabulate(64)(i => if (i < 32) 0.5f else 0.5f)
    val rows = Seq(
      (5L, 1, base.toSeq), (9L, 1, base.map(_ * 0.5f).toSeq),
      (7L, 1, ortho.toSeq), (6L, 2, base.toSeq))
      .toDF("vec_id", "label", "embedding")
    val kept = Corpus2.semDedup(rows).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    assert(kept === Map(5L -> true, 9L -> false, 7L -> true, 6L -> true))
  }

  test("e59: sign-bit packing and Hamming ranking on planted sign patterns") {
    // query 0 alternates sign (+ at even dims); id 5 copies its signs with
    // different magnitudes, id 6 flips exactly dims {0, 32, 63}, id 7 flips
    // every sign — known distances 0, 3, 64 in that rank order
    def v(sign: Int => Boolean, scale: Float): Array[Float] =
      Array.tabulate(64)(i => if (sign(i)) scale else -scale)
    val even = (i: Int) => i % 2 == 0
    val emb = Seq(
      (0L, v(even, 1f)),
      (5L, v(even, 2.5f)),
      (6L, v(i => if (i == 0 || i == 32 || i == 63) !even(i) else even(i), 1f)),
      (7L, v(i => !even(i), 1f))
    ).toDF("vec_id", "embedding")
    // packing: an all-positive vector sets all 32 bits of each half
    val allPos = Similarity2.signWords(
        Seq((1L, Array.fill(64)(1f))).toDF("vec_id", "embedding"))
      .collect().head
    assert(allPos.getAs[Long]("w0") === 0xFFFFFFFFL)
    assert(allPos.getAs[Long]("w1") === 0xFFFFFFFFL)
    val out = Similarity2.hammingTopK(emb, k = 3)
      .collect().map(r => (r.getAs[Int]("rank"),
        r.getAs[Long]("cid"), r.getAs[Int]("hamming")))
    assert(out.toSeq === Seq((1, 5L, 0), (2, 6L, 3), (3, 7L, 64)))
  }

  test("e60: a codebook-trained twin reconstructs to approx_dist 0 at rank 1") {
    // query 0 is an exact copy of corpus vector 5; 5 is codebook-trained
    // (cid < 21), so its residual reconstructs EXACTLY and the ADC distance
    // to the twin is 0 — the self-coding invariant of residual PQ
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val twin = vec()
    val emb = (Seq((0L, twin), (5L, twin)) ++
      (6L to 80L).map(i => (i, vec()))).toDF("vec_id", "embedding")
    val out = IvfPq.ivfPqSearch(emb).collect()
    val q0 = out.filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Int]("rank"))
    assert(q0.head.getAs[Long]("cid") === 5L)
    assert(q0.head.getAs[Long]("approx_dist") === 0L)
    // distances are non-negative and non-decreasing in rank
    q0.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("approx_dist") <= b.getAs[Long]("approx_dist"))
    }
    assert(out.forall(_.getAs[Long]("approx_dist") >= 0L))
  }

  test("e60 plan: probe scan prunes non-probed lists at file level (DPP)") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_e60_spec").toString
    val pcols = (0 until 8).map(m => s"p$m")
    val codes = (0L until 40L)
      .map(i => (i + 100L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, i % 4))
      .toDF(("cid" +: pcols :+ "list_id"): _*)
    codes.write.mode("overwrite").partitionBy("list_id").parquet(dir)
    val schema = StructType(StructField("cid", LongType) +:
      (pcols.map(StructField(_, LongType)) :+ StructField("list_id", LongType)))
    val atRest = spark.read.schema(schema).parquet(dir)
    val arr = (1 to 64).map(_.toLong).toArray
    val cb16 = (0L until 16L).map(k => (k, arr)).toDF("k", "rcb")
    val coarse = (0L until 4L).map(l => (l, arr)).toDF("list_id", "cv")
    val queriesG = Seq((0L, arr), (1L, arr)).toDF("qid", "qv")
    val search = IvfPq.searchCodes(atRest, cb16, coarse, queriesG)
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe scan reads all lists — no DPP filter in:\n$plan")
    assert(search.collect().nonEmpty) // and the pruned search still runs
  }

  test("e58: recall@10 is 1.0 when the truncated prefix determines the vector") {
    GraftFunctions.register(spark)
    // 64-dim vectors whose FIRST dim already separates them: cosine ranking
    // by the 16-dim prefix equals the full ranking → perfect recall.
    // Query 0 plus 15 corpus vectors on distinct rays in the (d0,d1) plane,
    // zero elsewhere — both full and truncated cosines see the same angles.
    val emb = (0 until 16).map { i =>
      val angle = i * 0.09
      val v = Array.fill(64)(0f)
      v(0) = math.cos(angle).toFloat
      v(1) = math.sin(angle).toFloat
      // vec_id < 5 are queries in the e50 split; use 0 as the only query
      // whose neighbors we assert (ids 5..15 form the corpus)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity2.matryoshkaRecall(emb, truncDim = 16)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Double]("recall_at_10"), r.getAs[Boolean]("top1_match"))).toMap
    assert(out(0L) === ((1.0, true)))
  }

  test("d56: in-corpus-typical transitions outscore atypical ones") {
    // bigrams: "a b" ×3 and "a c" ×1 → P(b|a)=0.75, P(c|a)=0.25
    val out = Corpus.bigramScores(docs(
      1L -> "a b", 2L -> "a b", 3L -> "a b", 4L -> "a c"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_logprob")).toMap
    assert(math.abs(out(1L) - math.log(0.75)) < 1e-6)
    assert(math.abs(out(4L) - math.log(0.25)) < 1e-6)
    assert(out(1L) > out(4L))
  }

  test("q54: z-values interleave bits and preserve 2-D locality order") {
    // hand-checked Morton codes: (x=1,y=0)→1, (x=0,y=1)→2, (x=3,y=5)→39
    assert(morton(1, 0) === 1L)
    assert(morton(0, 1) === 2L)
    assert(morton(3, 5) === 39L)
    val rows = ScalePatterns.q54Zorder.run(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("zval") ===
        morton(r.getAs[Long]("x"), r.getAs[Long]("y")))
    }
    // output is the layout ordering itself
    assert(rows.map(_.getAs[Long]("zval")).toSeq ===
      rows.map(_.getAs[Long]("zval")).sorted.toSeq)
  }

  private def morton(x: Long, y: Long): Long =
    (0 until 16).map(j =>
      (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))).sum

  test("d59: sliding windows step by the stride and the tail runs short") {
    // 80 tokens, size 32, stride 24 → starts 0/24/48/72, sizes 32/32/32/8
    val text = (1 to 80).map("t" + _).mkString(" ")
    val out = Corpus.chunks(docs(1L -> text)).collect()
    assert(out.map(r => (r.getAs[Int]("chunk_id"), r.getAs[Long]("n_tokens")))
      .toSeq === Seq((0, 32L), (1, 32L), (2, 32L), (3, 8L)))
    // overlap: chunk 1 starts at token 25 (stride 24), not token 33
    val expected1 = (25 to 56).map("t" + _).mkString(" ")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected1.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getAs[String]("chunk_md5") === md5)
  }

  test("d62: the budget gate keeps hash-ordered docs until tokens run out") {
    val d = Seq(
      (1L, "en", "a b c"),       // 3 tokens
      (2L, "en", "d e f g"),     // 4 tokens
      (3L, "en", "h i"),         // 2 tokens
      (4L, "fr", "x y z w"))     // other partition
      .toDF("doc_id", "lang", "text")
    def h(id: Long) = ((id % 1000000007L) * 2654435761L + 29L) % 1000000007L
    val order = Seq(1L, 2L, 3L).sortBy(id => (h(id), id))
    val toks = Map(1L -> 3L, 2L -> 4L, 3L -> 2L)
    // budget admits exactly the first two docs in hash order
    val budget = toks(order(0)) + toks(order(1))
    val out = Corpus.tokenBudget(d, budget).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(out(order(0)) && out(order(1)) && !out(order(2)))
    assert(out(4L)) // fr's own budget is untouched by en's consumption
  }

  test("e58: driver-corpus audit stays well-formed (honest weak recall)") {
    GraftFunctions.register(spark)
    val rows = Similarity2.matryoshkaRecall(
      Q.t(spark, sf0001, "embeddings"), truncDim = 16).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      val k = r.getAs[Long]("n_topk")
      assert(k === 10L) // corpus ≥ 10 here, so the denominator caps at k
      assert(n >= 0 && n <= k)
      assert(r.getAs[Double]("recall_at_10") === n.toDouble / k)
    }
  }
}
