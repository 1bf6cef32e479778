package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the corpus-curation wave: d76 cross-source overlap matrix,
  * d77 length-bucketed batch layout.
  */
class Corpus4Spec extends SparkSpec {
  import spark.implicits._

  test("d76: planted mirror source lights up, disjoint pair stays dark") {
    // srcA and srcB share their one (identical) document; srcC is disjoint
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "srcA"),
      (2L, "alpha beta gamma delta epsilon", "srcB"),
      (3L, "zeta eta theta iota kappa", "srcC"))
      .toDF("doc_id", "text", "source")
    val sh = Dedup.shinglePostings(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("hs"))
    val rows = Corpus4.sourceOverlap(sh, docs).collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("jaccard_bp")).toMap
    assert(m(("srcA", "srcB")) === 10000L) // identical shingle sets
    assert(!m.contains(("srcA", "srcC")))  // zero intersection → no row
    assert(!m.contains(("srcB", "srcC")))
  }

  test("d76: sf0.001 invariants — bounds, ordering, intersection sanity") {
    val rows = Corpus4.d76SourceOverlap.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val inter = r.getAs[Long]("intersection")
      assert(inter >= 1)
      assert(inter <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val bp = r.getAs[Long]("jaccard_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("d77: planted lengths — batch fill order, sizes, and exact waste") {
    // 17 docs of 20 tokens (bucket 1) → batches of 8,8,1; one 5-token doc
    // in bucket 0. Lengths vary inside bucket 1 to pin the waste math.
    val sized = ((1L to 17L).map(i => (i, if (i <= 9) 31L else 20L)) :+
      (99L, 5L)).toDF("doc_id", "n_tokens")
    val rows = Corpus4.lengthBatches(sized).collect()
    val b1 = rows.filter(_.getAs[Long]("bucket") == 1L)
      .sortBy(_.getAs[Long]("batch_id"))
    assert(b1.map(_.getAs[Long]("n_docs")).toSeq === Seq(8L, 8L, 1L))
    // batch 0: eight 31-token docs → no waste
    assert(b1(0).getAs[Long]("max_tokens") === 31L)
    assert(b1(0).getAs[Long]("pad_waste") === 0L)
    // batch 1: one 31-token doc + seven 20-token docs → waste 7·11
    assert(b1(1).getAs[Long]("max_tokens") === 31L)
    assert(b1(1).getAs[Long]("pad_waste") === 77L)
    assert(b1(1).getAs[Long]("waste_bp") === 77L * 10000 / (8 * 31))
    // batch 2: the leftover single doc pads nothing
    assert(b1(2).getAs[Long]("pad_waste") === 0L)
    val b0 = rows.filter(_.getAs[Long]("bucket") == 0L)
    assert(b0.length === 1 && b0.head.getAs[Long]("n_docs") === 1L)
  }

  test("d78: census reconciles with an independent contamination check") {
    val rows = Corpus4.d78EvalDecontam.run(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("split")).toSet === Set("val", "test"))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def split(id: Long): String = {
      val h = (id % 1000000007L) * 2654435761L % 100
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val trainG = docs.filter(d => split(d._1) == "train")
      .flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(d => split(d._1) != "train")
      .groupBy(d => split(d._1)).view.mapValues { ds =>
        (ds.length.toLong,
          ds.count(d => grams(d._2).exists(trainG.contains)).toLong)
      }.toMap
    rows.foreach { r =>
      val (n, c) = expected(r.getAs[String]("split"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("n_contaminated") === c)
      assert(r.getAs[Long]("n_clean") === n - c)
      assert(r.getAs[Long]("contamination_bp") === c * 10000 / n)
    }
  }

  test("d79: boundaries re-align after a prefix edit (the CDC property)") {
    // one long deterministic pseudo-text; the same text with 5 tokens
    // prepended must reproduce the original chunking after the first
    // boundary (fixed-stride chunking shifts EVERY chunk instead)
    val words = (0 until 400).map(i => s"w${(i * 2654435761L) % 97}")
    val base = words.mkString(" ")
    val shifted = ((0 until 5).map(i => s"x$i") ++ words).mkString(" ")
    val out = Corpus4.cdcChunks(
      Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")).collect()
    def md5s(id: Long) = out.filter(_.getLong(0) == id)
      .sortBy(_.getAs[Long]("chunk_id")).map(_.getAs[String]("chunk_md5"))
    val (a, b) = (md5s(1L), md5s(2L))
    assert(a.length > 5, "need several chunks for the property to bite")
    // all but the first chunk of the original reappear verbatim
    assert(a.drop(1).forall(b.contains),
      "content-defined boundaries must survive a prefix insertion")
    // and a sanity check on sizes: chunks average near the 16-token target
    val sizes = out.filter(_.getLong(0) == 1L).map(_.getAs[Long]("n_tokens"))
    assert(sizes.sum === 400)
  }

  test("d79: chunks tile each document exactly") {
    val rows = Corpus4.d79CdcChunking.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nTok = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Long]("n_tokens")).sum === nTok(id))
      val ids = rs.map(_.getAs[Long]("chunk_id")).sorted
      assert(ids.toSeq === (0L until ids.length).toSeq)
    }
  }

  test("d82: layout tiles the token stream; census reconciles with d50") {
    val rows = Corpus4.d82PackedLayout.run(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // reconstruct the greedy stream: each doc starts where the previous
    // ended, bins/offsets/crossing follow from the running total
    var cum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("bin") === cum / 2048)
      assert(r.getAs[Long]("start_off") === cum % 2048)
      assert(r.getAs[Boolean]("crosses") ===
        (cum % 2048 + r.getAs[Long]("n_toks") > 2048))
      cum += r.getAs[Long]("n_toks")
    }
    // segment indices are 0..k-1 within each bin in doc order
    rows.groupBy(_.getAs[Long]("bin")).foreach { case (_, rs) =>
      assert(rs.sortBy(_.getLong(0)).map(_.getAs[Int]("seg_idx")).toSeq ===
        rs.indices.toSeq)
    }
  }

  test("d87: PRF identities hold and totals reconcile") {
    val rows = Corpus4.d87LangIdEval.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // Σ(tp+fn) over classes = every labeled doc exactly once
    assert(rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum
      === nDocs)
    // Σ(tp+fp) = every prediction exactly once
    assert(rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp")).sum
      === nDocs)
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"))
      if (tp + fp > 0)
        assert(r.getAs[Long]("precision_bp") === tp * 10000 / (tp + fp))
      else assert(r.isNullAt(r.fieldIndex("precision_bp")))
      if (tp + fn > 0)
        assert(r.getAs[Long]("recall_bp") === tp * 10000 / (tp + fn))
      assert(r.getAs[Long]("f1_bp") === 2 * tp * 10000 / (2 * tp + fp + fn))
    }
    // the blind spot is exposed: zh exists as a class with zero tp
    val zh = rows.find(_.getAs[String]("lang") == "zh")
    assert(zh.exists(_.getAs[Long]("tp") === 0L))
  }

  test("d86: anonymity classes partition all documents and groups") {
    val rows = Corpus4.d86KAnonymity.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val groups = docs.groupBy(col("lang"), col("source"),
      expr("n_chars div 50")).count().collect().map(_.getLong(3))
    assert(rows.map(_.getAs[Long]("n_groups")).sum === groups.length.toLong)
    val uniques = rows.find(_.getAs[String]("anonymity_class") == "1:unique")
    assert(uniques.map(_.getAs[Long]("n_groups")).getOrElse(0L) ===
      groups.count(_ == 1L).toLong)
  }

  test("d85: PSI contributions match closed-form smoothing math") {
    val rows = Corpus4.d85PsiDrift.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n1 = rows.map(_.getAs[Long]("n_train")).sum
    val n2 = rows.map(_.getAs[Long]("n_val")).sum
    val b = rows.length
    var psi = 0.0
    rows.foreach { r =>
      val (c1, c2) = (r.getAs[Long]("n_train"), r.getAs[Long]("n_val"))
      val p = (c1 + 1).toDouble / (n1 + b)
      val q = (c2 + 1).toDouble / (n2 + b)
      val expected = (p - q) * math.log(p / q)
      assert(math.abs(r.getAs[Double]("psi_contrib") - expected) < 2e-6)
      psi += expected
    }
    // an 80/10 hash split of iid lengths must NOT drift materially
    assert(psi < 0.25, s"hash split shows length drift: PSI=$psi")
  }

  test("d84: the S-curve planner matches closed-form math") {
    val rows = Corpus4.d84LshPlanner.run(spark, sf0001).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val rr = r.getAs[Int]("rows_per_band")
      val b = r.getAs[Long]("bands").toInt
      assert(b === 128 / rr)
      def close(a: Double, x: Double) = math.abs(a - x) < 2e-6
      assert(close(r.getAs[Double]("threshold"),
        math.pow(1.0 / b, 1.0 / rr)))
      assert(close(r.getAs[Double]("p_catch_j80"),
        1.0 - math.pow(1.0 - math.pow(0.8, rr), b)))
      assert(close(r.getAs[Double]("p_fp_j30"),
        1.0 - math.pow(1.0 - math.pow(0.3, rr), b)))
    }
    // the trade-off is real: more rows per band → higher threshold,
    // lower false-positive rate
    val sorted = rows.sortBy(_.getAs[Int]("rows_per_band"))
    val th = sorted.map(_.getAs[Double]("threshold")).toSeq
    assert(th === th.sorted)
    val fp = sorted.map(_.getAs[Double]("p_fp_j30")).toSeq
    assert(fp === fp.sorted.reverse)
  }

  test("d83: adding a shard moves docs ONLY onto the new shard") {
    // rendezvous hashing's defining property: growing 32→33 shards, a
    // doc either keeps its shard or moves to shard 32 — never between
    // old shards (mod-hashing would reshuffle ~31/32 of the corpus)
    val ids = (0L until 2000L).toDF("doc_id")
    val before = Corpus4.hrwAssign(ids, 32).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    val after = Corpus4.hrwAssign(ids, 33).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    var moved = 0
    before.foreach { case (id, s0) =>
      val s1 = after(id)
      if (s1 != s0) { assert(s1 === 32L, s"doc $id moved $s0->$s1"); moved += 1 }
    }
    // expected movement ≈ 1/33 of docs; allow a generous band
    assert(moved > 0 && moved < 2000 / 8, s"moved=$moved")
  }

  test("d83: loads stay within a sane band of the uniform expectation") {
    val rows = Corpus4.d83RendezvousShards.run(spark, sf0001).collect()
    assert(rows.length === 32)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === rows.head.getAs[Long]("n_docs"))
    rows.foreach { r =>
      val bp = r.getAs[Long]("load_vs_mean_bp")
      assert(bp > 2000 && bp < 30000, s"shard load out of band: $bp bp")
    }
  }

  test("d77: every doc lands in exactly one batch; waste reconciles") {
    val out = Corpus4.d77LengthBatching.run(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(totalDocs === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 8)
      assert(r.getAs[Long]("pad_waste") ===
        r.getAs[Long]("n_docs") * r.getAs[Long]("max_tokens") -
          r.getAs[Long]("sum_tokens"))
      // bucket invariant: max token count sits inside the bucket's range
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("max_tokens") / 16 === b)
    }
  }
}
