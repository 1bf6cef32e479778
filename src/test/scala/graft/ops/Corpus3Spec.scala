package graft.ops

import graft.SparkSpec

/** Pins for the round-6 corpus additions: d69 classifier-based quality
  * filtering, d70 BPE pair-count training step.
  */
class Corpus3Spec extends SparkSpec {
  import spark.implicits._

  /** The d69 lexicon weight, recomputed independently in Scala. */
  private def w(tok: String): Long =
    ((tok.head.toLong * 131 + tok.length * 37) * 2654435761L % 1000003L) % 101 - 50

  test("d69: occurrence-weighted scores match a hand computation") {
    val rows = Corpus3.d69ClassifierQuality.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Long]("score")
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("mean_score_x100") === {
        // Spark `div` is truncating integer division (toward zero)
        score * 100 / n
      })
      assert(r.getAs[String]("verdict") === (if (score > 0) "keep" else "drop"))
    }
    // independent recompute on one real document
    val doc = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter($"doc_id" === rows.head.getAs[Long]("doc_id"))
      .select($"text").as[String].head()
    val toks = doc.split(" ")
    assert(rows.head.getAs[Long]("score") === toks.map(w).sum)
    assert(rows.head.getAs[Long]("n_tokens") === toks.length.toLong)
  }

  test("d70: planted corpus yields exact pair counts in (cnt desc, pair) order") {
    val docs = Seq((1L, "abc ab x"), (2L, "bcd")).toDF("doc_id", "text")
    // pairs: abc→ab,bc; ab→ab; bcd→bc,cd; x→(none)
    val got = Corpus3.bpePairCounts(docs, 10).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toList
    assert(got === List(("ab", 2L), ("bc", 2L), ("cd", 1L)))
  }

  test("d70: k-boundary ties break on pair order deterministically") {
    val docs = Seq((1L, "zz yy xx")).toDF("doc_id", "text")
    val got = Corpus3.bpePairCounts(docs, 2).collect()
      .map(_.getAs[String]("pair")).toList
    assert(got === List("xx", "yy")) // all cnt=1; lexicographic wins
  }

  test("d71: the argmax merge applies and the recount reflects it") {
    // pairs before: ab×3, bc×1 → merge 'ab'; tokens become Æ Æ Æc
    val docs = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val got = Corpus3.bpeMergeRound(docs, 5).collect()
    assert(got.forall(_.getAs[String]("merged_pair") === "ab"))
    assert(got.map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt")))
      .toList === List(("Æc", 1L)))
  }

  test("d71: merge application is left-to-right non-overlapping") {
    // 'aaa aa': pairs aa×3 → merge 'aa'; 'aaa'→'Æa' (not 'aÆ'), 'aa'→'Æ'
    val docs = Seq((1L, "aaa aa")).toDF("doc_id", "text")
    val got = Corpus3.bpeMergeRound(docs, 5).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toList
    assert(got === List(("Æa", 1L)))
  }

  test("d72: span layout matches an independent recompute (overlap + clip)") {
    // recompute the span geometry in plain Scala for two planted docs
    def starts(doc: Long, n: Int): Seq[Int] = (0 until n).filter(p =>
      ((doc % 1000003L) * 2654435761L + p * 40503L) % 11L == 0)
    def maskedOf(doc: Long, n: Int): Seq[Int] =
      starts(doc, n).flatMap(p => p to p + 2).distinct.filter(_ < n).sorted
    val n1 = 40
    val text1 = (1 to n1).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text1), (11L, "a b")).toDF("doc_id", "text")
    val rows = Corpus3.spanCorruption(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val m7 = maskedOf(7L, n1)
    assert(rows(7L).getAs[Long]("n_spans") === starts(7L, n1).length.toLong)
    assert(rows(7L).getAs[Long]("n_masked") === m7.length.toLong)
    assert(rows(7L).getAs[Long]("mask_fingerprint") ===
      m7.map(p => p.toLong * 2654435761L % 1000003L).sum)
    assert(rows(7L).getAs[Long]("mask_bp") === m7.length.toLong * 10000 / n1)
    // doc 11 has 2 tokens: any span starting at pos 0/1 clips to n_tokens
    val m11 = maskedOf(11L, 2)
    assert(rows(11L).getAs[Long]("n_masked") === m11.length.toLong)
    assert(rows(11L).getAs[Long]("n_masked") <= 2)
  }
}
