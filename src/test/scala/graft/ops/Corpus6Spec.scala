package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-corpus pins for the round-11 repetition operators: d96
  * exact-substring dedup (span discovery, interval merge, reconstruction)
  * and d97 Gopher repetition stats (hand-computed fractions).
  */
class Corpus6Spec extends SparkSpec {

  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("d96: a copied passage at different offsets is found, merged, and cut") {
    // docs 1 and 2 share a verbatim 10-token run at DIFFERENT positions —
    // the case d63's fixed blocks can miss; doc 3 is clean
    val passage = (1 to 10).map(i => s"P$i").mkString(" ")
    val d1 = s"a b c $passage x y z"
    val d2 = s"$passage q r s t u v"
    val d3 = (1 to 16).map(i => s"u$i").mkString(" ")
    val out = Corpus6.substringDedup(docsOf(1L -> d1, 2L -> d2, 3L -> d3))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // doc 1: 16 tokens, passage at positions 3..12 → windows starting
    // 3,4,5 are duplicated (10-token run = 3 overlapping 8-windows),
    // merged span [3, 13) → 10 tokens removed, "a b c x y z" kept
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_tokens") === 16L)
    assert(r1.getAs[Long]("n_windows") === 9L)
    assert(r1.getAs[Long]("n_dup_positions") === 3L)
    assert(r1.getAs[Long]("n_spans") === 1L)
    assert(r1.getAs[Long]("n_tokens_removed") === 10L)
    assert(r1.getAs[Long]("n_tokens_kept") === 6L)
    // reconstruction pinned byte-exactly
    val md5abcxyz = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c x y z".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getAs[String]("clean_md5") === md5abcxyz)

    // doc 2: same passage at the head → span [0, 10)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_spans") === 1L)
    assert(r2.getAs[Long]("n_tokens_removed") === 10L)
    assert(r2.getAs[Long]("n_tokens_kept") === 6L)

    // doc 3: untouched
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_dup_positions") === 0L)
    assert(r3.getAs[Long]("n_tokens_removed") === 0L)
    assert(r3.getAs[Long]("n_tokens_kept") === 16L)
  }

  test("d96: overlapping copies merge into one span; short docs pass through") {
    // docs 10/11 share tokens 0..9 AND 6..15 (two overlapping duplicated
    // runs) → one merged span covering 0..16
    val run = (1 to 16).map(i => s"R$i").mkString(" ")
    val out = Corpus6.substringDedup(docsOf(
        10L -> s"$run tail1 tail2",
        11L -> s"$run other1 other2",
        12L -> "tiny doc under window"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(10L).getAs[Long]("n_spans") === 1L)
    assert(out(10L).getAs[Long]("n_tokens_removed") === 16L)
    // a doc shorter than the window has no windows and keeps everything
    assert(out(12L).getAs[Long]("n_windows") === 0L)
    assert(out(12L).getAs[Long]("n_tokens_kept") === 4L)
  }

  test("d96: kept + removed reconciles with totals on the real corpus") {
    val out = Corpus6.substringDedup(
      graft.ops.Q.t(spark, sf0001, "documents").select(col("doc_id"), col("text")))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens_kept") + r.getAs[Long]("n_tokens_removed")
        === r.getAs[Long]("n_tokens"), s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("d97: hand-computed repetition fractions on planted docs") {
    // doc 1: "a b a b a b a b" — 8 tokens; 2-gram "a b" occurs 4 of 7
    // starts → top2_cnt 4, frac 4*2*10000/8 = 10000 bp; every 5-gram
    // occurs ≥2 times → full coverage 8 tokens → dup5 10000 bp
    // doc 2: 40 distinct tokens — all counts 1 (top2 500 bp, top3 750 bp,
    // both under threshold), dup5 none → passes the panel
    val out = Corpus6.repetitionStats(docsOf(
      1L -> "a b a b a b a b",
      2L -> (1 to 40).map(i => s"v$i").mkString(" ")))
    val m = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = m(1L)
    assert(r1.getAs[Long]("top2_cnt") === 4L)
    assert(r1.getAs[Long]("top2_frac_bp") === 10000L)
    assert(r1.getAs[Long]("dup5_covered") === 8L)
    assert(r1.getAs[Long]("dup5_frac_bp") === 10000L)
    assert(!r1.getAs[Boolean]("gopher_pass"))
    val r2 = m(2L)
    assert(r2.getAs[Long]("top2_cnt") === 1L)
    assert(r2.getAs[Long]("top2_frac_bp") === 500L)
    assert(r2.getAs[Long]("top3_frac_bp") === 750L)
    assert(r2.getAs[Long]("dup5_covered") === 0L)
    assert(r2.getAs[Boolean]("gopher_pass"))
  }
}
