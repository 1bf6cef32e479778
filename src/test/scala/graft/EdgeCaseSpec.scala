package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops._

/** Degenerate-input behavior of the exposed operator cores: empty frames,
  * single rows, and all-identical values must produce empty-or-sane
  * results, never exceptions — the contract that makes operators safe to
  * run unguarded inside a scheduled pipeline (a 3 a.m. empty partition
  * must not page anyone).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("shingle postings: empty corpus, empty-string doc, one-word doc") {
    assert(Dedup.shinglePostings(emptyDocs).count() === 0)
    val tiny = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val rows = Dedup.shinglePostings(tiny).collect()
    // short docs contribute their raw text as the single shingle
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, ""), (2L, "word")))
  }

  test("length batching: empty input and one-doc input") {
    assert(Corpus4.lengthBatches(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")).count() === 0)
    val one = Corpus4.lengthBatches(
      Seq((7L, 33L)).toDF("doc_id", "n_tokens")).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("n_docs") === 1L)
    assert(one.head.getAs[Long]("pad_waste") === 0L)
  }

  test("CDC chunking: empty corpus and sub-window docs chunk whole") {
    assert(Corpus4.cdcChunks(emptyDocs).count() === 0)
    val rows = Corpus4.cdcChunks(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .collect()
    // 3 tokens < the 4-token hash window: one chunk, no cuts possible
    assert(rows.length === 1 && rows.head.getAs[Long]("n_tokens") === 3L)
  }

  test("label propagation: singleton self-loop and two disconnected edges") {
    val selfLoop = Seq((1L, 1L)).toDF("src", "dst")
    val got = Graph2.labelPropagation(selfLoop, 3).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 1L)))
    val twoIslands = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val labels = Graph2.labelPropagation(twoIslands, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // disconnected pairs never share a label
    assert(Set(labels(1L), labels(2L)) !== Set(labels(10L), labels(11L)))
  }

  test("SSSP: unreachable seeds and empty edge set") {
    val edges = Seq((1L, 2L, 5L)).toDF("src", "dst", "len")
    val far = Graph3.sssp(edges, Seq((99L, 0L)).toDF("node", "d"), 3)
      .collect()
    assert(far.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((99L, 0L)))
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "len")
    val alone = Graph3.sssp(noEdges, Seq((1L, 0L)).toDF("node", "d"), 3)
      .collect()
    assert(alone.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 0L)))
  }

  test("source overlap: single source yields an empty pair matrix") {
    val docs = Seq((1L, "a b c d e", "only"), (2L, "f g h i j", "only"))
      .toDF("doc_id", "text", "source")
    val sh = Dedup.shinglePostings(docs)
      .select(col("doc_id"), xxhash64(col("s")).as("hs"))
    assert(Corpus4.sourceOverlap(sh, docs).count() === 0)
  }

  test("entropy stats: uniform text has zero entropy surprise at n=1") {
    val one = Corpus.entropyStats(Seq((1L, "x x x x")).toDF("doc_id", "text"))
      .collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("n_tokens") === 4L)
    assert(one.head.getAs[Long]("n_distinct") === 1L)
  }

  test("peak concurrency: single interval reports peak 1 at its start") {
    val r = Relational4.peakConcurrency(
      Seq((100L, 50L)).toDF("t0", "dur")).collect().head
    assert(r.getAs[Long]("peak_concurrency") === 1L)
  }
}
