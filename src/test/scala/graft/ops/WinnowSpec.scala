package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprint guarantees: documents sharing a long substring
  * share fingerprints; unrelated documents share (almost) none.
  */
class WinnowSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank at dawn"
    Seq(
      (1L, s"prefix one $shared and some unique trailing text here"),
      (2L, s"totally different opening words $shared closing differently"),
      (3L, "unrelated document about catalyst optimizer rules and shuffle exchanges"))
      .toDF("doc_id", "text")
  }

  test("docs sharing a long substring share winnowing fingerprints") {
    val fp = TextAnalysis.winnowFingerprints(docs)
    val sets = fp.groupBy("doc_id").agg(collect_set("fingerprint").as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val s12 = sets(1L).intersect(sets(2L)).size
    val s13 = sets(1L).intersect(sets(3L)).size
    assert(s12 >= 3, s"expected shared fingerprints for the planted overlap, got $s12")
    assert(s13 === 0, s"unrelated docs should share no fingerprints, got $s13")
  }

  test("fingerprinting is deterministic") {
    val a = TextAnalysis.winnowFingerprints(docs).collect().toSet
    val b = TextAnalysis.winnowFingerprints(docs).collect().toSet
    assert(a === b)
  }
}
