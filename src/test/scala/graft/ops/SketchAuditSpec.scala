package graft.ops

import graft.SparkSpec

/** Pins the SELF-REPORTED accuracy of the sketch-family queries (the
  * rows-only ones the DuckDB oracle cannot check): the recall/fidelity
  * figures each audit query dumps must stay above these floors, so a
  * regression in the sketches is caught even though their outputs are
  * seed-specific. Thresholds are set with margin below the measured
  * sf0.001/sf0.01 values (d42b/d43b: 1.0 at both; e51b mean recall:
  * 0.34/0.44).
  */
class SketchAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d42b: MinHash-LSH recovers the exact shingle-Jaccard pairs") {
    val r = Dedup.d42bMinhashRecall.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") > 0)
    assert(r.getAs[Double]("recall") >= 0.95,
      s"LSH recall vs exact d41 pairs dropped: $r")
    assert(r.getAs[Double]("precision") >= 0.95,
      s"LSH precision vs exact d41 pairs dropped: $r")
  }

  test("d43b: SimHash keeps exact near-dup pairs within the near band") {
    val r = Dedup.d43bSimhashFidelity.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact_pairs") > 0)
    assert(r.getAs[Double]("mean_hamming") < 16.0,
      s"SimHash no longer tracks textual similarity: $r")
    assert(r.getAs[Double]("share_within_16") >= 0.9,
      s"SimHash fidelity on exact near-dups dropped: $r")
  }

  test("e51b: multi-probe ANN recall@10 stays above the floor") {
    val rows = Similarity.e51bAnnRecall.run(spark, dir).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("n_exact") === 10L))
    val mean = rows.map(_.getAs[Double]("recall_at_10")).sum / rows.length
    // weak random neighbors (cos ~0.3): single-probe measured ~0.14 mean,
    // multi-probe ~0.34 at sf0.001 — the floor catches a fall back to
    // single-probe or a bucketing break without flaking on geometry noise
    assert(mean >= 0.2, s"mean ANN recall@10 $mean fell below 0.2")
  }
}
