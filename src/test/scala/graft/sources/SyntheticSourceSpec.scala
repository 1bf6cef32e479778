package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The DSv2 synthetic source: deterministic rows, declared partition
  * planning, column pruning and limit pushdown reaching the scan.
  */
class SyntheticSourceSpec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 4, seed: Long = 42L): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("deterministic: same options produce the identical table") {
    val a = synth(200).collect().map(_.toString).sorted
    val b = synth(200).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.length === 200)
  }

  test("different seeds produce different corpora") {
    val a = synth(50, seed = 1L).collect().map(_.getAs[String]("text"))
    val b = synth(50, seed = 2L).collect().map(_.getAs[String]("text"))
    assert(a.toSeq !== b.toSeq)
  }

  test("partition planning: declared splits reach the scheduler") {
    assert(synth(1000, parts = 7).rdd.getNumPartitions === 7)
    // empty tail ranges are dropped, not scheduled
    assert(synth(3, parts = 8).rdd.getNumPartitions <= 3)
  }

  test("column pruning reaches the scan (unread columns never generated)") {
    val plan = synth(100).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("readSchema=struct<doc_id:bigint>"),
      s"scan did not prune to doc_id:\n$plan")
  }

  test("limit pushdown caps generation and the result honors the limit") {
    val df = synth(1000000, parts = 4).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=5"), s"limit not pushed:\n$plan")
    assert(df.count() === 5)
  }

  test("rows are well-formed and n_chars matches the text") {
    val rows = synth(100).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") === r.getAs[String]("text").length.toLong)
      assert(Set("en", "de", "es", "fr", "zh")(r.getAs[String]("lang")))
      assert(r.getAs[String]("source").startsWith("crawl-"))
    }
  }

  test("the engine's operators run unchanged on the synthetic source") {
    // the point of the source: rehearse a pipeline with zero storage
    val out = graft.ops.Corpus.entropyStats(synth(300)).collect()
    assert(out.length === 300)
    assert(out.forall(_.getAs[Double]("entropy_bits") > 0.0))
  }
}
