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

  test("streaming read: admission-controlled batches, bit-equal to batch") {
    import org.apache.spark.sql.functions.col
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = spark.readStream.format("graft-synth")
      .option("rows", 250).option("rowsPerBatch", 100).option("partitions", 3)
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.count()); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // 250 rows served as 100/100/50 (the read limit), nothing replayed
    import scala.jdk.CollectionConverters._
    val sizes = batches.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(sizes.filter(_ > 0) === Seq(100L, 100L, 50L))
  }

  test("streaming read equals the batch table row-for-row") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft-synth")
      .option("rows", 120).option("rowsPerBatch", 50).load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got.add(r.getAs[Long]("doc_id") -> r.getAs[String]("text"))); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamed = got.asScala.toSeq.sortBy(_._1)
    val batch = synth(120).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .sortBy(_._1).toSeq
    assert(streamed === batch)
  }
}
