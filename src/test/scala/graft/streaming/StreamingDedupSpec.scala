package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One document row for the streaming dedup gate. */
case class Doc(doc_id: Long, text: String)

/** Pins the streaming corpus-ingestion dedup gate: within-batch
  * keep-first, cross-batch rejection against the accumulated fingerprint
  * table, canonical-whitespace equivalence (the d32 contract), and
  * idempotent replay of a batch id.
  */
class StreamingDedupSpec extends SparkSpec {

  private def dirs() = (
    Files.createTempDirectory("graft-sdedup-fp").toString + "/fp",
    Files.createTempDirectory("graft-sdedup-acc").toString + "/acc",
    Files.createTempDirectory("graft-sdedup-ckpt").toString)

  test("gate accepts novel docs, rejects batch-internal and cross-batch dups") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (fpDir, accDir, ckpt) = dirs()
    val ms = MemoryStream[Doc]
    val q = StreamingDedup.start(ms.toDF(), fpDir, accDir, ckpt)

    // batch 1: A, B, and a canonical-equivalent copy of A (case +
    // whitespace differ) — keep-first admits doc 1, rejects doc 3
    ms.addData(Doc(1, "alpha beta"), Doc(2, "gamma"), Doc(3, "  Alpha   BETA "))
    q.processAllAvailable()
    // batch 2: C is novel; another A copy must be rejected against the
    // fingerprint table, not the batch
    ms.addData(Doc(4, "delta"), Doc(5, "alpha beta"))
    q.processAllAvailable()
    q.stop()

    // batch_id is a partition column: its read-back type is inference's
    // (int here) — compare numerically
    val acc = spark.read.parquet(accDir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Number]("batch_id").longValue))
    assert(acc.map(_._1).toSet === Set(1L, 2L, 4L))
    // fingerprint table holds one row per ACCEPTED doc, tagged by batch
    val fps = spark.read.parquet(fpDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Number]("batch_id").longValue).toMap
    assert(fps.keySet === Set(1L, 2L, 4L))
    assert(fps(4L) > fps(1L))
  }

  test("replaying a batch id is idempotent: same acceptances, no self-rejection") {
    import spark.implicits._
    val (fpDir, accDir, _) = dirs()
    val b0 = Seq(Doc(1, "one"), Doc(2, "two")).toDF()
    val b1 = Seq(Doc(3, "one"), Doc(4, "four")).toDF()
    StreamingDedup.processBatch(spark, b0, fpDir, accDir, batchId = 0L)
    val first = StreamingDedup
      .processBatch(spark, b1, fpDir, accDir, batchId = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first === Set(4L)) // doc 3 duplicates batch 0's "one"
    // replay batch 1 (at-least-once redelivery): its own first-attempt
    // fingerprints must NOT reject it, and the tables converge to the
    // same state instead of dropping or duplicating partition 1
    val replay = StreamingDedup
      .processBatch(spark, b1, fpDir, accDir, batchId = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay === Set(4L))
    val acc = spark.read.parquet(accDir).collect()
      .map(r => r.getAs[Long]("doc_id"))
    assert(acc.sorted.toSeq === Seq(1L, 2L, 4L))
  }
}
