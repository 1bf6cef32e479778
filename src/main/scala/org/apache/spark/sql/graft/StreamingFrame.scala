package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE internal-API bridge in this codebase, kept deliberately tiny
  * and alone in this package.
  *
  * A DataSource-V1 streaming `Source.getBatch` must return a frame whose
  * logical plan is flagged `isStreaming` — `MicroBatchExecution` asserts
  * it before splicing the batch into the streaming plan. Spark offers no
  * public constructor for such a frame (every public path produces a
  * batch plan); the only mint is `SparkSession.internalCreateDataFrame(
  * rdd, schema, isStreaming = true)`, which is `private[sql]` — the same
  * bridge every pre-DSv2 external connector (Bahir MQTT, early Delta)
  * compiled against. This object lives under `org.apache.spark.sql`
  * solely to satisfy that access qualifier; nothing else in the repo
  * touches a non-public Spark API (see the DSv2 sources for the
  * fully-public path, used when the reader produces its own rows).
  */
object StreamingFrame {

  /** Re-wrap `df`'s physical rows as a streaming frame with `df`'s
    * schema. The wrapped plan executes when the micro-batch runs, so
    * laziness — and the one-pass cost model of the feed being wrapped —
    * is preserved.
    */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** The inverse, for a V1 streaming `Sink.addBatch`: the micro-batch
    * frame Spark hands a sink carries the incremental (streaming) plan,
    * which batch writers refuse; re-wrap its physical rows as a plain
    * batch frame — exactly what `ForeachBatchSink` does before invoking
    * the user function. The plan still executes lazily, once, when the
    * sink's write runs.
    */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = false)
}
