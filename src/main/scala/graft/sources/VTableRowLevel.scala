package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.VersionedTable

/** SQL ROW-LEVEL OPERATIONS — `UPDATE`, `MERGE INTO`, and
  * arbitrary-predicate `DELETE` — for the versioned table, through
  * Spark's DELTA-BASED DSv2 contract ([[SupportsDelta]]):
  *
  *  1. Catalyst rewrites the statement into a join of the target scan
  *     (the table's own pushdown/pruning scan) against the source /
  *     condition, producing one DELETE / UPDATE / INSERT operation per
  *     affected row, keyed by the table's declared row-id column (the
  *     `key` table property).
  *  2. Executor tasks STAGE the operations as parquet under the table's
  *     `_staging/` dir — deleted row-ids in one file set, inserted rows
  *     in another — via [[VTableDeltaWriter]]. The staged write is
  *     distributed (no driver collection) and exactly-once at the file
  *     level: only files named by COMMITTED task messages are read, so a
  *     crashed task's orphan can never double-apply.
  *  3. The driver commit applies the staged delta through
  *     [[VersionedTable.applyRowDelta]] — generation-granular
  *     copy-on-write with the row-id cardinality guard — publishing ONE
  *     manifest; on a publish race the statement fails loudly rather
  *     than retry against a snapshot it never read.
  *
  * This mirrors how Iceberg/Delta wire MERGE into Spark, on the same
  * public connector API. One semi-internal Spark class is used:
  * `ParquetWriteSupport` (public, but in an `execution` package) — the
  * InternalRow→parquet encoder every file-backed connector needs and
  * Spark publishes no public equivalent of; it rides parquet-hadoop's
  * public `ParquetWriter.Builder` API. See `StreamingFrame` for the
  * repo's other documented bridge.
  */
class VTableRowOp(path: String, keyCol: String, pruneCol: Option[String],
    tableSchema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-vtable row-level $cmd on $path (row id: $keyCol)"

  // the target read is the table's own scan: column pruning, filter
  // pushdown and manifest-stats generation pruning all apply to the
  // statement's target side exactly as to a SELECT
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VTableScanBuilder(path, None, pruneCol, tableSchema)

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(keyCol))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new VTableDeltaWrite(
        path, keyCol, pruneCol, cmd, info)
    }
}

class VTableDeltaWrite(path: String, keyCol: String,
    pruneCol: Option[String], cmd: RowLevelOperation.Command,
    info: LogicalWriteInfo) extends DeltaWrite {

  override def description(): String = s"graft-vtable delta write to $path"

  override def toBatch(): DeltaBatchWrite =
    new VTableDeltaBatchWrite(path, keyCol, pruneCol, cmd,
      info.schema(),
      info.rowIdSchema().orElseThrow(() => new IllegalStateException(
        "graft-vtable: delta write without a row-id schema")))
}

/** One SQL statement's staged, two-phase-committed delta. */
class VTableDeltaBatchWrite(path: String, keyCol: String,
    pruneCol: Option[String], cmd: RowLevelOperation.Command,
    dataSchema: StructType, keySchema: StructType) extends DeltaBatchWrite {

  private def spark = SparkSession.active

  private val stagingDir =
    s"$path/_staging/rowdelta-${java.util.UUID.randomUUID().toString.take(12)}"

  private val kind = cmd match {
    case RowLevelOperation.Command.MERGE => "merge"
    case RowLevelOperation.Command.UPDATE => "update"
    case RowLevelOperation.Command.DELETE => "delete"
  }

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DeltaWriterFactory =
    new VTableDeltaWriterFactory(stagingDir, dataSchema, keySchema,
      new SerializableHadoopConf(VTableTaskConf.resolved(spark)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: VTableDeltaTaskResult => m }
    val delFiles = msgs.flatMap(_.deleteFile).toSeq
    val insFiles = msgs.flatMap(_.insertFile).toSeq
    try {
      if (delFiles.isEmpty && insFiles.isEmpty) return // matched no rows
      def staged(files: Seq[String], schema: StructType) =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else spark.read.schema(schema).parquet(files: _*)
      // `pruneCol` is the catalog's comma LIST of stats columns — split it
      // (a single joined string would feed min(col("c1,c2")) and fail
      // analysis AFTER the generation is written, leaking an orphan)
      val committed = VersionedTable.applyRowDelta(spark, path,
        staged(delFiles, keySchema), staged(insFiles, dataSchema),
        keyCol, kind, statsCols = VTableScans.pruneColsOf(pruneCol))
      if (committed.isEmpty) throw new java.io.IOException(
        s"graft-vtable: $kind lost the publish race at $path — a " +
          "concurrent commit landed mid-statement; re-run the statement " +
          "against the new snapshot")
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val p = new Path(stagingDir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(p)) hfs.delete(p, true)
    ()
  }
}

case class VTableDeltaTaskResult(deleteFile: Option[String],
    insertFile: Option[String]) extends WriterCommitMessage

class VTableDeltaWriterFactory(stagingDir: String, dataSchema: StructType,
    keySchema: StructType, conf: SerializableHadoopConf)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new VTableDeltaWriter(stagingDir, dataSchema, keySchema, conf.value,
      partitionId, taskId)
}

/** Per-task staging writer: deleted row-ids and inserted rows land in
  * two lazily-opened parquet files named by (partition, task) — unique
  * per attempt, so a speculative twin can never collide, and invisible
  * to the commit unless THIS attempt's message delivers them.
  */
class VTableDeltaWriter(stagingDir: String, dataSchema: StructType,
    keySchema: StructType, conf: Configuration, partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  private var delWriter: ParquetWriter[InternalRow] = _
  private var delPath: Path = _
  private var insWriter: ParquetWriter[InternalRow] = _
  private var insPath: Path = _

  private def open(sub: String,
      schema: StructType): (ParquetWriter[InternalRow], Path) = {
    val p = new Path(s"$stagingDir/$sub/part-$partitionId-$taskId.parquet")
    val c = new Configuration(conf)
    ParquetWriteSupport.setSchema(schema, c)
    val w = new RowParquetBuilder(HadoopOutputFile.fromPath(p, c))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    (w, p)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null) {
      val (w, p) = open("deletes", keySchema); delWriter = w; delPath = p
    }
    delWriter.write(id)
  }

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null) {
      val (w, p) = open("inserts", dataSchema); insWriter = w; insPath = p
    }
    insWriter.write(row)
  }

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    insert(row)

  override def commit(): WriterCommitMessage = {
    closeAll()
    VTableDeltaTaskResult(Option(delPath).map(_.toString),
      Option(insPath).map(_.toString))
  }

  override def abort(): Unit = {
    closeAll()
    Seq(delPath, insPath).filter(_ != null).foreach { p =>
      val hfs = p.getFileSystem(conf)
      if (hfs.exists(p)) hfs.delete(p, false)
    }
  }

  override def close(): Unit = closeAll()

  private def closeAll(): Unit = {
    if (delWriter != null) { delWriter.close(); delWriter = null }
    if (insWriter != null) { insWriter.close(); insWriter = null }
  }
}

/** parquet-hadoop's public builder bound to Spark's InternalRow encoder
  * (the `ParquetWriteSupport` bridge documented on [[VTableRowOp]]).
  */
private[sources] class RowParquetBuilder(file: HadoopOutputFile)
    extends ParquetWriter.Builder[InternalRow, RowParquetBuilder](file) {
  override def self(): RowParquetBuilder = this
  override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
    new ParquetWriteSupport
}

/** Hadoop `Configuration` is Writable, not Serializable; ship it to
  * tasks the standard connector way.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Task-side parquet encoder configuration: resolve the session's
  * EFFECTIVE parquet-dialect values (set or default) on the driver so
  * every task writes exactly what the session's own parquet writers
  * would. Shared by the row-level delta staging and the generic staged
  * batch write.
  */
private[sources] object VTableTaskConf {
  def resolved(spark: SparkSession): Configuration = {
    val conf = spark.sessionState.newHadoopConf()
    val sqlc = org.apache.spark.sql.internal.SQLConf.get
    Seq(
      org.apache.spark.sql.internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      org.apache.spark.sql.internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      org.apache.spark.sql.internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
      org.apache.spark.sql.internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE,
      org.apache.spark.sql.internal.SQLConf.SESSION_LOCAL_TIMEZONE,
      org.apache.spark.sql.internal.SQLConf.CASE_SENSITIVE)
      .foreach(e =>
        conf.set(e.key, sqlc.getConfString(e.key, e.defaultValueString)))
    conf
  }
}

/** GENERIC STAGED V2 BATCH WRITE: executor tasks stage the query result
  * as parquet under the table's `_staging/`, the driver commit reads
  * the staged files back as ONE frame and applies `commitFn` — the
  * bridge that puts whole-frame commit primitives (dynamic partition
  * overwrite) behind Spark's PURE-V2 write plans, which have no V1
  * fallback exec. Same exactly-once file discipline as the row-level
  * staging: only files named by committed task messages are read, so a
  * speculative or crashed attempt can never double-apply.
  */
class VTableStagedBatchWrite(spark: SparkSession, path: String,
    schema: StructType,
    commitFn: (SparkSession, org.apache.spark.sql.DataFrame) => Unit)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val stagingDir =
    s"$path/_staging/v2w_${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new VTableStagedWriterFactory(stagingDir, schema,
      new SerializableHadoopConf(VTableTaskConf.resolved(spark)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages
      .collect { case VTableStagedFile(Some(f)) => f }.toSeq
    try {
      val staged =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else spark.read.schema(schema).parquet(files: _*)
      commitFn(spark, staged)
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit = {
    val p = new Path(stagingDir)
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hfs.exists(p)) hfs.delete(p, true)
    ()
  }
}

case class VTableStagedFile(file: Option[String]) extends WriterCommitMessage

class VTableStagedWriterFactory(stagingDir: String, schema: StructType,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new VTableStagedWriter(stagingDir, schema, conf.value, partitionId,
      taskId)
}

/** Per-task staging writer: rows land in one lazily-opened parquet file
  * named by (partition, task) — unique per attempt.
  */
class VTableStagedWriter(stagingDir: String, schema: StructType,
    conf: Configuration, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private var writer: ParquetWriter[InternalRow] = _
  private var path: Path = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      path = new Path(s"$stagingDir/part-$partitionId-$taskId.parquet")
      val c = new Configuration(conf)
      ParquetWriteSupport.setSchema(schema, c)
      writer = new RowParquetBuilder(HadoopOutputFile.fromPath(path, c))
        .withConf(c)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    writer.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    VTableStagedFile(Option(path).map(_.toString))
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (path != null) {
      val hfs = path.getFileSystem(conf)
      if (hfs.exists(path)) hfs.delete(path, false)
    }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
