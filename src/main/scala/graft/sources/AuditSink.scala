package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.UUID

import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("graft-audit")` — a DSv2 WRITE sink with real two-phase commit:
  * each task's DataWriter counts rows and per-column nulls, task commit()
  * returns those tallies as a WriterCommitMessage, and only the DRIVER's
  * BatchWrite.commit() — which runs iff every task committed — writes the
  * one-line JSON audit summary. A poisoned row (`fail.on.negative` with a
  * negative first-column value) makes its task throw, the driver calls
  * abort(), and NO summary appears: the atomicity contract a table-format
  * commit protocol provides, demonstrated end-to-end in ~100 lines.
  *
  * The read side of this engine's DSv2 surface (graft-synth) demonstrates
  * pushdown; this is the missing write half: speculative/retried tasks are
  * safe because tallies travel in commit MESSAGES (not side effects), and
  * the only externally-visible effect happens once, on the driver.
  *
  * Options: `path` (required) — directory for `audit-<uuid>.json`;
  * `fail.on.negative` — poison-row switch for abort-path tests.
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the incoming frame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditTable(schema, properties.asScala.toMap)
}

private class AuditTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String = "graft-audit"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode arrives as truncate(); the audit file is fresh per
      // commit (uuid name), so truncation is a no-op acknowledgement
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AuditBatchWrite(info.schema(),
            props.getOrElse("path",
              sys.error("graft-audit requires a path option")),
            props.get("fail.on.negative").exists(_.toBoolean))
      }
    }
}

/** Per-task tallies, shipped driver-side as the commit message. */
private case class AuditTally(rows: Long, nulls: Array[Long])
    extends WriterCommitMessage

private class AuditBatchWrite(schema: StructType, path: String,
    failOnNegative: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new AuditWriterFactory(schema, failOnNegative)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tallies = messages.map(_.asInstanceOf[AuditTally])
    val rows = tallies.map(_.rows).sum
    val nulls = schema.fieldNames.indices
      .map(i => tallies.map(_.nulls(i)).sum)
    val fields = schema.fieldNames.zip(nulls)
      .map { case (f, n) => s""""$f":$n""" }.mkString(",")
    val json =
      s"""{"rows":$rows,"tasks":${messages.length},"nulls":{$fields}}"""
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, s"audit-${UUID.randomUUID()}.json"),
      json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class AuditWriterFactory(schema: StructType, failOnNegative: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private val nulls = new Array[Long](schema.length)
      override def write(record: InternalRow): Unit = {
        if (failOnNegative && schema.nonEmpty && !record.isNullAt(0) &&
            schema.fields(0).dataType ==
              org.apache.spark.sql.types.LongType &&
            record.getLong(0) < 0)
          sys.error(s"poisoned row in partition $partitionId")
        rows += 1
        var i = 0
        while (i < schema.length) {
          if (record.isNullAt(i)) nulls(i) += 1
          i += 1
        }
      }
      override def commit(): WriterCommitMessage = AuditTally(rows, nulls)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
