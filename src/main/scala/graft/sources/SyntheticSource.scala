package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic corpus generator —
  * `spark.read.format("graft-synth").option("rows", n).load()` — for
  * dry-running pipelines at ANY scale with zero storage: the 100 TB
  * rehearsal a real cluster runs before touching production data.
  *
  * Spark-native behaviors implemented (not just a row iterator):
  *   - partition PLANNING: `partitions` splits of contiguous id ranges,
  *     so parallelism is declared to the scheduler, not discovered;
  *   - column PRUNING (`SupportsPushDownRequiredColumns`): unselected
  *     columns are never GENERATED — a projection of doc_id skips the
  *     text synthesis entirely (visible in the scan's readSchema);
  *   - LIMIT pushdown (`SupportsPushDownLimit`): `df.limit(n)` caps the
  *     ids each partition generates instead of generating-then-dropping;
  *   - FILTER pushdown (`SupportsPushDownV2Filters`): doc_id comparisons
  *     narrow the generated id range at partition-PLANNING time — the
  *     DSv2 spelling of partition pruning (`WHERE doc_id >= x` plans
  *     only the matching slices; other predicates return as residuals);
  *   - AGGREGATE pushdown (`SupportsPushDownAggregates`): a global
  *     COUNT(*) — optionally under a pushed doc_id range — is answered
  *     arithmetically (hi−lo) with zero rows generated, so counting a
  *     trillion-row rehearsal table is O(1).
  *
  * Rows are pure functions of (seed, doc_id) — xorshift-mixed — so any
  * two reads, any cluster size, any partition count produce identical
  * tables: the property that makes a synthetic rehearsal debuggable.
  * Schema mirrors the driver's `documents` table.
  */
class SyntheticSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      seed = Option(properties.get("seed")).map(_.toLong).getOrElse(42L),
      rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong)
        .getOrElse(100L))
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "de", "es", "fr", "zh")
  private val words = Array("data", "table", "query", "join", "scan",
    "filter", "agg", "window", "sort", "merge", "batch", "stream", "key",
    "value", "row", "column", "hash", "spark", "fast", "small")

  /** xorshift64* mix — deterministic per (seed, id, salt), full-period. */
  private def mix(seed: Long, id: Long, salt: Long): Long = {
    var x = seed ^ (id * 0x9E3779B97F4A7C15L) ^ (salt * 0xC2B2AE3D27D4EB4FL)
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    x * 0x2545F4914F6CDD1DL
  }

  private def pos(h: Long, n: Int): Int = (((h % n) + n) % n).toInt

  def textFor(seed: Long, id: Long): String = {
    val n = 20 + pos(mix(seed, id, 1), 60)
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(words(pos(mix(seed, id, 2 + i), words.length)))
      i += 1
    }
    sb.toString
  }

  def langFor(seed: Long, id: Long): String =
    langs(pos(mix(seed, id, 0), langs.length))

  def sourceFor(seed: Long, id: Long): String =
    "crawl-" + pos(mix(seed, id, 99), 20)
}

private class SyntheticTable(rows: Long, parts: Int, seed: Long,
    rowsPerBatch: Long)
    extends Table with SupportsRead {
  require(rows >= 0 && parts > 0 && rowsPerBatch > 0,
    "rows must be >= 0, partitions > 0, rowsPerBatch > 0")

  override def name(): String = s"graft_synth(rows=$rows, seed=$seed)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts, seed, rowsPerBatch)
}

private class SyntheticScanBuilder(rows: Long, parts: Int, seed: Long,
    rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownV2Filters with SupportsPushDownAggregates {

  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  private var required: StructType = SyntheticSource.schema
  private var limit: Long = Long.MaxValue
  // doc_id half-open bound narrowed by pushed predicates: ids are the
  // PARTITIONING axis of this source, so a doc_id range prunes work at
  // partition PLANNING time — the DSv2 spelling of partition pruning
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Predicate] = Array.empty
  private var countStar = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }
  // rows stream in doc_id order within each partition but partitions are
  // unordered — the limit cap is per-partition (correct, just not "the
  // first n globally"), so report it as non-exact and Spark keeps its own
  // GlobalLimit on top
  override def isPartiallyPushed: Boolean = true

  /** Absorb doc_id comparisons into the [lo, hi) range; anything else is
    * returned as a residual for Spark to evaluate post-scan. Absorbed
    * predicates are EXACT (ids are generated, never missing), so Spark
    * drops its own copy of them.
    */
  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    val (absorbed, residual) = predicates.partition(absorb)
    pushed = absorbed
    residual
  }

  override def pushedPredicates: Array[Predicate] = pushed

  private def fieldOf(e: V2Expr): Option[String] = e match {
    case n: NamedReference => Some(n.fieldNames.mkString("."))
    case _ => None
  }

  private def longOf(e: V2Expr): Option[Long] = e match {
    case l: V2Literal[_] => l.value match {
      case v: java.lang.Long => Some(v.longValue)
      case v: java.lang.Integer => Some(v.longValue)
      case _ => None
    }
    case _ => None
  }

  private def absorb(p: Predicate): Boolean = {
    val kids = p.children()
    if (kids.length != 2) return false
    // field-op-literal, or literal-op-field with the operator mirrored
    val parsed = (fieldOf(kids(0)), longOf(kids(1))) match {
      case (Some("doc_id"), Some(v)) => Some((p.name, v))
      case _ => (fieldOf(kids(1)), longOf(kids(0))) match {
        case (Some("doc_id"), Some(v)) =>
          p.name match {
            case ">" => Some(("<", v)); case ">=" => Some(("<=", v))
            case "<" => Some((">", v)); case "<=" => Some((">=", v))
            case "=" => Some(("=", v)); case _ => None
          }
        case _ => None
      }
    }
    parsed match {
      case Some((">", v))  => lo = math.max(lo, if (v == Long.MaxValue) v else v + 1); true
      case Some((">=", v)) => lo = math.max(lo, v); true
      case Some(("<", v))  => hi = math.min(hi, v); true
      case Some(("<=", v)) => hi = math.min(hi, if (v == Long.MaxValue) v else v + 1); true
      case Some(("=", v))  => lo = math.max(lo, v)
                              hi = math.min(hi, if (v == Long.MaxValue) v else v + 1); true
      case _ => false
    }
  }

  /** Global COUNT(*) answered from ARITHMETIC: ids are a generated dense
    * range, so the count after range pushdown is just hi−lo — no row is
    * ever produced. The flagship demonstration that metadata can answer
    * an aggregate over a table of any advertised size instantly.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]

  override def pushAggregation(agg: Aggregation): Boolean =
    if (supportCompletePushDown(agg)) { countStar = true; true } else false

  override def build(): Scan = {
    val boundedLo = math.max(0L, lo)
    val boundedHi = math.min(rows, hi)
    if (countStar)
      new SyntheticCountScan(math.max(0L, boundedHi - boundedLo))
    else
      new SyntheticScan(boundedLo, boundedHi, parts, seed, required, limit,
        rowsPerBatch)
  }
}

/** Completed COUNT(*) pushdown: one partition, one row, zero generation. */
private class SyntheticCountScan(count: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-synth pushedCountStar=$count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticCountReaderFactory(count)
}

/** Standalone (serializable) factory — an inner anonymous class would drag
  * the non-serializable Scan into the task closure.
  */
private class SyntheticCountReaderFactory(count: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = !served && { served = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](count))
      override def close(): Unit = ()
    }
}

private class SyntheticScan(lo: Long, hi: Long, parts: Int, seed: Long,
    required: StructType, limit: Long, rowsPerBatch: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the streaming path serves the FULL id range: batch-side predicate
  // pushdown does not rewrite a stream's offsets (Spark filters streamed
  // rows post-scan instead)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SyntheticMicroBatchStream(hi, parts, seed, rowsPerBatch, required)
  override def description(): String =
    s"graft-synth rows=${math.max(0L, hi - lo)} parts=$parts " +
      s"readSchema=${required.simpleString}" +
      s" plannedRange=[$lo,$hi)" +
      (if (limit != Long.MaxValue) s" pushedLimit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    // quotient/remainder split of the (possibly filter-narrowed) [lo, hi)
    // id range — no `rows + parts` style additions, which overflow (and
    // silently plan ZERO partitions) for ranges near Long.MaxValue on a
    // source that advertises any-scale rehearsal
    val rows = math.max(0L, hi - lo)
    val per = rows / parts
    val rem = rows % parts
    (0 until parts).iterator
      .map { p =>
        val start = lo + p * per + math.min(p.toLong, rem)
        val len = per + (if (p < rem) 1L else 0L)
        // pushed limit caps what each partition generates; compare against
        // the length (no start+limit addition — same overflow hazard);
        // Spark's own GlobalLimit on top trims across partitions
        val cappedLen = math.min(len, limit)
        SyntheticPartition(start, start + cappedLen)
      }
      .filter(ip => ip.end > ip.start)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(seed, required)
}

private case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

/** Streaming read path: the same deterministic id-range generation served
  * as micro-batches of `rowsPerBatch` ids per trigger until `rows` ids
  * have been emitted. Offsets are plain row counts (json = the number),
  * so checkpoint recovery replays EXACTLY the ids of the uncommitted
  * range — the rate-source shape, but bounded and bit-reproducible: the
  * streaming rehearsal twin of the batch scan (stream-read rows equal the
  * batch table row-for-row).
  */
private class SyntheticMicroBatchStream(rows: Long, parts: Int, seed: Long,
    rowsPerBatch: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  private case class SynthOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  override def initialOffset(): Offset = SynthOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** Admission-controlled advance: serve at most the read limit past the
    * committed start, never past `rows`. Subtraction-form bound — a
    * `start + cap` comparison overflows for rows near Long.MaxValue (the
    * same hazard as the batch planner's quotient/remainder split).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].n
    val cap = limit match {
      case m: ReadMaxRows => math.min(m.maxRows(), rowsPerBatch)
      case _ => rowsPerBatch
    }
    SynthOffset(if (rows - s <= cap) rows else s + cap)
  }

  override def reportLatestOffset(): Offset = SynthOffset(rows)

  // the engine uses the admission-controlled overload when
  // SupportsAdmissionControl is implemented (the rate source does the same)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-synth uses latestOffset(Offset, ReadLimit)")

  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].n
    val e = end.asInstanceOf[SynthOffset].n
    val len = math.max(0L, e - s)
    val per = len / parts
    val rem = len % parts
    (0 until parts).iterator
      .map { p =>
        val off = p * per + math.min(p.toLong, rem)
        val plen = per + (if (p < rem) 1L else 0L)
        SyntheticPartition(s + off, s + off + plen)
      }
      .filter(ip => ip.end > ip.start)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(seed, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class SyntheticReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SyntheticPartition]
    val names = required.fieldNames
    names.foreach { n =>
      require(SyntheticSource.schema.fieldNames.contains(n),
        s"graft-synth: unknown column $n")
    }
    // text and n_chars derive from ONE synthesis per row (not one per
    // column), and only when the projection needs either — pruned-away
    // columns are never generated
    val needsText = names.contains("text") || names.contains("n_chars")
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      // row-based DSv2 output is projected to UnsafeRow per row before any
      // buffering, so the row buffer is safe to reuse — no per-row
      // collection allocations in the innermost loop of a scale-rehearsal
      // source
      private val values = new Array[Any](names.length)
      private val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(values)
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = {
        val text = if (needsText) SyntheticSource.textFor(seed, id) else null
        var i = 0
        while (i < names.length) {
          values(i) = names(i) match {
            case "doc_id" => id
            case "text" => UTF8String.fromString(text)
            case "lang" =>
              UTF8String.fromString(SyntheticSource.langFor(seed, id))
            case "source" =>
              UTF8String.fromString(SyntheticSource.sourceFor(seed, id))
            case "n_chars" => text.length.toLong
          }
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
