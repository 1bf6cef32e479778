package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, max, min}
import org.apache.spark.sql.types._

/** METADATA-ONLY AGGREGATES over a [[VersionedTable]] snapshot, served
  * from parquet FOOTERS — the engine behind the catalog scan's
  * `SupportsPushDownAggregates` (see [[graft.sources.VTableScanBuilder]]).
  *
  * `SELECT count(*) FROM t` on a 100 TB table should not read 100 TB:
  * every parquet file already carries its row count and per-column
  * [min, max, nullCount] statistics in the footer, so a global
  * COUNT / MIN / MAX is answerable from O(files) footer reads — a
  * metadata-sized job — instead of an O(data) scan. Iceberg serves the
  * same aggregates from its manifests; this engine's manifests carry
  * directory names only (bytes-sized by design), so the per-file half
  * lives in the footers, harvested by a DISTRIBUTED job: the file list
  * is parallelized and each task opens only footers (column metadata),
  * never data pages.
  *
  * Correctness posture — exactness is never compromised:
  *   - the caller (the scan builder) refuses pushdown entirely when the
  *     snapshot has outstanding deletion vectors (footer counts include
  *     logically-deleted rows) and refuses MIN/MAX/COUNT(col) on any
  *     column touched by rename/widen/default metadata (per-generation
  *     adaptations footers know nothing about);
  *   - a column chunk with unusable statistics (missing, wrong physical
  *     type, INT96 timestamps, truncated binary) marks its column
  *     UNSERVED, and unserved columns fall back to an exact data scan
  *     of the snapshot — slower, never wrong;
  *   - a file that simply lacks the column (schema-evolution era, no
  *     default declared) contributes NULLs by definition: nothing to
  *     MIN/MAX, zero to COUNT(col) — served exactly without a scan.
  *
  * Only statistics-trustworthy shapes are served (the plan-time type
  * gate in the builder mirrors this): integral/float/double columns,
  * DATE (int32 days) and micros TIMESTAMP (int64). Parquet binary
  * min/max may be truncated by writers, so strings/decimals are never
  * pushed in the first place.
  */
object FooterStats {

  /** One requested aggregate, in `Aggregation` order. */
  sealed trait AggSpec
  /** COUNT(*): total snapshot rows. */
  case object RowCount extends AggSpec
  /** COUNT(col): non-null values of a top-level column. */
  final case class CountOf(colName: String) extends AggSpec
  /** MIN(col) in the column's Spark type (internal representation). */
  final case class MinOf(colName: String, dt: DataType) extends AggSpec
  /** MAX(col), same contract as [[MinOf]]. */
  final case class MaxOf(colName: String, dt: DataType) extends AggSpec

  // the statistics-trustworthy Spark types (byte/short/int/date ride
  // INT32, long/timestamp-micros ride INT64, float/double themselves)
  private[graft] def servableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  // per-file, per-column partial: either clean footer evidence or a
  // poison flag that forces the exact-scan fallback for that column
  private final case class ColPartial(
      unserved: Boolean, // stats unusable somewhere in this file
      hasValues: Boolean, // at least one non-null value with min/max
      minL: Long, maxL: Long, // INT32/INT64 channel
      minD: Double, maxD: Double, // FLOAT/DOUBLE channel
      nonNull: Long) { // non-null value count
    def merge(o: ColPartial): ColPartial = ColPartial(
      unserved || o.unserved,
      hasValues || o.hasValues,
      if (!o.hasValues) minL else if (!hasValues) o.minL else math.min(minL, o.minL),
      if (!o.hasValues) maxL else if (!hasValues) o.maxL else math.max(maxL, o.maxL),
      if (!o.hasValues) minD else if (!hasValues) o.minD else math.min(minD, o.minD),
      if (!o.hasValues) maxD else if (!hasValues) o.maxD else math.max(maxD, o.maxD),
      nonNull + o.nonNull)
  }
  private val emptyCol =
    ColPartial(unserved = false, hasValues = false, 0L, 0L, 0d, 0d, 0L)

  private final case class FilePartial(rows: Long, cols: Array[ColPartial]) {
    def merge(o: FilePartial): FilePartial =
      FilePartial(rows + o.rows,
        cols.zip(o.cols).map { case (a, b) => a.merge(b) })
  }

  // the distinct columns a spec list touches, with the channel type each
  private def colSpecsOf(specs: Seq[AggSpec]): Seq[(String, Option[DataType])] = {
    val cs = specs.collect {
      case CountOf(c) => (c, None)
      case MinOf(c, dt) => (c, Some(dt))
      case MaxOf(c, dt) => (c, Some(dt))
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, ss) =>
      (c, ss.flatMap(_._2).headOption)
    }
    cs.foreach { case (c, dt) =>
      dt.foreach(d => require(servableType(d),
        s"FooterStats: $c: $d has no trustworthy footer statistics"))
    }
    cs
  }

  // list one entry dir's data files; a vanished dir (racing vacuum of an
  // old snapshot) is empty, not an error — and NOT a separate exists()
  // probe, which would double the metadata RPCs per entry
  private def listEntry(hfs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path, e: String): Seq[String] =
    (try hfs.listStatus(new Path(rootPath, e)).toSeq
     catch { case _: java.io.FileNotFoundException => Seq.empty })
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      })
      .map(_.getPath.toString)

  // (file path, owning entry index) for every data file of the snapshot.
  // Entries with per-file manifest records (r18 `files:` headers) name
  // their files from the manifest read already paid — zero RPCs; the
  // rest pay one listStatus each, issued CONCURRENTLY from a bounded
  // pool — serial metadata RPCs against an object store would make the
  // driver half of the footer job O(entries × RTT) at the
  // thousands-of-leaves scale the partitioned layouts produce (the task
  // half is already a distributed job).
  private def listFiles(spark: SparkSession, root: String,
      entries: Seq[String],
      meta: Map[String, String]): Seq[(String, Int)] = {
    val rootPath = new Path(root)
    val (recorded, listed) = entries.zipWithIndex.partition { case (e, _) =>
      VersionedTable.recordedFiles(meta, e).isDefined }
    val fromManifest = recorded.flatMap { case (e, i) =>
      VersionedTable.recordedFiles(meta, e).get.map { case (n, _, _) =>
        (new Path(rootPath, s"$e/$n").toString, i) }
    }
    lazy val hfs = rootPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val fromListing =
      if (listed.isEmpty) Nil
      else if (listed.size <= 1)
        listed.flatMap { case (e, i) =>
          listEntry(hfs, rootPath, e).map((_, i)) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, listed.size))
        try {
          val futs = listed.map { case (e, i) =>
            pool.submit(new java.util.concurrent.Callable[Seq[(String, Int)]] {
              override def call(): Seq[(String, Int)] =
                listEntry(hfs, rootPath, e).map((_, i))
            })
          }
          futs.flatMap(_.get())
        } finally pool.shutdown()
      }
    fromManifest ++ fromListing
  }

  // the distributed footer job: per-ENTRY folded partials (footers only —
  // column METADATA, never data pages; at 100 TB the file list is large,
  // the per-file work is one footer fetch, so parallelize takes the file
  // count off the driver and reduceByKey folds per entry in tasks)
  private def entryPartials(spark: SparkSession,
      files: Seq[(String, Int)],
      colSpecs: Seq[(String, Option[DataType])]): Map[Int, FilePartial] =
    if (files.isEmpty) Map.empty
    else {
      val confBc = spark.sparkContext.broadcast(
        new SerializableWritable(spark.sparkContext.hadoopConfiguration))
      val names = colSpecs.map(_._1).toArray
      val dts = colSpecs.map(_._2).toArray
      val parts = math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism))
      spark.sparkContext.parallelize(files, parts).map { case (f, e) =>
        (e, readFooter(f, confBc.value.value, names, dts))
      }.reduceByKey(_.merge(_)).collect().toMap
    }

  // a leaf token as an INTERNAL group value of the declared type:
  // None = the grouping is not provable from this token (the hive null
  // token on strings — Spark renders null and '' identically — or a
  // token that fails to parse as the column's type)
  private def tokenValue(tok: Option[String], dt: DataType): Option[Any] =
    tok match {
      case None => // hive null token
        if (dt == StringType) None // null vs "" ambiguity: fallback
        else Some(null)
      case Some(s) =>
        try Some(dt match {
          case ByteType => java.lang.Byte.valueOf(s.toByte)
          case ShortType => java.lang.Short.valueOf(s.toShort)
          case IntegerType => java.lang.Integer.valueOf(s.toInt)
          case LongType => java.lang.Long.valueOf(s.toLong)
          case StringType =>
            org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case DateType => java.lang.Integer.valueOf(
            java.time.LocalDate.parse(s).toEpochDay.toInt)
          case other =>
            throw new IllegalArgumentException(s"ungroupable $other")
        }) catch {
          case _: IllegalArgumentException | _: NumberFormatException |
               _: java.time.format.DateTimeParseException => None
        }
    }

  // binary comparison over INTERNAL token/literal values — the same
  // total order Spark's default (UTF8_BINARY) string comparison and the
  // numeric/date internal representations use, so a token-level keep
  // decision agrees exactly with the row-level predicate
  private def cmpInternal(a: Any, b: Any): Int = (a, b) match {
    case (x: org.apache.spark.unsafe.types.UTF8String,
          y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Long.compare(x.longValue, y.longValue)
    case _ => throw new IllegalArgumentException(
      s"FooterStats: incomparable token classes ${a.getClass}/${b.getClass}")
  }

  // evaluate one pushed source filter against an entry's INTERNAL token
  // value (null = the hive null partition). Comparisons follow SQL
  // three-valued logic collapsed to keep/drop: a null token satisfies
  // no comparison (those rows are provably excluded by the predicate),
  // only IS NULL. `conv` converts the filter's EXTERNAL literal to the
  // internal representation once per (filter, entry) evaluation.
  private def evalTokenFilter(f: org.apache.spark.sql.sources.Filter,
      tok: Any, conv: Any => Any): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(_, v) => tok != null && cmpInternal(tok, conv(v)) == 0
      case GreaterThan(_, v) => tok != null && cmpInternal(tok, conv(v)) > 0
      case GreaterThanOrEqual(_, v) =>
        tok != null && cmpInternal(tok, conv(v)) >= 0
      case LessThan(_, v) => tok != null && cmpInternal(tok, conv(v)) < 0
      case LessThanOrEqual(_, v) =>
        tok != null && cmpInternal(tok, conv(v)) <= 0
      case In(_, vs) => tok != null &&
        vs.exists(v => v != null && cmpInternal(tok, conv(v)) == 0)
      case IsNull(_) => tok == null
      case IsNotNull(_) => tok != null
      case other => throw new IllegalArgumentException(
        s"FooterStats: unabsorbable filter shape $other")
    }
  }

  /** PLAN-TIME translation of absorbed partition filters into the exact
    * set of manifest entries they keep: Some(kept) iff the leaf tokens
    * at version `v` PROVE every filter — each entry either carries a
    * parseable `__p_<col>=<token>` segment for every filtered column
    * (identity transform: the token IS the value of every row in the
    * entry, so the token-level decision equals the row-level one), or
    * provably holds no data files. None = unprovable (a pre-partitioning
    * era, a string column's null-token ''-vs-null ambiguity, an
    * unparseable token) — the caller must refuse metadata serving and
    * let the exact data scan apply the filter. Same listing discipline
    * as [[groupingProvable]]: >8 token-less entries refuse outright.
    */
  def provableKeptEntries(spark: SparkSession, root: String, v: Long,
      preds: Seq[(String, DataType, org.apache.spark.sql.sources.Filter)])
      : Option[Seq[String]] = {
    val (entries, meta) = VersionedTable.manifestOf(spark, root, v)
    val convs = preds.map { case (_, dt, _) =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(dt)
    }
    // per entry: Some(keep?) when every pred's token proves; None when
    // some token is missing/unparseable (entry must then be empty)
    val decisions: Seq[Option[Boolean]] = entries.map { e =>
      val toks = preds.map { case (c, dt, _) =>
        VersionedTable.partValueOf(e, c).flatMap(tokenValue(_, dt))
      }
      if (toks.exists(_.isEmpty)) None
      else Some(toks.zip(preds).zip(convs).forall {
        case ((tok, (_, _, f)), conv) => evalTokenFilter(f, tok.get, conv)
      })
    }
    val unproven = entries.zip(decisions).collect {
      case (e, None) => e
    }
    val provable = provablyEmpty(spark, root, meta, unproven)
    if (!provable) None
    else Some(entries.zip(decisions).collect {
      case (e, Some(true)) => e // provably-empty entries drop too
    })
  }

  /** PLAN-TIME gate for GROUPED aggregate pushdown: true iff the
    * manifest's leaf tokens at version `v` PROVE the grouping — every
    * entry either carries a parseable `__p_<col>=<token>` segment for
    * every group column, or provably holds no data files (the catalog
    * CREATE's empty plain generation). The scan builder consults this
    * BEFORE accepting the pushdown, so the pushed plan's exact-fallback
    * group-by (a driver-side collect) can only ever be triggered by
    * unusable footer statistics, whose group count is bounded by the
    * manifest's leaf-dir count — never by data cardinality. Cost: one
    * manifest read (already paid by the DV gate) + at most a handful of
    * listings for token-less entries; more than 8 token-less entries
    * refuses outright rather than listing a long tail at plan time.
    */
  def groupingProvable(spark: SparkSession, root: String, v: Long,
      groupCols: Seq[(String, DataType)]): Boolean = {
    val (entries, meta) = VersionedTable.manifestOf(spark, root, v)
    val unproven = entries.filter { e =>
      groupCols.exists { case (c, dt) =>
        VersionedTable.partValueOf(e, c).flatMap(tokenValue(_, dt)).isEmpty
      }
    }
    provablyEmpty(spark, root, meta, unproven)
  }

  // are ALL of `unproven` provably file-free? Per-file manifest records
  // answer for free; the rest pay a listing each, capped at 8 (a long
  // token-less tail refuses rather than stalling plan time)
  private def provablyEmpty(spark: SparkSession, root: String,
      meta: Map[String, String], unproven: Seq[String]): Boolean = {
    val (recorded, toList) = unproven.partition(e =>
      VersionedTable.recordedFiles(meta, e).isDefined)
    if (recorded.exists(e =>
        VersionedTable.recordedFiles(meta, e).get.nonEmpty)) false
    else if (toList.isEmpty) true
    else if (toList.size > 8) false
    else {
      val hfs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val rootPath = new Path(root)
      toList.forall(e => listEntry(hfs, rootPath, e).isEmpty)
    }
  }

  private def resolveVersion(spark: SparkSession, root: String,
      v: Option[Long]): Long = {
    val vs = VersionedTable.versions(spark, root)
    require(vs.nonEmpty, s"FooterStats: no committed snapshot at $root")
    val ver = v.getOrElse(vs.last)
    require(vs.contains(ver), s"FooterStats: version $ver not in $vs")
    ver
  }

  // finish one group's folded partial into spec-ordered output values;
  // `fallback` carries exact (min, max, count) per unserved column
  private def finishValues(specs: Seq[AggSpec],
      idxOf: Map[String, Int], folded: FilePartial,
      fallback: Map[String, (Any, Any, Long)]): Array[Any] =
    specs.map {
      case RowCount => java.lang.Long.valueOf(folded.rows): Any
      case CountOf(c) =>
        java.lang.Long.valueOf(fallback.get(c).map(_._3)
          .getOrElse(folded.cols(idxOf(c)).nonNull)): Any
      case MinOf(c, dt) =>
        fallback.get(c).map(_._1).getOrElse {
          val p = folded.cols(idxOf(c))
          if (!p.hasValues) null else channelValue(p.minL, p.minD, dt)
        }: Any
      case MaxOf(c, dt) =>
        fallback.get(c).map(_._2).getOrElse {
          val p = folded.cols(idxOf(c))
          if (!p.hasValues) null else channelValue(p.maxL, p.maxD, dt)
        }: Any
    }.toArray

  /** Compute the requested aggregates over snapshot `v` (tip when None).
    * Returns one value per spec in INTERNAL representation (Long for
    * counts; the column's internal type — Int days for DATE, Long
    * micros for TIMESTAMP — for min/max; null when no non-null values
    * exist). Cost: one distributed footer-reading job over the
    * snapshot's files, plus one exact fallback scan IF any column's
    * footer statistics turn out unusable.
    */
  def aggregate(spark: SparkSession, root: String, v: Option[Long],
      specs: Seq[AggSpec], kept: Option[Seq[String]] = None,
      exactWhere: Option[org.apache.spark.sql.Column] = None): Array[Any] = {
    require(specs.nonEmpty, "FooterStats: no aggregates requested")
    val ver = resolveVersion(spark, root, v)
    // `kept` (from [[provableKeptEntries]]) restricts the footer job to
    // exactly the entries an absorbed partition predicate keeps; the
    // manifest at a pinned version is immutable, so a plan-time list
    // stays valid at execution
    val meta = VersionedTable.manifestOf(spark, root, ver)._2
    val entries = kept.getOrElse(
      VersionedTable.manifestDirs(spark, root, ver))
    val colSpecs = colSpecsOf(specs)
    val partials = entryPartials(spark,
      listFiles(spark, root, entries, meta), colSpecs)
    val folded = partials.values.foldLeft(
      FilePartial(0L, Array.fill(colSpecs.size)(emptyCol)))(_.merge(_))

    // any column whose footer evidence is poisoned falls back to ONE
    // exact scan computing all its aggregates — correctness over speed
    val unservedCols = colSpecs.zipWithIndex.collect {
      case ((c, _), i) if folded.cols(i).unserved => c
    }.toSet
    val fallback: Map[String, (Any, Any, Long)] =
      if (unservedCols.isEmpty) Map.empty
      else {
        // the exact fallback must honor the absorbed predicate — Spark
        // dropped its own Filter when the scan claimed the pushdown, so
        // re-applying it here is what keeps the fallback EXACT
        val df = exactWhere.foldLeft(
          VersionedTable.readAt(spark, root, Some(ver)))(_.where(_))
        // compute ONLY what each column's specs need: COUNT-only columns
        // (any type — maps/structs included) must not be fed through
        // min/max, which Spark refuses for unorderable types
        val cols = colSpecs.filter(cs => unservedCols.contains(cs._1))
        val aggs = cols.flatMap {
          case (c, Some(_)) => Seq(min(col(c)), max(col(c)), count(col(c)))
          case (c, None) => Seq(count(col(c)))
        }
        val r = df.agg(aggs.head, aggs.drop(1): _*).head()
        var i = 0
        cols.map {
          case (c, Some(dt)) =>
            // internal conversion must go through the catalyst converter
            // — Row.get returns java.sql OR java.time values depending on
            // spark.sql.datetime.java8API.enabled, and the converter
            // handles both families
            val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
              .createToCatalystConverter(dt)
            val out = c -> ((conv(r.get(i)), conv(r.get(i + 1)),
              r.getLong(i + 2)))
            i += 3; out
          case (c, None) =>
            val out = c -> ((null: Any, null: Any, r.getLong(i)))
            i += 1; out
        }.toMap
      }

    finishValues(specs, colSpecs.map(_._1).zipWithIndex.toMap, folded,
      fallback)
  }

  /** GROUPED metadata aggregates over IDENTITY partition columns: each
    * manifest entry's `__p_<col>=<token>` path segments name its group,
    * the per-entry footer partials fold per group, and the result is one
    * row per partition tuple — `SELECT day, tenant, count(*) … GROUP BY
    * day, tenant` over a 100 TB table from one footer job, never a data
    * scan (the Iceberg partition-summary economics through SQL).
    *
    * Returns None — caller must run the exact data-scan group-by instead
    * — whenever the tokens cannot PROVE the grouping:
    *   - a file-bearing entry lacks some group column's segment
    *     (pre-partitioning or other-spec-era generation);
    *   - a STRING group column hits the hive null token (Spark renders
    *     null AND the empty string identically, so the two groups are
    *     indistinguishable in paths);
    *   - a token fails to parse as the column's type;
    *   - any group has a column with unusable footer statistics
    *     (per-group data-scan patching would read the data anyway).
    * Rows come back as (group values ++ agg values), internal
    * representation, one array per group.
    */
  def aggregateByPartition(spark: SparkSession, root: String,
      v: Option[Long], groupCols: Seq[(String, DataType)],
      specs: Seq[AggSpec], kept: Option[Seq[String]] = None)
      : Option[Seq[Array[Any]]] = {
    require(groupCols.nonEmpty, "FooterStats: no group columns")
    val ver = resolveVersion(spark, root, v)
    val meta = VersionedTable.manifestOf(spark, root, ver)._2
    val entries = kept.getOrElse(
      VersionedTable.manifestDirs(spark, root, ver))
    val colSpecs = colSpecsOf(specs)
    val files = listFiles(spark, root, entries, meta)
    // entries with no data files contribute nothing — the catalog's
    // CREATE publishes an empty unpartitioned generation, which must
    // not force the fallback
    val live = files.map(_._2).toSet

    val keys: Seq[Option[Seq[Any]]] = entries.zipWithIndex.map {
      case (e, i) if live.contains(i) =>
        val vals = groupCols.map { case (c, dt) =>
          VersionedTable.partValueOf(e, c).flatMap(tokenValue(_, dt))
        }
        if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
      case _ => Some(Nil) // no files: group membership irrelevant
    }
    if (keys.exists(_.isEmpty)) return None // unprovable grouping

    val partials = entryPartials(spark, files, colSpecs)
    val groups: Map[Seq[Any], FilePartial] = partials.toSeq
      .groupBy { case (i, _) => keys(i).get }
      .map { case (k, ps) =>
        k -> ps.map(_._2).reduce(_.merge(_))
      }
    if (groups.values.exists(_.cols.exists(_.unserved))) return None

    val idxOf = colSpecs.map(_._1).zipWithIndex.toMap
    Some(groups.toSeq.map { case (k, folded) =>
      (k ++ finishValues(specs, idxOf, folded, Map.empty)).toArray
    })
  }

  // fold the per-channel long/double back into the column's INTERNAL type
  private def channelValue(l: Long, d: Double, dt: DataType): Any = dt match {
    case ByteType => java.lang.Byte.valueOf(l.toByte)
    case ShortType => java.lang.Short.valueOf(l.toShort)
    case IntegerType | DateType => java.lang.Integer.valueOf(l.toInt)
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.valueOf(l)
    case FloatType => java.lang.Float.valueOf(d.toFloat)
    case DoubleType => java.lang.Double.valueOf(d)
    case other => throw new IllegalArgumentException(s"unservable $other")
  }

  // the two stats channels: INT32/INT64 fold into longs, FLOAT/DOUBLE
  // into doubles; anything else (binary, INT96, boolean) is unservable
  private def decodeMinMax(
      st: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(Long, Long, Double, Double)] = st.genericGetMin match {
    case n: java.lang.Integer =>
      Some((n.longValue,
        st.genericGetMax.asInstanceOf[java.lang.Integer].longValue, 0d, 0d))
    case n: java.lang.Long =>
      Some((n.longValue,
        st.genericGetMax.asInstanceOf[java.lang.Long].longValue, 0d, 0d))
    case n: java.lang.Float =>
      Some((0L, 0L, n.doubleValue,
        st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue))
    case n: java.lang.Double =>
      Some((0L, 0L, n.doubleValue,
        st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue))
    case _ => None
  }

  // does this parquet primitive field carry EXACTLY the representation
  // the Spark type's internal values use? Physical type alone is not
  // enough — INT64 serves micros AND millis timestamps, and decoding
  // millis stats as micros would be silently 1000x off — so the LOGICAL
  // annotation is validated too; any mismatch (INT96 timestamps, MILLIS
  // unit, wrong UTC adjustment, decimal-annotated ints) goes unserved
  // and falls back to the exact scan.
  private def statsTypeOk(field: org.apache.parquet.schema.Type,
      dt: DataType): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    if (!field.isPrimitive) return false
    val p = field.asPrimitiveType
    val ann = p.getLogicalTypeAnnotation
    def intSigned = ann match {
      case null => true
      case i: IntLogicalTypeAnnotation => i.isSigned
      case _ => false
    }
    def tsMicros(adjustedToUtc: Boolean) = ann match {
      case t: TimestampLogicalTypeAnnotation =>
        t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
          t.isAdjustedToUTC == adjustedToUtc
      case _ => false
    }
    dt match {
      case ByteType | ShortType | IntegerType =>
        p.getPrimitiveTypeName == INT32 && intSigned
      case DateType =>
        p.getPrimitiveTypeName == INT32 &&
          ann.isInstanceOf[DateLogicalTypeAnnotation]
      case LongType => p.getPrimitiveTypeName == INT64 && intSigned
      case TimestampType => p.getPrimitiveTypeName == INT64 && tsMicros(true)
      case TimestampNTZType =>
        p.getPrimitiveTypeName == INT64 && tsMicros(false)
      case FloatType => p.getPrimitiveTypeName == FLOAT && ann == null
      case DoubleType => p.getPrimitiveTypeName == DOUBLE && ann == null
      case _ => false
    }
  }

  /** COMMIT-TIME per-file statistics for a freshly written generation
    * (the writer "harvests the footers it just wrote"): per file, its
    * exact row count and — for each requested LONG-channel column — the
    * footer [min, max] when every chunk's statistics are trustworthy
    * ([[statsTypeOk]]) and the file has non-null values; None for
    * all-null or unusable-stats files (readers must treat a missing
    * record as "must scan"). Result aligns with `files` by index.
    * Footer reads only — never a data page; concurrent over a bounded
    * pool for wide commits.
    */
  private[ops] def fileStats(files: Seq[String],
      conf: org.apache.hadoop.conf.Configuration,
      cols: Seq[String]): Seq[(Long, Seq[Option[(Long, Long)]])] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{INT32, INT64}
    import scala.jdk.CollectionConverters._
    def one(f: String): (Long, Seq[Option[(Long, Long)]]) = {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val fields = footer.getFileMetaData.getSchema.getFields.asScala.toSeq
        val per = cols.map { c =>
          fields.filter(_.getName.equalsIgnoreCase(c)) match {
            case Seq(field) if field.isPrimitive && {
              val p = field.asPrimitiveType
              (p.getPrimitiveTypeName == INT32 ||
                p.getPrimitiveTypeName == INT64) &&
                (p.getLogicalTypeAnnotation match {
                  case null => true
                  case i: IntLogicalTypeAnnotation => i.isSigned
                  case _ => false // date/decimal/unsigned: not the
                                  // plain-integer channel stats windows use
                })
            } =>
              val chunks = blocks.flatMap(_.getColumns.asScala
                .filter(_.getPath.toDotString == field.getName))
              val sts = chunks.map(_.getStatistics)
              if (sts.exists(st => st == null || !st.hasNonNullValue))
                None // all-null or untrustworthy somewhere: must-scan
              else sts.map(_.genericGetMin).zip(sts.map(_.genericGetMax))
                .foldLeft(Option.empty[(Long, Long)]) {
                  case (acc, (mn: java.lang.Number, mx: java.lang.Number)) =>
                    val (lo, hi) = (mn.longValue, mx.longValue)
                    Some(acc.fold((lo, hi)) { case (alo, ahi) =>
                      (math.min(alo, lo), math.max(ahi, hi)) })
                  case _ => None
                }
            case _ => None // absent, ambiguous-case, or non-integral
          }
        }
        (rows, per)
      } finally reader.close()
    }
    if (files.size <= 1) files.map(one)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, files.size))
      try files.map(f => pool.submit(
        new java.util.concurrent.Callable[(Long, Seq[Option[(Long, Long)]])] {
          override def call(): (Long, Seq[Option[(Long, Long)]]) = one(f)
        })).map(_.get())
      finally pool.shutdown()
    }
  }

  // one footer → one FilePartial; runs inside tasks
  private def readFooter(file: String,
      conf: org.apache.hadoop.conf.Configuration,
      names: Array[String],
      dts: Array[Option[DataType]]): FilePartial = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // resolve requested names CASE-INSENSITIVELY against this file's
      // schema (Spark analysis is case-insensitive, so an era written
      // as "NK" must serve a query's "nk" — an exact match would treat
      // the era as column-missing/all-null and silently drop its values)
      val fileFields = schema.getFields.asScala.toSeq
      val cols = names.indices.map { i =>
        val name = names(i)
        // a file carrying SEVERAL case-variants of the name (possible
        // only under spark.sql.caseSensitive=true histories) is
        // ambiguous — serve nothing rather than risk the wrong column
        // (the plan-time caseCollides gate refuses such tables up
        // front; this is the per-file defense in depth)
        fileFields.filter(_.getName.equalsIgnoreCase(name)) match {
          case Seq() => emptyCol // genuinely absent era: all-null, exact
          case ms if ms.size > 1 => emptyCol.copy(unserved = true)
          case Seq(field) =>
            val actual = field.getName
            val ok = dts(i) match {
              case Some(dt) => statsTypeOk(field, dt)
              // COUNT-only: null counts serve any PRIMITIVE type; a
              // complex column has no top-level chunk (its leaves do),
              // so an empty chunk list would silently count 0 — route
              // complex types to the exact fallback instead
              case None => field.isPrimitive
            }
            if (!ok) emptyCol.copy(unserved = true)
            else {
            val chunks = blocks.flatMap(_.getColumns.asScala
              .filter(_.getPath.toDotString == actual))
            chunks.foldLeft(emptyCol) { (acc, cc) =>
              if (acc.unserved) acc
              else {
                val st = cc.getStatistics
                // min/max present but nullCount unset poisons too: a
                // COUNT over the same column would silently undercount
                // (the spec list can't be consulted per chunk; modern
                // writers always set numNulls, so this never fires on
                // this engine's own files)
                if (st == null) acc.copy(unserved = true)
                else if (dts(i).isEmpty) {
                  // COUNT-only column (any type, strings included): the
                  // null count is all that is needed — never decode
                  // min/max, so binary stats truncation cannot poison it
                  if (st.isNumNullsSet) acc.copy(nonNull =
                    acc.nonNull + (cc.getValueCount - st.getNumNulls))
                  else acc.copy(unserved = true)
                } else if (st.hasNonNullValue) {
                  if (!st.isNumNullsSet) acc.copy(unserved = true)
                  else decodeMinMax(st) match {
                    case None => acc.copy(unserved = true)
                    case Some((lo, hi, loD, hiD)) =>
                      ColPartial(unserved = false, hasValues = true,
                        if (acc.hasValues) math.min(acc.minL, lo) else lo,
                        if (acc.hasValues) math.max(acc.maxL, hi) else hi,
                        if (acc.hasValues) math.min(acc.minD, loD) else loD,
                        if (acc.hasValues) math.max(acc.maxD, hiD) else hiD,
                        acc.nonNull + (cc.getValueCount - st.getNumNulls))
                  }
                } else if (st.isNumNullsSet &&
                    st.getNumNulls == cc.getValueCount) {
                  acc // provably all-null chunk: contributes nothing
                } else acc.copy(unserved = true) // indistinguishable
              }
            }
            }
        }
      }.toArray
      FilePartial(rows, cols)
    } finally reader.close()
  }
}
