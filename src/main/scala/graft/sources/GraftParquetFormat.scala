package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{BoolVec, BytesVec, ColVec, DoubleVec, FloatVec, IntVec, LongVec}

/** DataSource V2 front-end for [[ParquetSource]]:
  * `spark.read.format("graft.sources.GraftParquetFormat").load(dir)`.
  *
  * Catalyst drives the pushdown instead of manual parameters: column
  * pruning arrives via SupportsPushDownRequiredColumns (only requested
  * leaf chunks are decoded), and range/equality filters on INT32/INT64
  * columns arrive via SupportsPushDownFilters and turn into footer-stats
  * row-group pruning inside each task. All filters are also RETURNED as
  * residuals, so Spark re-applies them exactly — stats pruning stays a
  * sound superset, never a semantic change.
  *
  * The reference's read surface (`SerializedFileReader` + projection,
  * `/root/reference/src/file/reader.rs:258-283`) expressed the Spark-native
  * way; its row-group-filter TODO (reader.rs:198) is what the pushed
  * ranges realize.
  */
class GraftParquetFormat extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = GraftParquetFormat.pathOf(options)
    val fps = GraftParquetFormat.listFilesPartitioned(dir)
    // planning-time schema inference reads only the footer tail; Hive-style
    // k=v directory segments become trailing partition columns
    val base = ParquetSource.sparkSchema(
      ParquetFileReader.readFooterOnly(fps.head._1))
    StructType(base.fields ++ GraftParquetFormat.partitionFields(fps))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftParquetTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object GraftParquetFormat {
  /** The format name usable in `spark.read.format(...)`. */
  val Name: String = classOf[GraftParquetFormat].getName

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft parquet source requires .load(<path>)")
    p
  }

  private[sources] def listFiles(dir: String): Seq[String] =
    listFilesPartitioned(dir).map(_._1)

  /** Every `.parquet` file under `dir` (recursive, via [[GraftIO]] — local
    * paths and `scheme://` DFS paths alike) with the partition values
    * carried by its Hive-style `k=v` path segments plus the listed file
    * size. The coarsest pruning tier at scale: a partition-column predicate
    * drops whole directories before any footer is read. */
  private[sources] def listFilesPartitioned(dir: String):
      Seq[(String, Seq[(String, String)])] =
    listFilesPartitionedSized(dir).map { case (p, kvs, _) => (p, kvs) }

  /** Every data file under a (possibly hive-partitioned) parquet
    * directory with its on-disk size — the same walk the DSv2 scan uses
    * (arbitrary depth, `_`/`.` entries skipped, single-file inputs
    * accepted). Public for tools that size work from file listings
    * (e.g. EncodeMain's footer-driven partition auto-sizing). */
  def listDataFilesSized(dir: String): Seq[(String, Long)] =
    listFilesPartitionedSized(dir).map { case (p, _, len) => (p, len) }

  private[sources] def listFilesPartitionedSized(dir: String):
      Seq[(String, Seq[(String, String)], Long)] = {
    val io = GraftIO.forPath(dir)
    val out = Seq.newBuilder[(String, Seq[(String, String)], Long)]
    def walk(e: GraftIO.Entry, kvs: List[(String, String)]): Unit =
      if (!e.isDir) {
        if (e.name.endsWith(".parquet")) out += ((e.path, kvs.reverse, e.len))
      } else {
        io.list(e.path).foreach { c =>
          val n = c.name
          // skip metadata dirs/files (_lineage, _SUCCESS, .crc) — the same
          // convention Spark's own listing applies
          if (n.startsWith("_") || n.startsWith(".")) ()
          else {
            val i = n.indexOf('=')
            val kv =
              if (c.isDir && i > 0)
                Some((n.take(i), PartitionPath.unescape(n.drop(i + 1))))
              else None
            walk(c, kv.fold(kvs)(_ :: kvs))
          }
        }
      }
    val root = io.status(dir).getOrElse(
      throw new IllegalArgumentException(s"no such path: $dir"))
    if (!root.isDir) out += ((root.path, Nil, root.len)) else walk(root, Nil)
    val files = out.result()
    require(files.nonEmpty, s"no parquet files under $dir")
    val cols = files.head._2.map(_._1)
    require(files.forall(_._2.map(_._1) == cols),
      s"inconsistent partition directories under $dir")
    files
  }

  /** Trailing partition StructFields: LongType when every directory value
    * parses as a long, StringType otherwise. */
  private[sources] def partitionFields(
      fps: Seq[(String, Seq[(String, String)])]): Seq[StructField] = {
    val cols = fps.head._2.map(_._1)
    cols.zipWithIndex.map { case (c, i) =>
      val allLong = fps.forall(f => f._2(i)._2.matches("-?\\d{1,18}"))
      StructField(c,
        if (allLong) LongType else org.apache.spark.sql.types.StringType,
        nullable = false)
    }
  }

  /** Partition column names of `dir` (empty for a flat directory). */
  private[sources] def partitionColsOf(dir: String): Seq[String] =
    listFilesPartitioned(dir).head._2.map(_._1)
}

final class GraftParquetTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-parquet $dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir, info.schema(), info.options())
}

/** DSv2 write path: each task streams its rows through one
  * [[ParquetFileWriter.IncrementalFileWriter]] into a uniquely-named part
  * file; `truncate` (SaveMode.Overwrite) clears existing part files first.
  * Options: `codec` (snappy|gzip|zstd|lz4_raw|uncompressed), `pageVersion`
  * (1|2), `rowGroupRows`, plus per-COLUMN overrides (the reference's
  * WriterProperties surface, properties.rs:101-210) as dotted option
  * keys — `enc.<col>=delta|deltalen|deltabyte|plain|rle|bss` pins that
  * column's fallback encoding, `dict.<col>=false` disables its
  * dictionary, `codec.<col>=gzip` overrides its block codec,
  * `stats.<col>=false` drops its statistics. Unknown column paths fail
  * the write up front (see [[WriterProps]]). */
final class GraftWriteBuilder(dir: String, schema: StructType,
    options: CaseInsensitiveStringMap)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(dir, schema,
      doTruncate,
      options.getOrDefault("codec", "snappy"),
      options.getInt("pageversion", 1),
      options.getInt("rowgrouprows", 1 << 16),
      // comma-separated flat columns to stamp split-block bloom filters for
      options.getOrDefault("bloomcols", "").split(',').map(_.trim)
        .filter(_.nonEmpty).toSet,
      // fallback value-encoding policy: plain | v2 | auto (EncPolicy)
      EncPolicy.parse(options.getOrDefault("enc", "plain")),
      {
        import scala.jdk.CollectionConverters._
        WriterProps.fromOptions(options.asScala)
      })
  }
}

final class GraftBatchWrite(dir: String, schema: StructType,
    truncate: Boolean, codecName: String, pageVersion: Int,
    rowGroupRows: Int, bloomCols: Set[String] = Set.empty,
    encPolicy: Int = EncPolicy.Plain,
    props: WriterProps = WriterProps.empty) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val io = GraftIO.forPath(dir)
    io.mkdirs(dir)
    val codec = PqCodec.parse(codecName)
    // fail misconfigured per-column props at the DRIVER, before any task —
    // and BEFORE the Overwrite truncation below: validating after the
    // delete would destroy the existing table on a typo'd column path
    if (!props.isEmpty) props.resolveFor(schema, codec)
    if (truncate)
      io.list(dir).filter(e => !e.isDir && e.name.endsWith(".parquet"))
        .foreach(e => io.delete(e.path))
    new GraftWriterFactory(dir, schema, codec, pageVersion, rowGroupRows,
      bloomCols, encPolicy, props)
  }
  // Task output is staged under a dot-prefixed name (invisible to every
  // scan listing, ours and Spark's) and renamed to its final name only at
  // task commit — Spark's commit coordinator guarantees a single winning
  // attempt, so a lost executor or mid-write crash can leave only ignored
  // `.…inprogress` garbage, never a duplicate or truncated `.parquet`.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // job-level sweep of staging leftovers from failed/zombie attempts
    val io = GraftIO.forPath(dir)
    io.list(dir).filter(e => !e.isDir && e.name.endsWith(".inprogress"))
      .foreach(e => io.delete(e.path))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val io = GraftIO.forPath(dir)
    messages.foreach {
      case GraftCommit(p, _) => io.delete(p)
      case _ => ()
    }
    io.list(dir).filter(e => !e.isDir && e.name.endsWith(".inprogress"))
      .foreach(e => io.delete(e.path))
  }
}

final class GraftWriterFactory(dir: String, schema: StructType, codec: Int,
    pageVersion: Int, rowGroupRows: Int,
    bloomCols: Set[String] = Set.empty,
    encPolicy: Int = EncPolicy.Plain,
    props: WriterProps = WriterProps.empty) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir,
      f"part-$partitionId%05d-$taskId.parquet",
      schema, codec, pageVersion, rowGroupRows, bloomCols, encPolicy, props)
}

final case class GraftCommit(path: String, rows: Long)
  extends WriterCommitMessage

final class GraftDataWriter(dir: String, fileName: String,
    schema: StructType, codec: Int,
    pageVersion: Int, rowGroupRows: Int,
    bloomCols: Set[String] = Set.empty,
    encPolicy: Int = EncPolicy.Plain,
    props: WriterProps = WriterProps.empty) extends DataWriter[InternalRow] {
  private val stagePath = s"$dir/.$fileName.inprogress"
  private val finalPath = s"$dir/$fileName"
  private val w = new ParquetFileWriter.IncrementalFileWriter(stagePath,
    schema, rowGroupRows, codec, pageVersion, bloomCols,
    encPolicy = encPolicy, props = props)
  // catalyst rows feed the writer directly — the builders copy every value
  // out inside add(), so Spark's row reuse is safe (no per-row external
  // conversion, which round 2 paid here)
  override def write(r: InternalRow): Unit = w.add(r)
  override def commit(): WriterCommitMessage = {
    val rows = w.close()
    GraftIO.forPath(dir).rename(stagePath, finalPath)
    GraftCommit(finalPath, rows)
  }
  override def abort(): Unit = {
    try w.close() catch { case _: Throwable => () }
    GraftIO.forPath(stagePath).delete(stagePath)
  }
  override def close(): Unit = ()
}

final class GraftScanBuilder(dir: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var ranges: Map[String, (Long, Long)] = Map.empty
  // string-column byte ranges (UTF-8, unsigned lexicographic like the
  // footer's byte-array stats); a null side is unbounded
  private var strRanges: Map[String, (Array[Byte], Array[Byte])] = Map.empty
  // one entry per pushed equality/IN conjunct: (column, candidate values —
  // Long for int columns, UTF-8 bytes for string columns). Feeds bloom-filter
  // row-group pruning; a row group survives only if EVERY conjunct has at
  // least one candidate its bloom filter might contain.
  private var eqProbes: Seq[(String, Seq[Any])] = Nil
  private var limit: Int = -1
  private var sawFilters = false
  private var aggSpecs: Option[Seq[GraftAggSpec]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands a subset of fullSchema (possibly reordered)
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters ||= filters.nonEmpty
    val longCols = fullSchema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType => f.name
    }.toSet
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def tighten(col: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(col, (Long.MinValue, Long.MaxValue))
      ranges += col -> (math.max(l0, lo), math.min(h0, hi))
    }
    val strCols = fullSchema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSet
    def utf8(v: Any): Option[Array[Byte]] = v match {
      case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
    def tightenStr(col: String, lo: Array[Byte], hi: Array[Byte]): Unit = {
      val (l0, h0) = strRanges.getOrElse(col, (null, null))
      val l =
        if (l0 == null) lo else if (lo == null) l0
        else if (graft.core.MinMax.compareBytes(lo, l0) > 0) lo else l0
      val h =
        if (h0 == null) hi else if (hi == null) h0
        else if (graft.core.MinMax.compareBytes(hi, h0) < 0) hi else h0
      strRanges += col -> (l, h)
    }
    /** Smallest byte string that is > every string with prefix `p`, or null
      * when p is all 0xFF (no finite bound). Over-inclusive is fine — all
      * filters stay residual. */
    def prefixUpper(p: Array[Byte]): Array[Byte] = {
      var i = p.length - 1
      while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
      if (i < 0) null
      else {
        val u = java.util.Arrays.copyOf(p, i + 1)
        u(i) = (u(i) + 1).toByte
        u
      }
    }
    val usable = filters.filter {
      case EqualTo(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get, num(v).get)
        eqProbes :+= ((c, Seq[Any](num(v).get))); true
      case GreaterThan(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get + 1, Long.MaxValue); true
      case GreaterThanOrEqual(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get, Long.MaxValue); true
      case LessThan(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, Long.MinValue, num(v).get - 1); true
      case LessThanOrEqual(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, Long.MinValue, num(v).get); true
      // string predicates prune on the footer's byte-array stats; bound
      // exclusivity is ignored (conservative — filters stay residual)
      case EqualTo(c, v) if strCols(c) && utf8(v).isDefined =>
        tightenStr(c, utf8(v).get, utf8(v).get)
        eqProbes :+= ((c, Seq[Any](utf8(v).get))); true
      case GreaterThan(c, v) if strCols(c) && utf8(v).isDefined =>
        tightenStr(c, utf8(v).get, null); true
      case GreaterThanOrEqual(c, v) if strCols(c) && utf8(v).isDefined =>
        tightenStr(c, utf8(v).get, null); true
      case LessThan(c, v) if strCols(c) && utf8(v).isDefined =>
        tightenStr(c, null, utf8(v).get); true
      case LessThanOrEqual(c, v) if strCols(c) && utf8(v).isDefined =>
        tightenStr(c, null, utf8(v).get); true
      case StringStartsWith(c, p) if strCols(c) =>
        val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        tightenStr(c, pb, prefixUpper(pb)); true
      // IN-set → its [min, max] envelope (the set stays residual, so gaps
      // inside the envelope cost nothing but a missed skip)
      case In(c, vs) if longCols(c) && vs.nonEmpty &&
          vs.forall(num(_).isDefined) =>
        val ns = vs.map(num(_).get)
        tighten(c, ns.min, ns.max)
        eqProbes :+= ((c, ns.toSeq)); true
      case In(c, vs) if strCols(c) && vs.nonEmpty &&
          vs.forall(utf8(_).isDefined) =>
        val bs = vs.map(utf8(_).get)
        eqProbes :+= ((c, bs.toSeq))
        tightenStr(c, bs.reduce((a, b) =>
          if (graft.core.MinMax.compareBytes(a, b) <= 0) a else b),
          bs.reduce((a, b) =>
            if (graft.core.MinMax.compareBytes(a, b) >= 0) a else b)); true
      case _ => false
    }
    pushed = usable
    // every filter stays a residual: stats pruning is a superset filter
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Limit pushdown (partial): each task stops decoding once it has
    * produced `limit` rows — whole trailing row groups are skipped. Spark
    * still applies the global limit on top. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** Footer-stats aggregate pushdown: `count(*)` is answered from row-group
    * row counts and `min`/`max` over INT32/INT64 columns from footer
    * statistics — no page is decompressed or decoded. Partial pushdown
    * (one row per file; Spark merges), refused whenever any filter is
    * present: we keep all filters as residuals, so a filtered aggregate
    * must see the raw rows. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (sawFilters || agg.groupByExpressions.nonEmpty) return false
    // partition columns live in directory names, not footers — refuse
    lazy val partCols = GraftParquetFormat.partitionColsOf(dir).toSet
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        fullSchema.fields.find(_.name == nr.fieldNames()(0)).collect {
          case f if (f.dataType == LongType || f.dataType == IntegerType) &&
            !partCols(f.name) => f.name
        }
      case _ => None
    }
    val specs = agg.aggregateExpressions.map {
      case _: CountStar => Some(GraftAggSpec(GraftAggSpec.CountStar, null))
      case m: Min => colOf(m.column).map(GraftAggSpec(GraftAggSpec.Min, _))
      case m: Max => colOf(m.column).map(GraftAggSpec(GraftAggSpec.Max, _))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) false
    else { aggSpecs = Some(specs.toSeq.map(_.get)); true }
  }

  override def build(): Scan = aggSpecs match {
    case Some(specs) => new GraftAggScan(dir, fullSchema, specs)
    case None => new GraftScan(dir, required, ranges, limit, strRanges, eqProbes)
  }
}

/** One pushed aggregate: `kind` ∈ {CountStar, Min, Max}, `col` null for
  * CountStar. */
final case class GraftAggSpec(kind: Int, col: String)

object GraftAggSpec {
  val CountStar = 0
  val Min = 1
  val Max = 2
}

/** Scan for pushed aggregates: one output row per file, computed entirely
  * from the footer (row counts + column statistics). If a row group lacks
  * stats for a min/max column, only that column of that row group is
  * decoded as the fallback. At 100 TB this turns `SELECT count(*)` into a
  * footer-tail read per file. */
final class GraftAggScan(dir: String, fullSchema: StructType,
    specs: Seq[GraftAggSpec]) extends Scan with Batch {

  private val outSchema = StructType(specs.map { s =>
    s.kind match {
      case GraftAggSpec.CountStar => StructField("count(*)", LongType, nullable = false)
      case k =>
        val f = fullSchema.fields.find(_.name == s.col).get
        val name = if (k == GraftAggSpec.Min) s"min(${s.col})" else s"max(${s.col})"
        StructField(name, f.dataType, nullable = true)
    }
  })

  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"GraftParquetAggScan[$dir] ${outSchema.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    GraftParquetFormat.listFiles(dir)
      .map(p => GraftFilePartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory(fullSchema, specs, outSchema)
}

final class GraftAggReaderFactory(fullSchema: StructType,
    specs: Seq[GraftAggSpec], outSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftAggPartitionReader(
      p.asInstanceOf[GraftFilePartition].path, fullSchema, specs, outSchema)
}

final class GraftAggPartitionReader(path: String, fullSchema: StructType,
    specs: Seq[GraftAggSpec], outSchema: StructType)
    extends PartitionReader[InternalRow] {

  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    done = true
    val meta = ParquetFileReader.readFooterOnly(path)
    def extreme(col: String, wantMax: Boolean): Option[Long] = {
      val perGroup = meta.rowGroups.indices.flatMap { rg =>
        val cm = meta.rowGroups(rg).columns.find(
          _.pathInSchema.headOption.contains(col))
        cm.flatMap(_.stats) match {
          case Some(st) if st.min.nonEmpty && st.max.nonEmpty =>
            Some(graft.core.MinMax.leToLong(if (wantMax) st.max else st.min))
          case _ => // stats missing (rare): read + decode ONLY this chunk
            val lc = ParquetFileReader.leafColumns(meta, rg)
              .find(_.path == Seq(col)).get
            val fetch = new ParquetFileReader.ChunkFetcher(path)
            val t =
              try {
                val (b, l2) = fetch.fetchLeaf(lc)
                ParquetFileReader.readTriplets(b, l2)
              } finally fetch.close()
            val vs: Seq[Long] = t.values.map {
              case i: Int => i.toLong
              case l: Long => l
            }.toSeq
            if (vs.isEmpty) None
            else Some(if (wantMax) vs.max else vs.min)
        }
      }
      if (perGroup.isEmpty) None
      else Some(if (wantMax) perGroup.max else perGroup.min)
    }
    val values: Seq[Any] = specs.zip(outSchema.fields).map { case (s, f) =>
      s.kind match {
        case GraftAggSpec.CountStar => meta.numRows
        case k =>
          val v = extreme(s.col, wantMax = k == GraftAggSpec.Max)
          if (f.dataType == IntegerType) v.map(_.toInt).orNull else v.orNull
      }
    }
    row = CatalystTypeConverters.createToCatalystConverter(outSchema)(
      org.apache.spark.sql.Row.fromSeq(values)).asInstanceOf[InternalRow]
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

object GraftScan {
  /** Above this many files, planning skips the per-file footer-tail reads
    * (row-group split + driver-side pruning) to keep the driver O(listing). */
  val FooterPlanLimit = 4096
}

final class GraftScan(dir: String, schema: StructType,
    ranges: Map[String, (Long, Long)], limit: Int = -1,
    strRanges: Map[String, (Array[Byte], Array[Byte])] = Map.empty,
    eqProbes: Seq[(String, Seq[Any])] = Nil)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  // Planning-time pushdown, possibly narrowed further at RUNTIME: when this
  // scan is the probe side of a DPP-eligible join, Spark executes the
  // (filtered, broadcast) build side first and hands its join-key values
  // here via filter() before planInputPartitions() runs — so a dim-table
  // predicate prunes fact-table directories, row groups, and bloom-filtered
  // pages it never named directly. The 100 TB shape: a 1000-file fact scan
  // joined to a 5-row dim schedules only the matching keys' row groups.
  private var rtRanges = ranges
  private var rtStrRanges = strRanges
  private var rtEqProbes = eqProbes
  private var runtimeNarrowedCols: Seq[String] = Nil

  /** Columns runtime join-key filters may prune on (every scalar column —
    * the envelope + bloom machinery works for int and string alike). */
  override def filterAttributes(): Array[NamedReference] =
    schema.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == org.apache.spark.sql.types.StringType =>
        Expressions.column(f.name)
    }

  /** Runtime narrowing: IN/= predicates over declared attributes tighten
    * the stat envelopes and join the bloom-probe set; anything unparseable
    * is ignored (over-inclusive = sound — Spark still applies the join). */
  override def filter(predicates: Array[Predicate]): Unit = {
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    def litOf(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[Any] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Option(l.value)
      case _ => None
    }
    val longCols = schema.fields.collect {
      case f if f.dataType == LongType || f.dataType == IntegerType => f.name
    }.toSet
    val strCols = schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSet
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def utf8(v: Any): Option[Array[Byte]] = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
      case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
    predicates.foreach { p =>
      val vals: Option[(String, Seq[Any])] = p.name() match {
        case "IN" | "=" if p.children().nonEmpty =>
          for {
            c <- colOf(p.children()(0))
            vs <- Some(p.children().drop(1).toSeq.map(litOf))
            if vs.nonEmpty && vs.forall(_.isDefined)
          } yield (c, vs.map(_.get))
        case _ => None
      }
      vals.foreach { case (c, vs) =>
        if (longCols(c) && vs.forall(num(_).isDefined)) {
          val ns = vs.map(num(_).get)
          val (l0, h0) = rtRanges.getOrElse(c, (Long.MinValue, Long.MaxValue))
          rtRanges += c -> (math.max(l0, ns.min), math.min(h0, ns.max))
          rtEqProbes :+= ((c, ns))
          runtimeNarrowedCols :+= c
        } else if (strCols(c) && vs.forall(utf8(_).isDefined)) {
          val bs = vs.map(utf8(_).get)
          val lo = bs.reduce((a, b) =>
            if (graft.core.MinMax.compareBytes(a, b) <= 0) a else b)
          val hi = bs.reduce((a, b) =>
            if (graft.core.MinMax.compareBytes(a, b) >= 0) a else b)
          val (l0, h0) = rtStrRanges.getOrElse(c, (null, null))
          val l = if (l0 == null || graft.core.MinMax.compareBytes(lo, l0) > 0) lo else l0
          val h = if (h0 == null || graft.core.MinMax.compareBytes(hi, h0) < 0) hi else h0
          rtStrRanges += c -> (l, h)
          rtEqProbes :+= ((c, bs.toSeq))
          runtimeNarrowedCols :+= c
        }
      }
    }
  }

  /** Columns runtime filter() actually narrowed on (test/observability). */
  def runtimeFilteredColumns: Seq[String] = runtimeNarrowedCols.distinct

  override def readSchema(): StructType = schema
  override def description(): String =
    s"GraftParquetScan[$dir] cols=${schema.fieldNames.mkString(",")}" +
      (if (rtRanges.nonEmpty) s" ranges=$rtRanges" else "") +
      (if (rtStrRanges.nonEmpty) " strRanges=" + rtStrRanges.map { case (c, (l, h)) =>
        def r(b: Array[Byte]) = if (b == null) "*"
          else new String(b, java.nio.charset.StandardCharsets.UTF_8)
        s"$c:[${r(l)},${r(h)}]"
      }.mkString(",") else "") +
      (if (rtEqProbes.nonEmpty)
        s" eqProbes=${rtEqProbes.map(p => s"${p._1}(${p._2.size})").mkString(",")}"
       else "") +
      (if (limit >= 0) s" limit=$limit" else "")
  override def toBatch: Batch = this

  /** Row-group-granular scheduling with PLANNING-time stat pruning: one
    * footer-tail read per file on the driver turns each surviving row
    * group into its own task, so (a) a single huge file parallelizes
    * across executors instead of serializing into one task, and (b) files
    * and row groups excluded by pushed ranges never get a task at all.
    * Past [[GraftScan.FooterPlanLimit]] files the driver skips the footer
    * reads (planning stays O(listing) on huge directories) and falls back
    * to per-file tasks with the same pruning done task-side. */
  // ONE recursive listing per scan, shared by planInputPartitions and
  // estimateStatistics — at million-file scale every extra walk is one
  // RPC per directory on a remote filesystem. (A Scan instance is
  // per-query, so this can never serve a stale listing across queries.)
  private lazy val listingSized
      : Seq[(String, Seq[(String, String)], Long)] =
    GraftParquetFormat.listFilesPartitionedSized(dir)

  override def planInputPartitions(): Array[InputPartition] = {
    // Hive-style partition pruning first — the coarsest tier: a pushed
    // range on a partition column drops whole directories before any
    // footer is touched
    val files = listingSized.map { case (p, kvs, _) => (p, kvs) }.filter {
      case (_, kvs) => kvs.forall { case (k, v) =>
        val longOk = rtRanges.get(k).forall { case (lo, hi) =>
          scala.util.Try(v.toLong).toOption.forall(x => x >= lo && x <= hi)
        }
        val strOk = rtStrRanges.get(k).forall { case (lo, hi) =>
          val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (lo == null || graft.core.MinMax.compareBytes(b, lo) >= 0) &&
            (hi == null || graft.core.MinMax.compareBytes(b, hi) <= 0)
        }
        longOk && strOk
      }
    }
    if (files.length > GraftScan.FooterPlanLimit)
      files.map { case (p, kvs) =>
        GraftFilePartition(p, partValues = kvs): InputPartition
      }.toArray
    else files.flatMap { case (p, kvs) =>
      val meta = ParquetFileReader.readFooterOnly(p)
      val flatOk = GraftFlatScan.isFlat(meta)
      var rgs: Seq[Int] = meta.rowGroups.indices
      rtRanges.foreach { case (c, (lo, hi)) =>
        val keep = ParquetFileReader.rowGroupsInRange(meta, c, lo, hi).toSet
        rgs = rgs.filter(keep)
      }
      rtStrRanges.foreach { case (c, (lo, hi)) =>
        val keep =
          ParquetFileReader.rowGroupsInRangeBytes(meta, c, lo, hi).toSet
        rgs = rgs.filter(keep)
      }
      rgs.map(rg =>
        GraftFilePartition(p, Seq(rg), flatOk, kvs): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema, rtRanges, limit, rtStrRanges, rtEqProbes)

  /** Exact row count + uncompressed byte size from footer tails only —
    * feeds Catalyst's join planning (a small graft-parquet table becomes
    * broadcast-joinable without a manual hint). Capped like
    * [[planInputPartitions]]: past [[GraftScan.FooterPlanLimit]] files the
    * driver reads only a bounded SAMPLE of footers to learn the
    * uncompressed/on-disk expansion ratio and extrapolates over the listing
    * sizes — a directory of a million files must never cost a million
    * driver RPCs, but the estimate must stay in UNCOMPRESSED bytes on both
    * sides of the cap (summed on-disk sizes of a zstd table under-estimate
    * several-fold and could flip Catalyst into broadcasting a table that
    * explodes in memory). */
  override def estimateStatistics(): Statistics = {
    val files = listingSized
    if (files.length > GraftScan.FooterPlanLimit) {
      val onDisk = files.map(_._3).sum
      // a directory this large is plausibly being written concurrently:
      // an in-flight/zero-byte/corrupt sample file must degrade the
      // ESTIMATE (skip it), not fail query planning — stats here are
      // advisory, and the pre-sampling fallback never did file I/O at all
      // EVENLY-SPACED sample, not a prefix: listings are name-sorted, so
      // the first 64 files are typically one Hive partition — if that
      // partition happens to hold incompressible data its ratio ~1 would
      // under-estimate the whole table and flip Catalyst into broadcasting
      // something that explodes in memory. Striding the listing samples
      // every partition range.
      val n = files.length
      val sample = Array.tabulate(64)(i => files((i.toLong * n / 64).toInt))
      val (sUnc, sDisk) = sample.foldLeft((0L, 0L)) {
        case ((u, d), (f, _, sz)) =>
          scala.util.Try(ParquetFileReader.readFooterOnly(f)) match {
            case scala.util.Success(m) =>
              (u + m.rowGroups.map(_.totalByteSize).sum, d + sz)
            case scala.util.Failure(_) => (u, d)
          }
      }
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          // no readable sample (e.g. the table is mid-write): report NO
          // estimate rather than a ratio-1.0 guess — Spark then falls back
          // to defaultSizeInBytes, which never triggers a broadcast
          if (sDisk > 0)
            java.util.OptionalLong.of(
              math.max(onDisk, (onDisk * (sUnc.toDouble / sDisk)).toLong))
          else java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
      }
    } else {
      var rows = 0L
      var bytes = 0L
      files.foreach { case (f, _, _) =>
        val m = ParquetFileReader.readFooterOnly(f)
        rows += m.numRows
        bytes += m.rowGroups.map(_.totalByteSize).sum
      }
      val (r, b) = (rows, bytes)
      new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(b)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(r)
      }
    }
  }
}

/** One scan task: a file, or a slice of its row groups (`rgs == null` ⇒
  * all, with stat pruning done task-side). `flatOk` is stamped at planning
  * time (footer already in hand) and gates the columnar fast path — only a
  * fully flat file qualifies; the >FooterPlanLimit fallback leaves it
  * false, keeping the always-correct row path. */
final case class GraftFilePartition(path: String, rgs: Seq[Int] = null,
    flatOk: Boolean = false,
    partValues: Seq[(String, String)] = Nil) extends InputPartition

/** Shared flat-scan core: row-group + page-level pruning resolved into
  * column-major value batches (nulls inline, strings as raw UTF-8 bytes).
  * Feeds both the columnar batch reader and the page-pruned row path. */
private[sources] object GraftFlatScan {

  /** Root group of primitives only — no nesting, no repeated fields. */
  def isFlat(meta: PqFileMeta): Boolean = meta.schema.size > 1 &&
    meta.schema.drop(1).forall(se => se.numChildren == 0 && se.repetition != 2)

  /** Row groups surviving the pushed ranges (planning-time list reused
    * when present — re-filtering stat ranges is a no-op). */
  def pruneRowGroups(meta: PqFileMeta, plannedRgs: Seq[Int],
      ranges: Map[String, (Long, Long)],
      strRanges: Map[String, (Array[Byte], Array[Byte])]): Seq[Int] = {
    var rgs: Seq[Int] =
      if (plannedRgs != null) plannedRgs else meta.rowGroups.indices
    ranges.foreach { case (col, (lo, hi)) =>
      val keep = ParquetFileReader.rowGroupsInRange(meta, col, lo, hi).toSet
      rgs = rgs.filter(keep)
    }
    strRanges.foreach { case (col, (lo, hi)) =>
      val keep =
        ParquetFileReader.rowGroupsInRangeBytes(meta, col, lo, hi).toSet
      rgs = rgs.filter(keep)
    }
    rgs
  }

  /** Bloom-filter row-group pruning for pushed equality/IN conjuncts:
    * drops a surviving row group when some conjunct's bloom filter rules
    * out every candidate value. Task-side by design — the driver's
    * planning stays footer-tail-only, and each bloom read is one small
    * ranged read that happens INSTEAD of fetching the group's chunks.
    * Chunks without a filter (or with an unparseable one) always survive;
    * residual Spark filters keep semantics exact either way. */
  def bloomPrune(path: String, meta: PqFileMeta, rgs: Seq[Int],
      eqProbes: Seq[(String, Seq[Any])]): Seq[Int] = {
    if (eqProbes.isEmpty || rgs.isEmpty) return rgs
    val anyBloom = rgs.exists(rg => eqProbes.exists { case (c, _) =>
      ParquetFileReader.chunkFor(meta, rg, c).exists(_.bloomOffset >= 0)
    })
    if (!anyBloom) return rgs
    val in = GraftIO.forPath(path).open(path)
    try {
      rgs.filter { rg =>
        eqProbes.forall { case (col, values) =>
          ParquetFileReader.chunkFor(meta, rg, col) match {
            case Some(cm) if cm.bloomOffset >= 0 =>
              val hashes = values.flatMap(v => Sbbf.hashForType(cm.typ, v))
              // any unhashable candidate ⇒ the conjunct can't be decided
              // by the bloom ⇒ keep the group
              hashes.length != values.length ||
                Sbbf.readFromFile(in, cm).forall(f =>
                  hashes.exists(f.mightContainHash))
            case _ => true
          }
        }
      }
    } finally in.close()
  }

  /** Projected columns' values for one row group: page statistics of the
    * filter columns narrow the decoded row ranges; only overlapping pages
    * of projected chunks are decoded, and only fetched chunks are read
    * from disk at all. Residual Spark-side filters re-apply afterwards, so
    * a stat-less page surviving is only a missed skip, never a wrong row. */
  def columnBatch(fetch: ParquetFileReader.ChunkFetcher, meta: PqFileMeta,
      rg: Int, fields: Array[StructField],
      ranges: Map[String, (Long, Long)],
      strRanges: Map[String, (Array[Byte], Array[Byte])]):
      (Array[IndexedSeq[Any]], Int) = {
    // fetched (buffer, rebased meta) per column name: a filter column that
    // is also projected reads its byte range once, not twice
    val cache = scala.collection.mutable.Map.empty[String,
      (Array[Byte], PqColumnMeta)]
    def fetched(name: String, cm: PqColumnMeta): (Array[Byte], PqColumnMeta) =
      cache.getOrElseUpdate(name, fetch.fetch(cm))
    val nRows = meta.rowGroups(rg).numRows
    var keep: Seq[(Long, Long)] = Seq((0L, nRows))
    // page row ranges passing `keepFn` for one filter column: from the
    // footer-side ColumnIndex/OffsetIndex when the writer stamped them
    // (two tiny ranged reads, NO chunk bytes — a filter-only column's
    // chunk is then never fetched at all), else by walking page headers
    // inside the fetched chunk
    def colRanges(c: String, cm: PqColumnMeta,
        keepFn: PqStats => Boolean): Seq[(Long, Long)] =
      if (cm.columnIndexOffset >= 0 && cm.columnIndexLength > 0 &&
          cm.offsetIndexOffset >= 0 && cm.offsetIndexLength > 0) {
        val ci = ParquetMeta.parseColumnIndex(
          fetch.range(cm.columnIndexOffset, cm.columnIndexLength), 0)
        val oi = ParquetMeta.parseOffsetIndex(
          fetch.range(cm.offsetIndexOffset, cm.offsetIndexLength), 0)
        ParquetFileReader.indexRowRanges(ci, oi, nRows, keepFn)
      } else {
        val (b, rcm) = fetched(c, cm)
        ParquetFileReader.pageRowRanges(b, rcm, keepFn)
      }
    ranges.foreach { case (c, (lo, hi)) =>
      ParquetFileReader.chunkFor(meta, rg, c).foreach { cm =>
        keep = ParquetFileReader.intersectRowRanges(keep,
          colRanges(c, cm, st => ParquetFileReader.intStatsOverlap(st, lo, hi)))
      }
    }
    strRanges.foreach { case (c, (lo, hi)) =>
      ParquetFileReader.chunkFor(meta, rg, c).foreach { cm =>
        keep = ParquetFileReader.intersectRowRanges(keep,
          colRanges(c, cm, st => ParquetFileReader.byteStatsOverlap(st, lo, hi)))
      }
    }
    if (keep.isEmpty) return (fields.map(_ => IndexedSeq.empty[Any]), 0)
    val kept = keep.map(r => r._2 - r._1).sum.toInt
    val byName = ParquetFileReader.flatColumns(meta, rg)
      .map(c => c.name -> c).toMap
    val whole = keep == Seq((0L, nRows))
    (fields.map { f =>
      val col = byName(f.name)
      val (b, rcm) = fetched(f.name, col.meta)
      val rebased = col.copy(meta = rcm)
      if (whole) ParquetFileReader.readColumn(b, rebased)
      else ParquetFileReader.readColumnRowRanges(b, rebased, keep)
    }, kept)
  }

  /** Spark types the columnar fill supports (covers every flat type our
    * writer emits except decimals). */
  def columnarType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | DateType | TimestampType => true
      case _ => false
    }
  }
}

final class GraftReaderFactory(schema: StructType,
    ranges: Map[String, (Long, Long)], limit: Int = -1,
    strRanges: Map[String, (Array[Byte], Array[Byte])] = Map.empty,
    eqProbes: Seq[(String, Seq[Any])] = Nil)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftFilePartition]
    new GraftPartitionReader(fp.path, schema, ranges, limit, strRanges,
      fp.rgs, fp.partValues, eqProbes)
  }

  /** Columnar fast path: flat file (stamped at planning) + supported
    * types. Spark then plans a codegen'd ColumnarToRow instead of this
    * source converting row-by-row through external Rows. */
  override def supportColumnarReads(p: InputPartition): Boolean =
    p.asInstanceOf[GraftFilePartition].flatOk && schema.nonEmpty &&
      schema.fields.forall(f => GraftFlatScan.columnarType(f.dataType))

  override def createColumnarReader(p: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val fp = p.asInstanceOf[GraftFilePartition]
    new GraftColumnarPartitionReader(fp.path, schema, ranges, limit,
      strRanges, fp.rgs, fp.partValues, eqProbes)
  }
}

/** Vectorized scan output: one ColumnarBatch per (pruned) row group,
  * values filled straight from the decode layer — no external Row, no
  * per-row converter, and string bytes go into the vector without ever
  * materializing a java.lang.String. */
final class GraftColumnarPartitionReader(path: String, schema: StructType,
    ranges: Map[String, (Long, Long)], limit: Int,
    strRanges: Map[String, (Array[Byte], Array[Byte])],
    plannedRgs: Seq[Int],
    partValues: Seq[(String, String)] = Nil,
    eqProbes: Seq[(String, Seq[Any])] = Nil)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val partMap = partValues.toMap
  private val fileFields = schema.fields.filter(f => !partMap.contains(f.name))
  private val fileRanges = ranges.filter(kv => !partMap.contains(kv._1))
  private val fileStrRanges = strRanges.filter(kv => !partMap.contains(kv._1))
  private val fileEqProbes = eqProbes.filter(p => !partMap.contains(p._1))

  private val meta = ParquetFileReader.readFooterOnly(path)
  private val rgIt = GraftFlatScan.bloomPrune(path, meta,
    GraftFlatScan.pruneRowGroups(meta, plannedRgs, fileRanges, fileStrRanges),
    fileEqProbes).iterator
  private var remaining = if (limit >= 0) limit else Int.MaxValue
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    while (rgIt.hasNext && remaining > 0) {
      val rg = rgIt.next()
      val fetch = new ParquetFileReader.ChunkFetcher(path)
      val vecsAndRows =
        try {
          if (fileRanges.isEmpty && fileStrRanges.isEmpty) typedBatch(fetch, rg)
          else boxedBatch(fetch, rg)
        } finally fetch.close()
      vecsAndRows match {
        case Some((vecs, n0)) =>
          val n = math.min(n0, remaining)
          if (n > 0) {
            batch = new ColumnarBatch(
              vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
            remaining -= n
            return true
          }
        case None => ()
      }
    }
    false
  }

  /** Constant vector for a partition column (value from the directory). */
  private def constVec(dt: org.apache.spark.sql.types.DataType,
      raw: String, n: Int): OnHeapColumnVector = {
    val v = new OnHeapColumnVector(n, dt)
    if (dt == LongType) v.putLongs(0, n, raw.toLong)
    else {
      val b = raw.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < n) { v.putByteArray(i, b, 0, b.length); i += 1 }
    }
    v
  }

  /** Whole-row-group typed path: each chunk decodes straight to a ColVec
    * and is handed to Spark ZERO-COPY behind a [[GraftColumnVector]] view —
    * primitives read from the decode arrays in place, strings are
    * UTF8String views over the arena bytes. INT96/FLBA chunks fall back to
    * the boxed fill per column; partition columns become constant vectors. */
  private def typedBatch(fetch: ParquetFileReader.ChunkFetcher,
      rg: Int): Option[(Seq[org.apache.spark.sql.vectorized.ColumnVector],
        Int)] = {
    val byName = ParquetFileReader.flatColumns(meta, rg)
      .map(c => c.name -> c).toMap
    val nRows = meta.rowGroups(rg).numRows.toInt
    if (nRows <= 0) return None
    val vecs = schema.fields.map { f =>
      if (partMap.contains(f.name))
        constVec(f.dataType, partMap(f.name), nRows):
          org.apache.spark.sql.vectorized.ColumnVector
      else {
        val col = byName(f.name)
        val (b, rcm) = fetch.fetch(col.meta)
        val rebased = col.copy(meta = rcm)
        if (col.typ == PqType.Int96 || col.typ == PqType.FixedLenByteArray) {
          fill(f.dataType, ParquetFileReader.readColumn(b, rebased), nRows):
            org.apache.spark.sql.vectorized.ColumnVector
        } else {
          val (vec, defs) = ParquetFileReader.readColumnVec(b, rebased)
          new GraftColumnVector(f.dataType, vec, defs, rebased.maxDef)
        }
      }
    }
    Some((vecs.toSeq, nRows))
  }

  private def boxedBatch(fetch: ParquetFileReader.ChunkFetcher,
      rg: Int): Option[(Seq[org.apache.spark.sql.vectorized.ColumnVector],
        Int)] = {
    val (cols, n) = GraftFlatScan.columnBatch(fetch, meta, rg, fileFields,
      fileRanges, fileStrRanges)
    if (n == 0) return None
    var fi = -1
    Some((schema.fields.map { f =>
      if (partMap.contains(f.name))
        constVec(f.dataType, partMap(f.name), n):
          org.apache.spark.sql.vectorized.ColumnVector
      else {
        fi += 1
        fill(f.dataType, cols(fi), n):
          org.apache.spark.sql.vectorized.ColumnVector
      }
    }.toSeq, n))
  }

  private def fill(dt: org.apache.spark.sql.types.DataType,
      vals: IndexedSeq[Any], n: Int): OnHeapColumnVector = {
    import org.apache.spark.sql.types._
    val v = new OnHeapColumnVector(n, dt)
    // type dispatch hoisted out of the per-value loop
    val put: (Int, Any) => Unit = dt match {
      case LongType => (i, x) => v.putLong(i, x.asInstanceOf[Long])
      case IntegerType => (i, x) => v.putInt(i, x.asInstanceOf[Int])
      case DoubleType => (i, x) => v.putDouble(i, x.asInstanceOf[Double])
      case FloatType => (i, x) => v.putFloat(i, x.asInstanceOf[Float])
      case BooleanType => (i, x) => v.putBoolean(i, x.asInstanceOf[Boolean])
      case StringType | BinaryType => (i, x) => {
        val b = x.asInstanceOf[Array[Byte]]
        v.putByteArray(i, b, 0, b.length)
      }
      case DateType => (i, x) => v.putInt(i, x.asInstanceOf[Int]) // epoch days
      case TimestampType => (i, x) => x match { // micros, or raw INT96
        case l: Long => v.putLong(i, l)
        case b: Array[Byte] => v.putLong(i, ParquetFileReader.int96ToMicros(b))
      }
      case other =>
        throw new IllegalArgumentException(s"columnar fill: $other")
    }
    var i = 0
    while (i < n) {
      val x = vals(i)
      if (x == null) v.putNull(i) else put(i, x)
      i += 1
    }
    v
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = if (batch != null) batch.close()
}

/** Zero-copy Spark ColumnVector over a decoded [[graft.core.ColVec]]:
  * primitive getters index the decode arrays directly, `getUTF8String`
  * returns a view over the arena bytes (no copy, no String), and nullable
  * columns translate row → value slot through one precomputed int map
  * (values are null-suppressed in the ColVec). */
final class GraftColumnVector(dt: org.apache.spark.sql.types.DataType,
    vec: ColVec, defs: Array[Int], maxDef: Int)
    extends org.apache.spark.sql.vectorized.ColumnVector(dt) {

  // rowId -> value index (-1 = null); identity when the column has no nulls
  private val valIdx: Array[Int] =
    if (defs == null) null
    else {
      val m = new Array[Int](defs.length)
      var i = 0
      var vi = 0
      while (i < defs.length) {
        if (defs(i) == maxDef) { m(i) = vi; vi += 1 } else m(i) = -1
        i += 1
      }
      m
    }
  private var nNulls = -1

  @inline private def slot(rowId: Int): Int =
    if (valIdx == null) rowId else valIdx(rowId)

  override def isNullAt(rowId: Int): Boolean =
    valIdx != null && valIdx(rowId) == -1
  override def hasNull: Boolean = numNulls > 0
  override def numNulls: Int = {
    if (nNulls < 0) {
      var c = 0
      if (valIdx != null) {
        var i = 0
        while (i < valIdx.length) { if (valIdx(i) == -1) c += 1; i += 1 }
      }
      nNulls = c
    }
    nNulls
  }

  override def getBoolean(rowId: Int): Boolean =
    vec.asInstanceOf[BoolVec].values(slot(rowId))
  override def getInt(rowId: Int): Int =
    vec.asInstanceOf[IntVec].values(slot(rowId))
  override def getLong(rowId: Int): Long =
    vec.asInstanceOf[LongVec].values(slot(rowId))
  override def getFloat(rowId: Int): Float =
    vec.asInstanceOf[FloatVec].values(slot(rowId))
  override def getDouble(rowId: Int): Double =
    vec.asInstanceOf[DoubleVec].values(slot(rowId))
  override def getUTF8String(rowId: Int):
      org.apache.spark.unsafe.types.UTF8String = {
    val b = vec.asInstanceOf[BytesVec]
    val s = slot(rowId)
    org.apache.spark.unsafe.types.UTF8String.fromBytes(
      b.data, b.start(s), b.len(s))
  }
  override def getBinary(rowId: Int): Array[Byte] = {
    val b = vec.asInstanceOf[BytesVec]
    val s = slot(rowId)
    java.util.Arrays.copyOfRange(b.data, b.start(s), b.start(s) + b.len(s))
  }

  override def getByte(rowId: Int): Byte =
    throw new UnsupportedOperationException("byte")
  override def getShort(rowId: Int): Short =
    throw new UnsupportedOperationException("short")
  override def getArray(rowId: Int):
      org.apache.spark.sql.vectorized.ColumnarArray =
    throw new UnsupportedOperationException("array")
  override def getMap(rowId: Int):
      org.apache.spark.sql.vectorized.ColumnarMap =
    throw new UnsupportedOperationException("map")
  override def getDecimal(rowId: Int, precision: Int, scale: Int):
      org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException("decimal")
  override def getChild(ordinal: Int):
      org.apache.spark.sql.vectorized.ColumnVector =
    throw new UnsupportedOperationException("child")
  override def close(): Unit = ()
}

final class GraftPartitionReader(path: String, schema: StructType,
    ranges: Map[String, (Long, Long)], limit: Int = -1,
    strRanges: Map[String, (Array[Byte], Array[Byte])] = Map.empty,
    plannedRgs: Seq[Int] = null,
    partValues: Seq[(String, String)] = Nil,
    eqProbes: Seq[(String, Seq[Any])] = Nil)
    extends PartitionReader[InternalRow] {

  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(schema)
  private val partMap = partValues.toMap
  // requested fields that live in the FILE vs in the directory path
  private val fileFields = schema.fields.filter(f => !partMap.contains(f.name))
  private def partConst(f: StructField): Any = {
    val v = partMap(f.name)
    if (f.dataType == LongType) v.toLong else v
  }
  // pushed ranges on file columns only — partition-column ranges were
  // already resolved at planning (whole directories dropped)
  private val fileRanges = ranges.filter(kv => !partMap.contains(kv._1))
  private val fileStrRanges = strRanges.filter(kv => !partMap.contains(kv._1))
  private val fileEqProbes = eqProbes.filter(p => !partMap.contains(p._1))

  private val it: Iterator[InternalRow] = {
    // footer tail only — data bytes are fetched per projected chunk below,
    // so a k-of-n column projection reads k/n of the file's data I/O
    val meta = ParquetFileReader.readFooterOnly(path)
    val rgs = GraftFlatScan.bloomPrune(path, meta,
      GraftFlatScan.pruneRowGroups(meta, plannedRgs, fileRanges, fileStrRanges),
      fileEqProbes)
    val proj = fileFields.map(_.name).toSet
    // FLAT schemas with pushed predicates go through page-level pruning:
    // within each surviving row group, the filter columns' page statistics
    // select row ranges, and only pages overlapping them are decoded.
    val flat = GraftFlatScan.isFlat(meta)
    // rgs.iterator keeps row-group decode lazy: a pushed limit stops
    // before trailing row groups are ever decompressed
    val rows =
      if (fileFields.isEmpty)
        // partition-column-only projection (e.g. SELECT lang): residual
        // file-column filters force their columns into the schema, so this
        // branch can only carry partition filters — already applied
        rgs.iterator.flatMap { rg =>
          val row = toCatalyst(org.apache.spark.sql.Row.fromSeq(
            schema.fields.toSeq.map(partConst))).asInstanceOf[InternalRow]
          Iterator.fill(meta.rowGroups(rg).numRows.toInt)(row)
        }
      else if (flat && (fileRanges.nonEmpty || fileStrRanges.nonEmpty))
        rgs.iterator.flatMap(rg => pagePrunedRows(meta, rg))
      else rgs.iterator.flatMap { rg =>
        val fetch = new ParquetFileReader.ChunkFetcher(path)
        // readRowsFetched materializes the row group before returning,
        // so the fetcher can close eagerly
        val groupRows =
          try ParquetFileReader.readRowsFetched(fetch, meta, rg, proj)
          finally fetch.close()
        groupRows.iterator.map { g =>
          toCatalyst(org.apache.spark.sql.Row.fromSeq(
            schema.fields.toSeq.map(f =>
              if (partMap.contains(f.name)) partConst(f)
              else ParquetSource.externalValue(g(f.name), f.dataType))))
            .asInstanceOf[InternalRow]
        }
      }
    if (limit >= 0) rows.take(limit) else rows
  }

  /** Rows of one row group surviving the pushed ranges at PAGE granularity:
    * page statistics of each filter column narrow the kept chunk-row
    * ranges, then only overlapping pages of the projected columns are
    * decoded. Residual Spark-side filters still apply afterwards, so
    * stat-less pages surviving is only a missed skip, never a wrong row. */
  private def pagePrunedRows(meta: PqFileMeta,
      rg: Int): Iterator[InternalRow] = {
    val fetch = new ParquetFileReader.ChunkFetcher(path)
    try pagePrunedRowsFetched(fetch, meta, rg) finally fetch.close()
  }

  private def pagePrunedRowsFetched(fetch: ParquetFileReader.ChunkFetcher,
      meta: PqFileMeta, rg: Int): Iterator[InternalRow] = {
    val (fileVals0, n) = GraftFlatScan.columnBatch(fetch, meta, rg,
      fileFields, fileRanges, fileStrRanges)
    if (n == 0) return Iterator.empty
    val fileVals = fileVals0.zip(fileFields).map { case (vals, f) =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        vals.map(v => if (v == null) null
          else new String(v.asInstanceOf[Array[Byte]],
            java.nio.charset.StandardCharsets.UTF_8))
      else vals
    }
    // per output field: file-column index, or the partition constant
    val sources: Array[Either[Int, Any]] = schema.fields.map { f =>
      if (partMap.contains(f.name)) Right(partConst(f))
      else Left(fileFields.indexWhere(_.name == f.name))
    }
    (0 until n).iterator.map { i =>
      toCatalyst(org.apache.spark.sql.Row.fromSeq(
        schema.fields.indices.map { j =>
          sources(j) match {
            case Right(const) => const
            case Left(fi) =>
              ParquetSource.externalValue(fileVals(fi)(i),
                schema.fields(j).dataType)
          }
        })).asInstanceOf[InternalRow]
    }
  }

  private var cur: InternalRow = _
  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
