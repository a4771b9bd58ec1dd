package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
    val files = GraftParquetFormat.listFiles(dir)
    ParquetSource.sparkSchema(ParquetFileReader.readFooter(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(files.head))))
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

  private[sources] def listFiles(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    val out =
      if (f.isFile) Seq(f.getPath)
      else f.listFiles((_, n) => n.endsWith(".parquet"))
        .map(_.getPath).sorted.toSeq
    require(out.nonEmpty, s"no parquet files under $dir")
    out
  }
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
  * (1|2), `rowGroupRows`. */
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
      options.getInt("rowgrouprows", 1 << 16))
  }
}

final class GraftBatchWrite(dir: String, schema: StructType,
    truncate: Boolean, codecName: String, pageVersion: Int,
    rowGroupRows: Int) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val d = new java.io.File(dir)
    d.mkdirs()
    if (truncate)
      d.listFiles((_, n) => n.endsWith(".parquet")).foreach(_.delete())
    val codec = codecName.toLowerCase match {
      case "snappy" => PqCodec.Snappy
      case "gzip" => PqCodec.Gzip
      case "zstd" => PqCodec.Zstd
      case "lz4_raw" | "lz4" => PqCodec.Lz4Raw
      case "uncompressed" | "none" => PqCodec.Uncompressed
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    new GraftWriterFactory(dir, schema, codec, pageVersion, rowGroupRows)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class GraftWriterFactory(dir: String, schema: StructType, codec: Int,
    pageVersion: Int, rowGroupRows: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(
      f"$dir/part-$partitionId%05d-$taskId.parquet",
      schema, codec, pageVersion, rowGroupRows)
}

final case class GraftCommit(path: String, rows: Long)
  extends WriterCommitMessage

final class GraftDataWriter(path: String, schema: StructType, codec: Int,
    pageVersion: Int, rowGroupRows: Int) extends DataWriter[InternalRow] {
  private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
  private val w = new ParquetFileWriter.IncrementalFileWriter(path, schema,
    rowGroupRows, codec, pageVersion)
  override def write(r: InternalRow): Unit =
    w.add(toScala(r).asInstanceOf[org.apache.spark.sql.Row])
  override def commit(): WriterCommitMessage = GraftCommit(path, w.close())
  override def abort(): Unit = {
    try w.close() catch { case _: Throwable => () }
    new java.io.File(path).delete()
  }
  override def close(): Unit = ()
}

final class GraftScanBuilder(dir: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var ranges: Map[String, (Long, Long)] = Map.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands a subset of fullSchema (possibly reordered)
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
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
    val usable = filters.filter {
      case EqualTo(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get, num(v).get); true
      case GreaterThan(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get + 1, Long.MaxValue); true
      case GreaterThanOrEqual(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, num(v).get, Long.MaxValue); true
      case LessThan(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, Long.MinValue, num(v).get - 1); true
      case LessThanOrEqual(c, v) if longCols(c) && num(v).isDefined =>
        tighten(c, Long.MinValue, num(v).get); true
      case _ => false
    }
    pushed = usable
    // every filter stays a residual: stats pruning is a superset filter
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftScan(dir, required, ranges)
}

final class GraftScan(dir: String, schema: StructType,
    ranges: Map[String, (Long, Long)]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"GraftParquetScan[$dir] cols=${schema.fieldNames.mkString(",")}" +
      (if (ranges.nonEmpty) s" ranges=$ranges" else "")
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    GraftParquetFormat.listFiles(dir)
      .map(p => GraftFilePartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema, ranges)
}

final case class GraftFilePartition(path: String) extends InputPartition

final class GraftReaderFactory(schema: StructType,
    ranges: Map[String, (Long, Long)]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[GraftFilePartition].path,
      schema, ranges)
}

final class GraftPartitionReader(path: String, schema: StructType,
    ranges: Map[String, (Long, Long)]) extends PartitionReader[InternalRow] {

  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(schema)

  private val it: Iterator[InternalRow] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val meta = ParquetFileReader.readFooter(bytes)
    // intersect all pushed ranges at row-group granularity
    var rgs: Seq[Int] = meta.rowGroups.indices
    ranges.foreach { case (col, (lo, hi)) =>
      val keep = ParquetFileReader.rowGroupsInRange(meta, col, lo, hi).toSet
      rgs = rgs.filter(keep)
    }
    val proj = schema.fieldNames.toSet
    rgs.iterator.flatMap { rg =>
      ParquetFileReader.readRows(bytes, meta, rg, proj).iterator.map { g =>
        toCatalyst(org.apache.spark.sql.Row.fromSeq(
          schema.fields.toSeq.map(f =>
            ParquetSource.externalValue(g(f.name), f.dataType))))
          .asInstanceOf[InternalRow]
      }
    }
  }

  private var cur: InternalRow = _
  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
