package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.core._
import graft.operators.ColBuilder

/** Standard `.parquet` FILE writer over our own codec kernels — PAR1
  * container, v1 data pages (PLAIN or dict), RLE definition levels, thrift
  * compact footer; the counterpart of the reference's SerializedFileWriter
  * (`/root/reference/src/file/writer.rs:120-243`). Files are readable by
  * any Parquet implementation — the test suite round-trips them through
  * Spark's own built-in reader as the external correctness anchor.
  *
  * Flat schemas: Boolean / Int / Date / Long / Timestamp / Float / Double /
  * String / Binary. Every column is written OPTIONAL with an RLE def-level
  * stream (bit width 1); values use the dictionary path (PLAIN dict page +
  * PLAIN_DICTIONARY ids) when the chunk's distinct count stays under the
  * dict limits, else PLAIN — the reference's writer policy
  * (`/root/reference/src/column/writer.rs:393-416`).
  */
object ParquetFileWriter {

  val DictMaxEntries = 65536
  val DictMaxBytes: Long = 1L << 20

  private final case class ChunkInfo(meta: PqColumnMeta)

  private def pqTypeOf(dt: DataType): Int = dt match {
    case BooleanType => PqType.Boolean
    case IntegerType | DateType => PqType.Int32
    case LongType | TimestampType | TimestampNTZType => PqType.Int64
    case d: DecimalType if d.precision <= 18 => PqType.Int64
    case FloatType => PqType.Float
    case DoubleType => PqType.Double
    case StringType | BinaryType => PqType.ByteArray
    case other => throw new IllegalArgumentException(
      s"unsupported parquet writer type $other")
  }

  private def convertedTypeOf(dt: DataType): Int = dt match {
    case StringType => PqConvertedType.Utf8
    case DateType => PqConvertedType.Date
    case TimestampType | TimestampNTZType => PqConvertedType.TimestampMicros
    case _: DecimalType => PqConvertedType.Decimal
    case _ => -1
  }

  /** Write `rows` to one parquet file; returns the row count. */
  def writeFile(path: String, schema: StructType, rows: Iterator[Row],
      rowGroupRows: Int = 1 << 16, codec: Int = PqCodec.Snappy): Long = {
    val fields = schema.fields
    val nCols = fields.length
    val fos = new FileOutputStream(path)
    val out = new BufferedOutputStream(fos, 1 << 16)
    var pos = 0L
    def write(b: Array[Byte]): Unit = { out.write(b); pos += b.length }

    write("PAR1".getBytes)
    val builders = fields.map(f => ColBuilder(f.dataType))
    val rowGroups = ArrayBuffer.empty[PqRowGroup]
    var totalRows = 0L

    def flushRowGroup(buffered: Int): Unit = {
      if (buffered == 0) return
      val chunks = new Array[PqColumnMeta](nCols)
      var c = 0
      while (c < nCols) {
        val vec = builders(c).build()
        val levels = builders(c).defLevels
        val nRows = builders(c).rowCount
        chunks(c) = writeColumnChunk(write, () => pos, fields(c), vec, levels,
          nRows, codec)
        builders(c).clear()
        c += 1
      }
      rowGroups += PqRowGroup(chunks.toSeq,
        chunks.map(_.totalUncompressedSize).sum, buffered.toLong)
      totalRows += buffered
    }

    var buffered = 0
    rows.foreach { row =>
      var c = 0
      while (c < nCols) { builders(c).add(row, c); c += 1 }
      buffered += 1
      if (buffered >= rowGroupRows) { flushRowGroup(buffered); buffered = 0 }
    }
    flushRowGroup(buffered)

    // schema: root group + one OPTIONAL primitive per column
    val schemaElems = PqSchemaElement("spark_schema", numChildren = nCols) +:
      fields.toSeq.map { f =>
        val (sc, pr) = f.dataType match {
          case d: DecimalType => (d.scale, d.precision)
          case _ => (-1, -1)
        }
        PqSchemaElement(f.name, typ = pqTypeOf(f.dataType), repetition = 1,
          convertedType = convertedTypeOf(f.dataType), scale = sc, precision = pr)
      }
    val footer = ParquetMeta.writeFileMeta(PqFileMeta(
      version = 1, schema = schemaElems, numRows = totalRows,
      rowGroups = rowGroups.toSeq, createdBy = "graft parquet writer"))
    write(footer)
    val lenBytes = Array[Byte](footer.length.toByte, (footer.length >>> 8).toByte,
      (footer.length >>> 16).toByte, (footer.length >>> 24).toByte)
    write(lenBytes)
    write("PAR1".getBytes)
    out.close()
    totalRows
  }

  /** One column chunk: optional PLAIN dict page + one v1 data page. */
  private def writeColumnChunk(write: Array[Byte] => Unit, tell: () => Long,
      field: StructField, vec: ColVec, levels: Array[Byte], nRows: Int,
      codec: Int): PqColumnMeta = {
    val typ = pqTypeOf(field.dataType)

    // def levels: always-present RLE stream, bit width 1, 4-byte LE prefix
    val levelBytes = {
      val enc = new RleHybridEncoder(1)
      var i = 0
      if (levels == null) while (i < nRows) { enc.put(1L); i += 1 }
      else while (i < nRows) { enc.put(levels(i).toLong); i += 1 }
      val body = enc.result()
      val outB = new Array[Byte](4 + body.length)
      outB(0) = body.length.toByte
      outB(1) = (body.length >>> 8).toByte
      outB(2) = (body.length >>> 16).toByte
      outB(3) = (body.length >>> 24).toByte
      System.arraycopy(body, 0, outB, 4, body.length)
      outB
    }

    // dictionary attempt (first-seen order, like the reference's writer)
    val dictPair: Option[(Int, Array[Byte], Array[Byte])] = buildDict(vec)

    val startOff = tell()
    var uncTotal = 0L

    dictPair match {
      case Some((nDict, dictPage, idPage)) =>
        val dictOff = tell()
        val dictComp = compress(dictPage, codec)
        val dictHeader = ParquetMeta.writeDictPageHeader(nDict, dictPage.length,
          dictComp.length)
        write(dictHeader); write(dictComp)
        uncTotal += dictHeader.length + dictPage.length
        val content = levelBytes ++ idPage
        val comp = compress(content, codec)
        val dataOff = tell()
        val header = ParquetMeta.writePageHeaderV1(nRows,
          PqEncoding.PlainDictionary, content.length, comp.length)
        write(header); write(comp)
        uncTotal += header.length + content.length
        val endOff = tell()
        PqColumnMeta(typ,
          Seq(PqEncoding.Rle, PqEncoding.PlainDictionary, PqEncoding.Plain),
          Seq(field.name), codec, nRows.toLong, uncTotal, endOff - startOff,
          dataPageOffset = dataOff, dictionaryPageOffset = dictOff)
      case None =>
        val content = levelBytes ++ PlainCodec.encode(vec)
        val comp = compress(content, codec)
        val dataOff = tell()
        val header = ParquetMeta.writePageHeaderV1(nRows, PqEncoding.Plain,
          content.length, comp.length)
        write(header); write(comp)
        uncTotal += header.length + content.length
        val endOff = tell()
        PqColumnMeta(typ, Seq(PqEncoding.Rle, PqEncoding.Plain),
          Seq(field.name), codec, nRows.toLong, uncTotal, endOff - startOff,
          dataPageOffset = dataOff)
    }
  }

  /** (entries, PLAIN dict page bytes, id page bytes incl. leading bit-width
    * byte), or None when the column should go PLAIN. */
  private def buildDict(vec: ColVec): Option[(Int, Array[Byte], Array[Byte])] = {
    val n = vec.length
    if (n == 0) return None
    vec match {
      case BoolVec(_) => None // parquet: bools are PLAIN bit-packed
      case _ =>
        val index = new java.util.HashMap[Any, Integer](1024)
        val ids = new Array[Int](n)
        val order = new ArrayBuffer[Int](1024) // first-seen positions
        var dictBytes = 0L
        var i = 0
        while (i < n) {
          val key: Any = vec match {
            case IntVec(vs) => Integer.valueOf(vs(i))
            case LongVec(vs) => java.lang.Long.valueOf(vs(i))
            case FloatVec(vs) => java.lang.Float.valueOf(vs(i))
            case DoubleVec(vs) => java.lang.Double.valueOf(vs(i))
            case v: BytesVec =>
              java.nio.ByteBuffer.wrap(v.data, v.start(i), v.len(i))
            case BoolVec(_) => throw new IllegalStateException
          }
          var id = index.get(key)
          if (id == null) {
            if (index.size >= DictMaxEntries) return None
            dictBytes += (vec match {
              case v: BytesVec => 4L + v.len(i)
              case IntVec(_) | FloatVec(_) => 4L
              case _ => 8L
            })
            if (dictBytes > DictMaxBytes) return None
            id = Integer.valueOf(index.size)
            index.put(key, id)
            order += i
          }
          ids(i) = id.intValue()
          i += 1
        }
        // heuristic: dictionary only pays when it actually shrinks
        if (index.size > n / 2 && !vec.isInstanceOf[BytesVec]) return None
        val nDict = index.size
        val dictVec = ChunkCodecSupport.gather(vec, order.toArray)
        val dictPage = PlainCodec.encode(dictVec)
        val width = math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, nDict - 1)))
        val enc = new RleHybridEncoder(width)
        var k = 0
        while (k < n) { enc.put(ids(k).toLong); k += 1 }
        val body = enc.result()
        val idPage = new Array[Byte](1 + body.length)
        idPage(0) = width.toByte
        System.arraycopy(body, 0, idPage, 1, body.length)
        Some((nDict, dictPage, idPage))
    }
  }

  private def compress(content: Array[Byte], codec: Int): Array[Byte] = codec match {
    case PqCodec.Uncompressed => content
    case PqCodec.Snappy => org.xerial.snappy.Snappy.compress(content)
    case PqCodec.Zstd => com.github.luben.zstd.Zstd.compress(content, 1)
    case PqCodec.Gzip =>
      val bos = new java.io.ByteArrayOutputStream(math.max(64, content.length / 2))
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(content); gz.close()
      bos.toByteArray
    case other => throw new IllegalArgumentException(s"writer codec $other")
  }
}

/** Gather helper shared by the file writer (select rows by index). */
object ChunkCodecSupport {
  def gather(vec: ColVec, idx: Array[Int]): ColVec = vec match {
    case IntVec(vs) => IntVec(idx.map(vs))
    case LongVec(vs) => LongVec(idx.map(vs))
    case FloatVec(vs) => FloatVec(idx.map(vs))
    case DoubleVec(vs) => DoubleVec(idx.map(vs))
    case BoolVec(vs) => BoolVec(idx.map(vs))
    case v: BytesVec =>
      val offsets = new Array[Int](idx.length + 1)
      var total = 0
      idx.indices.foreach { i => offsets(i) = total; total += v.len(idx(i)) }
      offsets(idx.length) = total
      val data = new Array[Byte](total)
      idx.indices.foreach { i =>
        System.arraycopy(v.data, v.start(idx(i)), data, offsets(i), v.len(idx(i)))
      }
      BytesVec(data, offsets)
  }
}

/** Distributed parquet sink: each partition writes its own standard
  * `.parquet` file into `dir` (the Spark files model — at cluster scale the
  * local-path write becomes a DFS stream, the per-partition shape is
  * identical). Returns one (path, rows) row per written file. */
object ParquetSink {
  def write(df: DataFrame, dir: String, codec: Int = PqCodec.Snappy,
      rowGroupRows: Int = 1 << 16): DataFrame = {
    val schema = df.schema
    new java.io.File(dir).mkdirs()
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("rows", LongType, nullable = false))))
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        val path = f"$dir/part-$pid%05d.parquet"
        val n = ParquetFileWriter.writeFile(path, schema, it, rowGroupRows, codec)
        Iterator(Row(path, n))
      }
    }
  }
}
