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
  * Leaf types: Boolean / Int / Date / Long / Timestamp / Float / Double /
  * Decimal(p<=18) / String / Binary. Nested: ARRAY columns become standard
  * 3-level LIST groups (`optional group (LIST) { repeated group list {
  * optional element } }`), MAP columns key_value groups, and STRUCT
  * columns plain optional groups (one leaf chunk per subfield, maxDef 2,
  * no rep stream), with RLE rep/def level streams — the reference's
  * nested write support
  * (`/root/reference/src/record/`) re-expressed over the same shredded
  * rep/def streams the chunk engine produces. Flat columns are written
  * OPTIONAL with an RLE def-level stream (bit width 1); values use the
  * dictionary path (PLAIN dict page + PLAIN_DICTIONARY ids) when the
  * chunk's distinct count stays under the dict limits, else PLAIN — the
  * reference's writer policy
  * (`/root/reference/src/column/writer.rs:393-416`).
  */
object ParquetFileWriter {

  val DictMaxEntries = 65536
  val DictMaxBytes: Long = 1L << 20
  /** Target data-page size — the reference's DEFAULT_PAGE_SIZE
    * (`/root/reference/src/file/properties.rs:56`). Flat PLAIN chunks
    * larger than this are cut into multiple pages. */
  val PageBytes: Long = 1L << 20

  private final case class ChunkInfo(meta: PqColumnMeta)

  private def pqTypeOf(dt: DataType): Int = dt match {
    case BooleanType => PqType.Boolean
    case IntegerType | DateType => PqType.Int32
    case LongType | TimestampType | TimestampNTZType => PqType.Int64
    case d: DecimalType if d.precision <= 18 => PqType.Int64
    case _: DecimalType => PqType.FixedLenByteArray // p > 18: two's-comp BE
    case FloatType => PqType.Float
    case DoubleType => PqType.Double
    case StringType | BinaryType => PqType.ByteArray
    case other => throw new IllegalArgumentException(
      s"unsupported parquet writer type $other")
  }

  /** FLBA leaves (big-decimal columns): fixed raw concat on the page, no
    * dictionary, no unsigned-lexicographic stats (sign bit breaks order). */
  private def isFlba(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision > 18
    case _ => false
  }

  private def convertedTypeOf(dt: DataType): Int = dt match {
    case StringType => PqConvertedType.Utf8
    case DateType => PqConvertedType.Date
    case TimestampType | TimestampNTZType => PqConvertedType.TimestampMicros
    case _: DecimalType => PqConvertedType.Decimal
    case _ => -1
  }

  /** Write `rows` to one parquet file; returns the row count.
    * `pageVersion` 1 writes classic v1 data pages; 2 writes DATA_PAGE_V2
    * (prefix-free uncompressed level streams, value-only compression —
    * the reference's WriterVersion::PARQUET_2_0,
    * `/root/reference/src/file/properties.rs:71-83`). */
  def writeFile(path: String, schema: StructType, rows: Iterator[Row],
      rowGroupRows: Int = 1 << 16, codec: Int = PqCodec.Snappy,
      pageVersion: Int = 1, bloomCols: Set[String] = Set.empty): Long = {
    val w = new IncrementalFileWriter(path, schema, rowGroupRows, codec,
      pageVersion, bloomCols)
    rows.foreach(w.add)
    w.close()
  }

  /** Row-at-a-time file writer — the shape DataSource V2 DataWriters need
    * (and what the reference's SerializedFileWriter is: an open handle you
    * push batches through, then close). */
  final class IncrementalFileWriter(path: String, schema: StructType,
      rowGroupRows: Int = 1 << 16, codec: Int = PqCodec.Snappy,
      pageVersion: Int = 1,
      /** FLAT leaf columns to stamp split-block bloom filters for
        * (equality pruning on columns whose min/max stats cannot prune);
        * filters are written after all row-group data, before the footer,
        * and referenced from ColumnMetaData fields 14/15. */
      bloomCols: Set[String] = Set.empty,
      bloomFpp: Double = 0.01) {
    private val fields = schema.fields
    private val nCols = fields.length
    private val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
    private var pos = 0L
    private def write(b: Array[Byte]): Unit = { out.write(b); pos += b.length }

    write("PAR1".getBytes)
    private val builders = fields.map(f => ColBuilder(f.dataType))
    private val rowGroups = ArrayBuffer.empty[PqRowGroup]
    // (row-group index, chunk index within group, filter) awaiting a file
    // offset — blooms land between the last row group and the footer
    private val pendingBlooms = ArrayBuffer.empty[(Int, Int, Sbbf)]
    private var totalRows = 0L
    private var buffered = 0

    def add(row: Row): Unit = {
      var c = 0
      while (c < nCols) { builders(c).add(row, c); c += 1 }
      buffered += 1
      if (buffered >= rowGroupRows) { flushRowGroup(buffered); buffered = 0 }
    }

    /** Flush the tail row group, write the footer, return total rows. */
    def close(): Long = {
      flushRowGroup(buffered)
      finish()
      totalRows
    }

    private def flushRowGroup(buffered: Int): Unit = {
      if (buffered == 0) return
      val chunks = ArrayBuffer.empty[PqColumnMeta]
      var c = 0
      while (c < nCols) {
        val f = fields(c)
        builders(c) match {
          case ab: ColBuilder.ArrayBuilder =>
            // one repeated leaf: <name>.list.element (3-level LIST), our
            // rep/def streams are exactly parquet's for this structure
            val (elems, rep, defsArr) = ab.buildArray()
            val et = f.dataType.asInstanceOf[ArrayType].elementType
            chunks += writeColumnChunk(write, () => pos,
              Seq(f.name, "list", "element"), et, elems,
              rep, defsArr, rep.length, defWidth = 2, maxDef = 3, codec,
              pageVersion)
          case mb: ColBuilder.MapBuilder =>
            // two leaves sharing one rep stream: key (maxDef 2, required)
            // and value (maxDef 3, optional)
            val (keys, vals, rep, defsArr) = mb.buildMap()
            val MapType(kt, vt, _) = f.dataType: @unchecked
            val keyDefs = new Array[Byte](defsArr.length)
            var i = 0
            while (i < defsArr.length) {
              keyDefs(i) = math.min(defsArr(i).toInt, 2).toByte; i += 1
            }
            chunks += writeColumnChunk(write, () => pos,
              Seq(f.name, "key_value", "key"), kt, keys,
              rep, keyDefs, rep.length, defWidth = 2, maxDef = 2, codec,
              pageVersion)
            chunks += writeColumnChunk(write, () => pos,
              Seq(f.name, "key_value", "value"), vt, vals,
              rep, defsArr, rep.length, defWidth = 2, maxDef = 3, codec,
              pageVersion)
          case sb: ColBuilder.StructBuilder =>
            // non-repeated group: one leaf chunk per subfield, maxDef 2
            // (optional group + optional field), no rep stream
            val leaves = sb.buildStruct()
            val subFields = sb.st.fields
            var j = 0
            while (j < subFields.length) {
              val (vec, defsArr) = leaves(j)
              chunks += writeColumnChunk(write, () => pos,
                Seq(f.name, subFields(j).name), subFields(j).dataType, vec,
                null, defsArr, sb.rowCount, defWidth = 2, maxDef = 2, codec,
                pageVersion)
              j += 1
            }
          case b =>
            val vec = b.build()
            val levels = b.defLevels
            val nRows = b.rowCount
            if (bloomCols.contains(f.name) && vec.length > 0 &&
                !vec.isInstanceOf[BoolVec] && !isFlba(f.dataType))
              pendingBlooms += ((rowGroups.length, chunks.length,
                Sbbf.build(vec, bloomFpp)))
            chunks += writeColumnChunk(write, () => pos,
              Seq(f.name), f.dataType, vec,
              null, levels, nRows, defWidth = 1, maxDef = 1, codec,
              pageVersion)
        }
        builders(c).clear()
        c += 1
      }
      rowGroups += PqRowGroup(chunks.toSeq,
        chunks.map(_.totalUncompressedSize).sum, buffered.toLong)
      totalRows += buffered
    }

    // schema: root group + per column either one OPTIONAL primitive, a
    // 3-level LIST group, or a MAP key_value group
    private def primitive(name: String, dt: DataType,
        repetition: Int): PqSchemaElement = {
      val (sc, pr) = dt match {
        case d: DecimalType => (d.scale, d.precision)
        case _ => (-1, -1)
      }
      val tl = if (isFlba(dt)) ColBuilder.decimalFlbaLen(pr) else -1
      PqSchemaElement(name, typ = pqTypeOf(dt), typeLength = tl,
        repetition = repetition, convertedType = convertedTypeOf(dt),
        scale = sc, precision = pr)
    }
    private def finish(): Unit = {
      // bloom filters: thrift header + little-endian bitset per chunk, then
      // the footer's ColumnMetaData points back at them (fields 14/15)
      if (pendingBlooms.nonEmpty) {
        val patches = pendingBlooms.map { case (rg, ci, f) =>
          val off = pos
          val header = Sbbf.writeHeader(f.numBytes)
          write(header)
          write(f.toBytes)
          (rg, ci, off, header.length + f.numBytes)
        }
        patches.groupBy(_._1).foreach { case (rg, ps) =>
          val group = rowGroups(rg)
          val cols = group.columns.toArray
          ps.foreach { case (_, ci, off, len) =>
            cols(ci) = cols(ci).copy(bloomOffset = off, bloomLength = len)
          }
          rowGroups(rg) = group.copy(columns = cols.toSeq)
        }
        pendingBlooms.clear()
      }
      val schemaElems =PqSchemaElement("spark_schema", numChildren = nCols) +:
        fields.toSeq.flatMap { f =>
          f.dataType match {
            case ArrayType(et, _) => Seq(
              PqSchemaElement(f.name, repetition = 1, numChildren = 1,
                convertedType = PqConvertedType.List),
              PqSchemaElement("list", repetition = 2, numChildren = 1),
              primitive("element", et, repetition = 1))
            case MapType(kt, vt, _) => Seq(
              PqSchemaElement(f.name, repetition = 1, numChildren = 1,
                convertedType = PqConvertedType.Map),
              PqSchemaElement("key_value", repetition = 2, numChildren = 2,
                convertedType = PqConvertedType.MapKeyValue),
              primitive("key", kt, repetition = 0),
              primitive("value", vt, repetition = 1))
            case st: StructType =>
              PqSchemaElement(f.name, repetition = 1,
                numChildren = st.fields.length) +:
                st.fields.toSeq.map(sf =>
                  primitive(sf.name, sf.dataType, repetition = 1))
            case dt => Seq(primitive(f.name, dt, repetition = 1))
          }
        }
      val footer = ParquetMeta.writeFileMeta(PqFileMeta(
        version = 1, schema = schemaElems, numRows = totalRows,
        rowGroups = rowGroups.toSeq, createdBy = "graft parquet writer"))
      write(footer)
      val lenBytes = Array[Byte](footer.length.toByte,
        (footer.length >>> 8).toByte,
        (footer.length >>> 16).toByte, (footer.length >>> 24).toByte)
      write(lenBytes)
      write("PAR1".getBytes)
      out.close()
    }
  }

  /** RLE level stream with the v1 4-byte LE length prefix. `levels == null`
    * means all-ones (no nulls). */
  private def levelStream(levels: Array[Byte], n: Int, width: Int): Array[Byte] = {
    val enc = new RleHybridEncoder(width)
    var i = 0
    if (levels == null) while (i < n) { enc.put(1L); i += 1 }
    else while (i < n) { enc.put(levels(i).toLong); i += 1 }
    val body = enc.result()
    val outB = new Array[Byte](4 + body.length)
    outB(0) = body.length.toByte
    outB(1) = (body.length >>> 8).toByte
    outB(2) = (body.length >>> 16).toByte
    outB(3) = (body.length >>> 24).toByte
    System.arraycopy(body, 0, outB, 4, body.length)
    outB
  }

  /** RLE level stream WITHOUT a length prefix (DATA_PAGE_V2 layout — the
    * byte length travels in the page header instead). */
  private def levelStreamV2(levels: Array[Byte], n: Int, width: Int): Array[Byte] = {
    val enc = new RleHybridEncoder(width)
    var i = 0
    if (levels == null) while (i < n) { enc.put(1L); i += 1 }
    else while (i < n) { enc.put(levels(i).toLong); i += 1 }
    enc.result()
  }

  /** One leaf column chunk: optional PLAIN dict page + one data page (v1 or
    * v2 per `pageVersion`).
    * `repLevels == null` for non-repeated (flat) leaves; `numValues` is the
    * slot count (= rows for flat leaves, rep/def stream length for repeated
    * ones); `vec` holds the null-suppressed values (one per max-def slot). */
  private def writeColumnChunk(write: Array[Byte] => Unit, tell: () => Long,
      path: Seq[String], dt: DataType, vec: ColVec, repLevels: Array[Byte],
      defLevels: Array[Byte], numValues: Int, defWidth: Int, maxDef: Int,
      codec: Int, pageVersion: Int): PqColumnMeta = {
    val typ = pqTypeOf(dt)

    var numNulls = 0
    if (defLevels != null) {
      var i = 0
      while (i < numValues) {
        if (defLevels(i).toInt != maxDef) numNulls += 1
        i += 1
      }
    }
    // chunk statistics: stat-encoded min/max over the non-null values plus
    // the null count (the reference's statistics.rs fields; its own writer
    // left them TODO — writer.rs:352). FLBA decimals skip min/max: their
    // order is SIGNED big-endian, not the unsigned-lexicographic stat order.
    val stats =
      if (isFlba(dt)) Some(PqStats(Array.emptyByteArray, Array.emptyByteArray,
        numNulls.toLong))
      else {
        val (mn, mx) = MinMax.compute(vec)
        Some(PqStats(mn, mx, numNulls.toLong))
      }

    // dictionary attempt (first-seen order, like the reference's writer)
    val dictPair: Option[(Int, Array[Byte], Array[Byte])] =
      if (isFlba(dt)) None else buildDict(vec)

    val startOff = tell()
    var uncTotal = 0L
    var dictOff = -1L

    val dictIds = dictPair.map { case (nDict, dictPage, idPage) =>
      dictOff = tell()
      val dictComp = compress(dictPage, codec)
      val dictHeader = ParquetMeta.writeDictPageHeader(nDict, dictPage.length,
        dictComp.length)
      write(dictHeader); write(dictComp)
      uncTotal += dictHeader.length + dictPage.length
      idPage
    }
    val valueEnc =
      if (dictIds.isEmpty) PqEncoding.Plain
      else if (pageVersion >= 2) PqEncoding.RleDictionary
      else PqEncoding.PlainDictionary
    val dataOff = tell()

    /** Emit one data page: `n` slots, the page's def-level slice (null =
      * no nulls anywhere), its rep-level slice (null for flat leaves), and
      * its encoded values. */
    def emitPage(n: Int, defs: Array[Byte], reps: Array[Byte],
        vals: Array[Byte], pageStats: Option[PqStats]): Unit = {
      if (pageVersion >= 2) {
        // DATA_PAGE_V2: prefix-free uncompressed level streams + compressed
        // values (reference writer.rs DataPageV2 serialization path)
        val repStream =
          if (reps == null) Array.emptyByteArray else levelStreamV2(reps, n, 1)
        val defStream = levelStreamV2(defs, n, defWidth)
        var nulls = 0
        if (defs != null) {
          var i = 0
          while (i < n) { if (defs(i).toInt != maxDef) nulls += 1; i += 1 }
        }
        var nRows = n
        if (reps != null) {
          nRows = 0
          var i = 0
          while (i < n) { if (reps(i) == 0) nRows += 1; i += 1 }
        }
        val comp = compress(vals, codec)
        val lvlLen = repStream.length + defStream.length
        val header = ParquetMeta.writePageHeaderV2(n, nulls, nRows,
          valueEnc, lvlLen + vals.length, lvlLen + comp.length,
          defStream.length, repStream.length, stats = pageStats)
        write(header); write(repStream); write(defStream); write(comp)
        uncTotal += header.length + lvlLen + vals.length
      } else {
        // v1 page body: [repLevels][defLevels][values], one compressed region
        val repBytes =
          if (reps == null) Array.emptyByteArray else levelStream(reps, n, 1)
        val content = repBytes ++ levelStream(defs, n, defWidth) ++ vals
        val repEnc =
          if (reps == null) PqEncoding.BitPacked else PqEncoding.Rle
        val comp = compress(content, codec)
        val header = ParquetMeta.writePageHeaderV1(n, valueEnc,
          content.length, comp.length, repEnc, stats = pageStats)
        write(header); write(comp)
        uncTotal += header.length + content.length
      }
    }

    // Flat PLAIN chunks above the reference's DEFAULT_PAGE_SIZE are cut into
    // ~1 MiB pages (reference writer.rs:359-433). Dict chunks keep one id
    // stream (bounded by the 1 MiB dict limit + id widths), FLBA and
    // repeated leaves stay single-page (rep streams would need
    // record-aligned splits).
    if (dictIds.isEmpty && repLevels == null && !isFlba(dt) &&
        plainSizeOf(vec) > PageBytes) {
      var r0 = 0
      var v0 = 0
      var r = 0
      var v = 0
      var acc = 0L
      def cut(rEnd: Int, vEnd: Int): Unit = {
        val defsSlice =
          if (defLevels == null) null
          else java.util.Arrays.copyOfRange(defLevels, r0, rEnd)
        val slice = ChunkCodecSupport.gather(vec, Array.range(v0, vEnd))
        // page-level statistics over this page's values (the page-skipping
        // granularity the reference never reached — its writer left even
        // chunk stats TODO, writer.rs:352)
        val (pMn, pMx) = MinMax.compute(slice)
        val pStats = Some(PqStats(pMn, pMx, (rEnd - r0 - (vEnd - v0)).toLong))
        emitPage(rEnd - r0, defsSlice, null, PlainCodec.encode(slice), pStats)
        r0 = rEnd; v0 = vEnd; acc = 0L
      }
      while (r < numValues) {
        if (defLevels == null || defLevels(r).toInt == maxDef) {
          acc += valueSizeOf(vec, v); v += 1
        }
        r += 1
        if (acc >= PageBytes && r < numValues) cut(r, v)
      }
      cut(numValues, v)
    } else {
      val valueBytes = dictIds.getOrElse {
        if (isFlba(dt)) {
          // FLBA PLAIN: raw fixed-size concat, no length prefixes
          val v = vec.asInstanceOf[BytesVec]
          val nVals = v.length
          if (nVals == 0) Array.emptyByteArray
          else java.util.Arrays.copyOfRange(v.data, v.start(0),
            v.start(nVals - 1) + v.len(nVals - 1))
        } else PlainCodec.encode(vec)
      }
      // single data page == whole chunk: page stats are the chunk stats
      emitPage(numValues, defLevels, repLevels, valueBytes, stats)
    }
    val endOff = tell()
    val encodings =
      if (dictIds.isEmpty) Seq(PqEncoding.Rle, PqEncoding.Plain)
      else Seq(PqEncoding.Rle, valueEnc, PqEncoding.Plain)
    PqColumnMeta(typ, encodings, path, codec, numValues.toLong, uncTotal,
      endOff - startOff, dataPageOffset = dataOff,
      dictionaryPageOffset = dictOff, stats = stats)
  }

  /** PLAIN-encoded size of a whole vector (bools counted one byte — a safe
    * overestimate keeps page cuts conservative). */
  private def plainSizeOf(vec: ColVec): Long = vec match {
    case BoolVec(vs) => vs.length.toLong
    case IntVec(vs) => 4L * vs.length
    case FloatVec(vs) => 4L * vs.length
    case LongVec(vs) => 8L * vs.length
    case DoubleVec(vs) => 8L * vs.length
    case v: BytesVec =>
      (if (v.length == 0) 0L
       else (v.start(v.length - 1) + v.len(v.length - 1) - v.start(0)).toLong) +
        4L * v.length
  }

  private def valueSizeOf(vec: ColVec, i: Int): Long = vec match {
    case _: BoolVec => 1L
    case _: IntVec | _: FloatVec => 4L
    case _: LongVec | _: DoubleVec => 8L
    case v: BytesVec => 4L + v.len(i)
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
    case PqCodec.Lz4Raw =>
      // modern unambiguous LZ4 id (the legacy id-5 framing is reader-only:
      // different ecosystems disagree on its frame layout)
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val out = new Array[Byte](c.maxCompressedLength(content.length))
      val n = c.compress(content, 0, content.length, out, 0)
      java.util.Arrays.copyOf(out, n)
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
      rowGroupRows: Int = 1 << 16, pageVersion: Int = 1,
      bloomCols: Seq[String] = Nil): DataFrame = {
    val schema = df.schema
    val blooms = bloomCols.toSet
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
        val n = ParquetFileWriter.writeFile(path, schema, it, rowGroupRows,
          codec, pageVersion, blooms)
        Iterator(Row(path, n))
      }
    }
  }

  /** Hive-style partitioned write: rows land under
    * `dir/k1=v1/.../part-<taskId>.parquet`, partition columns dropped from
    * the file payload (they live in the path, like Spark's own layout — so
    * Spark, DuckDB, and pyarrow read it back with partition columns
    * restored). One `repartition` on the partition columns co-locates each
    * value; within a task one incremental writer per live value keeps
    * memory O(row group), not O(partition). */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
      codec: Int = PqCodec.Snappy, rowGroupRows: Int = 1 << 16,
      pageVersion: Int = 1): DataFrame = {
    require(partitionCols.nonEmpty, "writePartitioned needs partition columns")
    val dataFields = df.schema.fields.filterNot(f =>
      partitionCols.contains(f.name))
    require(dataFields.nonEmpty, "all columns are partition columns")
    val dataSchema = StructType(dataFields.toSeq)
    val pIdx = partitionCols.map(df.schema.fieldIndex).toArray
    val dIdx = dataFields.map(f => df.schema.fieldIndex(f.name))
    new java.io.File(dir).mkdirs()
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("rows", LongType, nullable = false))))
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*).mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val writers = scala.collection.mutable.LinkedHashMap
        .empty[Seq[String], (String, ParquetFileWriter.IncrementalFileWriter)]
      it.foreach { row =>
        val key: Seq[String] =
          pIdx.toSeq.map(i => String.valueOf(row.get(i)))
        val (_, w) = writers.getOrElseUpdate(key, {
          val sub = partitionCols.zip(key).map { case (k, v) =>
            s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"
          }.mkString("/")
          val d = new java.io.File(s"$dir/$sub")
          d.mkdirs()
          val path = f"${d.getPath}/part-$pid%05d.parquet"
          (path, new ParquetFileWriter.IncrementalFileWriter(path, dataSchema,
            rowGroupRows, codec, pageVersion))
        })
        w.add(Row.fromSeq(dIdx.toSeq.map(row.get)))
      }
      writers.valuesIterator.map { case (path, w) => Row(path, w.close()) }
    }
  }
}
