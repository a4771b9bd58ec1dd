package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.core._

/** Real `.parquet` FILE interop — the reference's most user-visible
  * capability (`/root/reference/src/file/reader.rs:145-283`,
  * `/root/reference/src/file/writer.rs:120-243`), re-done over our own
  * codec kernels: the PLAIN / dictionary / RLE-hybrid byte grammars are the
  * ones already implemented in [[graft.core]], and this layer adds only the
  * PAR1 container (thrift footer, page headers, offsets).
  *
  * Reader: flat schemas, PLAIN + PLAIN_DICTIONARY/RLE_DICTIONARY data
  * pages, RLE or legacy BIT_PACKED definition levels, UNCOMPRESSED /
  * SNAPPY / GZIP / ZSTD pages, all physical types incl. INT96 (decoded as
  * raw 12-byte values). Validated value-exactly against the reference's own
  * golden files (`/root/reference/data/alltypes_*.parquet` — the anchor
  * files its tests use, reader.rs:728-815).
  */
object ParquetFileReader {

  final case class Column(name: String, typ: Int, maxDef: Int, meta: PqColumnMeta)

  def readFooter(bytes: Array[Byte]): PqFileMeta = {
    val n = bytes.length
    require(n > 12 && bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' &&
      bytes(3) == '1', "not a parquet file (magic)")
    require(bytes(n - 4) == 'P' && bytes(n - 3) == 'A' && bytes(n - 2) == 'R' &&
      bytes(n - 1) == '1', "not a parquet file (trailer magic)")
    val footerLen = (bytes(n - 8) & 0xFF) | ((bytes(n - 7) & 0xFF) << 8) |
      ((bytes(n - 6) & 0xFF) << 16) | ((bytes(n - 5) & 0xFF) << 24)
    ParquetMeta.parseFileMeta(bytes, n - 8 - footerLen)
  }

  /** Leaf columns of a FLAT schema (root group + primitive children). */
  def flatColumns(meta: PqFileMeta, rg: Int): Seq[Column] = {
    val leaves = meta.schema.drop(1)
    require(leaves.forall(_.numChildren == 0),
      "nested schemas not supported by the flat reader")
    leaves.zip(meta.rowGroups(rg).columns).map { case (se, cm) =>
      Column(se.name, cm.typ, if (se.repetition == 1) 1 else 0, cm)
    }
  }

  /** Decode one column chunk to per-row values: null | Boolean | Int | Long
    * | Float | Double | Array[Byte] (BYTE_ARRAY and INT96 raw 12-byte). */
  def readColumn(bytes: Array[Byte], col: Column): IndexedSeq[Any] = {
    val cm = col.meta
    var off =
      if (cm.dictionaryPageOffset > 0) math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    var dict: IndexedSeq[Any] = null
    val out = new ArrayBuffer[Any](cm.numValues.toInt)
    var remaining = cm.numValues
    while (remaining > 0) {
      val ph = ParquetMeta.parsePageHeader(bytes, off.toInt)
      val dataStart = off.toInt + ph.headerLen
      val raw = decompress(bytes, dataStart, ph.compressedSize,
        ph.uncompressedSize, cm.codec)
      ph.pageType match {
        case 2 => // dictionary page: PLAIN values
          dict = decodePlain(cm.typ, raw, 0, raw.length, ph.numValues)
        case 0 => // data page v1
          val n = ph.numValues
          var pos = 0
          val defs: Array[Int] =
            if (col.maxDef == 0) null
            else ph.defLevelEncoding match {
              case PqEncoding.Rle =>
                val len = (raw(pos) & 0xFF) | ((raw(pos + 1) & 0xFF) << 8) |
                  ((raw(pos + 2) & 0xFF) << 16) | ((raw(pos + 3) & 0xFF) << 24)
                pos += 4
                val dec = new RleHybridDecoder(levelBitWidth(col.maxDef), raw, pos, pos + len)
                pos += len
                val tmp = new Array[Long](n)
                dec.get(tmp, 0, n)
                tmp.map(_.toInt)
              case PqEncoding.BitPacked =>
                // legacy levels: fixed-width, packed MSB-first
                // (reference levels.rs:142-264)
                val width = levelBitWidth(col.maxDef)
                val bytesUsed = (n * width + 7) / 8
                val tmp = new Array[Int](n)
                var bit = 0
                var i = 0
                while (i < n) {
                  var v = 0
                  var k = 0
                  while (k < width) {
                    val byteIdx = pos + (bit >> 3)
                    val b = raw(byteIdx) & 0xFF
                    v = (v << 1) | ((b >> (7 - (bit & 7))) & 1)
                    bit += 1
                    k += 1
                  }
                  tmp(i) = v
                  i += 1
                }
                pos += bytesUsed
                tmp
              case other => throw new IllegalArgumentException(
                s"def level encoding $other")
            }
          val nNonNull = if (defs == null) n else defs.count(_ == col.maxDef)
          val values: IndexedSeq[Any] = ph.encoding match {
            case PqEncoding.Plain =>
              decodePlain(cm.typ, raw, pos, raw.length - pos, nNonNull)
            case PqEncoding.PlainDictionary | PqEncoding.RleDictionary =>
              require(dict != null, "data page references a missing dictionary")
              val width = raw(pos) & 0xFF
              val dec = new RleHybridDecoder(width, raw, pos + 1, raw.length)
              val ids = new Array[Long](nNonNull)
              dec.get(ids, 0, nNonNull)
              ids.map(id => dict(id.toInt)).toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"data page encoding $other not supported")
          }
          if (defs == null) out ++= values
          else {
            var i = 0
            var vi = 0
            while (i < n) {
              if (defs(i) == col.maxDef) { out += values(vi); vi += 1 }
              else out += null
              i += 1
            }
          }
          remaining -= n
        case other => throw new IllegalArgumentException(
          s"page type $other not supported (data page v2: use chunk tables)")
      }
      off = dataStart + ph.compressedSize
    }
    out.toIndexedSeq
  }

  /** Read a whole flat file: (column names, per-column values). */
  def readFile(path: String): (Seq[String], Seq[IndexedSeq[Any]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val meta = readFooter(bytes)
    val allCols = (0 until meta.rowGroups.size).map(rg => flatColumns(meta, rg))
    val names = allCols.head.map(_.name)
    val merged = names.indices.map { c =>
      allCols.indices.flatMap(rg => readColumn(bytes, allCols(rg)(c))).toIndexedSeq
    }
    (names, merged)
  }

  private def levelBitWidth(maxLevel: Int): Int =
    32 - Integer.numberOfLeadingZeros(maxLevel)

  private def decompress(bytes: Array[Byte], off: Int, compLen: Int,
      uncLen: Int, codec: Int): Array[Byte] = codec match {
    case PqCodec.Uncompressed =>
      java.util.Arrays.copyOfRange(bytes, off, off + compLen)
    case PqCodec.Snappy =>
      val out = new Array[Byte](uncLen)
      org.xerial.snappy.Snappy.uncompress(bytes, off, compLen, out, 0)
      out
    case PqCodec.Gzip =>
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes, off, compLen))
      val out = new Array[Byte](uncLen)
      var o = 0
      while (o < uncLen) {
        val k = gz.read(out, o, uncLen - o)
        if (k < 0) throw new java.io.EOFException("gzip page truncated")
        o += k
      }
      out
    case PqCodec.Zstd =>
      val out = new Array[Byte](uncLen)
      com.github.luben.zstd.Zstd.decompressByteArray(out, 0, uncLen, bytes, off, compLen)
      out
    case other => throw new IllegalArgumentException(s"codec $other not supported")
  }

  private def decodePlain(typ: Int, buf: Array[Byte], off: Int, len: Int,
      n: Int): IndexedSeq[Any] = typ match {
    case PqType.Int96 =>
      (0 until n).map(i =>
        java.util.Arrays.copyOfRange(buf, off + 12 * i, off + 12 * (i + 1)))
    case _ =>
      val phys = typ match {
        case PqType.Boolean => PhysicalType.Bool
        case PqType.Int32 => PhysicalType.Int32
        case PqType.Int64 => PhysicalType.Int64
        case PqType.Float => PhysicalType.Float
        case PqType.Double => PhysicalType.Double
        case PqType.ByteArray => PhysicalType.Bytes
        case other => throw new IllegalArgumentException(s"physical type $other")
      }
      PlainCodec.decodeSlice(phys, buf, off, len, n) match {
        case BoolVec(vs) => vs.toIndexedSeq
        case IntVec(vs) => vs.toIndexedSeq
        case LongVec(vs) => vs.toIndexedSeq
        case FloatVec(vs) => vs.toIndexedSeq
        case DoubleVec(vs) => vs.toIndexedSeq
        case v: BytesVec =>
          (0 until v.length).map(i =>
            java.util.Arrays.copyOfRange(v.data, v.start(i), v.start(i) + v.len(i)))
      }
  }

  /** INT96 timestamp (nanos-of-day LE in bytes 0-7, Julian day LE in bytes
    * 8-11) -> epoch micros. */
  def int96ToMicros(v: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(v).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanos = bb.getLong(0)
    val julian = bb.getInt(8)
    (julian.toLong - 2440588L) * 86400000000L + nanos / 1000L
  }
}
