package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.core._

/** Real `.parquet` FILE interop — the reference's most user-visible
  * capability (`/root/reference/src/file/reader.rs:145-283`,
  * `/root/reference/src/file/writer.rs:120-243`), re-done over our own
  * codec kernels: the PLAIN / dictionary / RLE-hybrid byte grammars are the
  * ones already implemented in [[graft.core]], and this layer adds only the
  * PAR1 container (thrift footer, page headers, offsets) and the record
  * re-assembly (the reference's `src/record/reader.rs` Dremel layer).
  *
  * Reader: flat AND nested schemas (LIST / MAP / struct groups, legacy
  * 2-level lists, unannotated repeated fields), PLAIN +
  * PLAIN_DICTIONARY/RLE_DICTIONARY data pages V1 AND V2 (v2: prefix-free
  * uncompressed level streams, value-only block compression), RLE or legacy
  * BIT_PACKED level streams, UNCOMPRESSED / SNAPPY / GZIP / ZSTD pages, all
  * physical types incl. INT96 (raw 12-byte values) and FIXED_LEN_BYTE_ARRAY.
  * Validated value-exactly against the reference's own golden files
  * (the golden files under `/root/reference/data/` — the anchors its tests use,
  * reader.rs:728-815 and record/triplet.rs:294-427).
  */
object ParquetFileReader {

  /** Leaf descriptor: schema-DFS leaf + its column chunk metadata.
    * `maxDef`/`maxRep` are computed by the reference's DFS rule
    * (`/root/reference/src/schema/types.rs:800-854`): OPTIONAL adds one def
    * level, REPEATED adds one def and one rep level. */
  final case class LeafColumn(path: Seq[String], typ: Int, typeLength: Int,
      convertedType: Int, maxDef: Int, maxRep: Int, meta: PqColumnMeta)

  /** Raw value/def/rep triplets for one column chunk; `values` is
    * null-suppressed (one entry per slot with def == maxDef). `defs`/`reps`
    * are null when the respective max level is 0 (all zeros). */
  final case class Triplets(values: IndexedSeq[Any], defs: Array[Int],
      reps: Array[Int], maxDef: Int) {
    def slots: Int = if (defs != null) defs.length else values.length
    def defAt(i: Int): Int = if (defs == null) 0 else defs(i)
    def repAt(i: Int): Int = if (reps == null) 0 else reps(i)
  }

  // ------------------------------------------------------------ schema tree

  sealed trait SchemaNode { def elem: PqSchemaElement }
  final case class SchemaLeaf(elem: PqSchemaElement, leafIdx: Int,
      maxDef: Int, maxRep: Int) extends SchemaNode
  final case class SchemaGroup(elem: PqSchemaElement,
      children: Seq[SchemaNode]) extends SchemaNode

  /** Parse the flattened footer schema (DFS with child counts) into a tree;
    * returns (root children, leaves in DFS = column-chunk order). */
  def schemaTree(meta: PqFileMeta): (Seq[SchemaNode], IndexedSeq[SchemaLeaf]) = {
    val leaves = ArrayBuffer.empty[SchemaLeaf]
    var pos = 1
    def parse(pdef: Int, prep: Int): SchemaNode = {
      val se = meta.schema(pos)
      pos += 1
      val d = pdef + (if (se.repetition == 1 || se.repetition == 2) 1 else 0)
      val r = prep + (if (se.repetition == 2) 1 else 0)
      if (se.numChildren == 0) {
        val leaf = SchemaLeaf(se, leaves.length, d, r)
        leaves += leaf
        leaf
      } else SchemaGroup(se, (0 until se.numChildren).map(_ => parse(d, r)))
    }
    val root = meta.schema.head
    val children = (0 until root.numChildren).map(_ => parse(0, 0))
    (children, leaves.toIndexedSeq)
  }

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

  /** Process-wide footer cache. One query reads each footer 2-3× on the
    * driver (statistics + planning) and once per row-group task on the
    * executors — a file split into N row-group tasks would parse the same
    * footer N times. PqFileMeta is immutable, so cache by identity on disk:
    * the [[GraftIO.cacheKey]] (path, size, mtime, and — locally — the
    * filesystem fileKey/inode, so a same-size in-place rewrite within the
    * mtime granularity still misses). An in-place data-region corruption
    * (tests do this) safely hits since the footer region is unchanged.
    * Bounded; cleared wholesale on overflow (footers are KBs — the bound
    * exists for pathological many-file churn, not memory pressure in
    * normal use). */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, PqFileMeta]()
  private val FooterCacheMax = 8192

  /** Footer metadata alone, reading only the file tail (8-byte trailer →
    * footer region) — planning-time metadata access must stay O(footer)
    * regardless of file size. Offsets inside the returned meta remain
    * absolute file offsets. */
  def readFooterOnly(path: String): PqFileMeta = {
    val key = GraftIO.forPath(path).cacheKey(path)
    val hit = footerCache.get(key)
    if (hit != null) return hit
    val meta = readFooterUncached(path)
    if (footerCache.size >= FooterCacheMax) footerCache.clear()
    footerCache.put(key, meta)
    meta
  }

  private def readFooterUncached(path: String): PqFileMeta = {
    val in = GraftIO.forPath(path).open(path)
    try {
      val n = in.length
      require(n > 12, s"$path too short to be a parquet file")
      val tail = new Array[Byte](8)
      in.readFully(n - 8, tail)
      require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' &&
        tail(7) == '1', s"$path: not a parquet file (trailer magic)")
      val footerLen = (tail(0) & 0xFF) | ((tail(1) & 0xFF) << 8) |
        ((tail(2) & 0xFF) << 16) | ((tail(3) & 0xFF) << 24)
      require(footerLen > 0 && footerLen <= n - 12,
        s"$path: bad footer length $footerLen")
      val buf = new Array[Byte](footerLen)
      in.readFully(n - 8 - footerLen, buf)
      ParquetMeta.parseFileMeta(buf, 0)
    } finally in.close()
  }

  /** Leaf columns of row group `rg` with full level descriptors. */
  def leafColumns(meta: PqFileMeta, rg: Int): IndexedSeq[LeafColumn] = {
    val (_, leaves) = schemaTree(meta)
    val cols = meta.rowGroups(rg).columns
    require(cols.size == leaves.size,
      s"row group has ${cols.size} chunks for ${leaves.size} schema leaves")
    leaves.map { l =>
      val cm = cols(l.leafIdx)
      LeafColumn(cm.pathInSchema, cm.typ, l.elem.typeLength,
        l.elem.convertedType, l.maxDef, l.maxRep, cm)
    }
  }

  // ------------------------------------------------------- chunk → triplets

  /** Decode one column chunk to raw triplets. Values: null | Boolean | Int |
    * Long | Float | Double | Array[Byte] (BYTE_ARRAY / INT96 / FLBA raw). */
  def readTriplets(bytes: Array[Byte], col: LeafColumn): Triplets = {
    val cm = col.meta
    // corruption guards: sizes claimed by (possibly corrupted) metadata must
    // stay self-consistent, or we fail cleanly instead of allocating per a
    // hostile length. Bools pack 8 values per UNCOMPRESSED byte — the
    // loosest PLAIN bound — and `bytes` may be just this chunk's compressed
    // range (ChunkFetcher), so bound against the larger of the two. RLE and
    // delta pages are legitimately denser than any byte-derived bound (one
    // run header can cover millions of values), so small claims pass on an
    // absolute ceiling instead: 16M values caps the transient decode
    // allocation a hostile claim can force at ~128 MB, and real chunks that
    // dense at bigger counts are outside what this materializing reader
    // targets (row groups are 64Ki rows from our writer, <~1M elsewhere).
    // totalUncompressedSize is itself a FOOTER claim, so it enters the
    // bound only clamped to a plausible block-codec ratio (256x) of the
    // bytes actually present — otherwise one forged field re-opens the
    // huge-claim hole this guard exists to close.
    require(cm.numValues >= 0 && (cm.numValues <=
      8L * math.max(bytes.length.toLong,
        math.min(cm.totalUncompressedSize, 256L * bytes.length)) ||
      cm.numValues <= (1L << 24)),
      s"chunk claims ${cm.numValues} values in ${bytes.length} bytes " +
        s"(uncompressed ${cm.totalUncompressedSize})")
    var off =
      if (cm.dictionaryPageOffset >= 0) math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    require(off >= 0 && off < bytes.length, s"page offset $off out of file")
    var dict: IndexedSeq[Any] = null
    // capacity HINT only (buffers grow as pages actually decode), capped so
    // hostile metadata cannot force a huge upfront allocation
    val sizeHint = math.min(cm.numValues, 1L << 20).toInt
    val values = new ArrayBuffer[Any](sizeHint)
    val defs = if (col.maxDef > 0) new ArrayBuffer[Int](sizeHint) else null
    val reps = if (col.maxRep > 0) new ArrayBuffer[Int](sizeHint) else null
    var remaining = cm.numValues
    while (remaining > 0) {
      val ph = ParquetMeta.parsePageHeader(bytes, off.toInt)
      val dataStart = off.toInt + ph.headerLen
      require(ph.compressedSize >= 0 &&
        dataStart.toLong + ph.compressedSize <= bytes.length,
        s"page claims ${ph.compressedSize} compressed bytes past EOF")
      require(ph.uncompressedSize >= 0 &&
        ph.uncompressedSize <= math.max(1 << 20, 1024L * ph.compressedSize),
        s"page claims implausible uncompressed size ${ph.uncompressedSize}")
      require(ph.numValues >= 0 && (ph.pageType == 2 ||
        ph.numValues <= remaining),
        s"page claims ${ph.numValues} values, chunk has $remaining left")
      ph.pageType match {
        case 2 => // dictionary page: PLAIN values
          dict = decodeDictPage(bytes, dataStart, ph, col)
        case 0 | 3 =>
          val (vals, dl, rl) = decodeDataPage(bytes, dataStart, ph, col, dict)
          if (rl != null) reps ++= rl
          if (dl != null) defs ++= dl
          values ++= vals
          remaining -= ph.numValues
        case other => throw new IllegalArgumentException(
          s"page type $other not supported")
      }
      off = dataStart + ph.compressedSize
    }
    Triplets(values.toIndexedSeq,
      if (defs != null) defs.toArray else null,
      if (reps != null) reps.toArray else null,
      col.maxDef)
  }

  /** Verify a page's CRC32 (PageHeader field 4) over the body bytes as
    * written, when the writer stamped one — corrupted pages fail here with
    * a clear message instead of obscurely inside a decoder. Pages pruned by
    * statistics are never read, so they are never checked (same contract as
    * parquet-mr's verify-checksum mode). */
  /** Page-CRC verification mode, settable via the system property
    * `graft.parquet.page.verify-crc`: `all` (default — v1, v2, and dict
    * pages), `v1` (skip DATA_PAGE_V2 — the v2 CRC definition was only
    * settled by PARQUET-2048, and files stamped by older third-party
    * writers carry differently-computed v2 CRCs that would hard-fail an
    * otherwise-readable file), or `off` (parquet-mr's default posture:
    * verification opt-in). */
  private def crcMode: String =
    System.getProperty("graft.parquet.page.verify-crc", "all")

  private def checkPageCrc(ph: PqPageHeader, bytes: Array[Byte],
      dataStart: Int): Unit =
    if (ph.crcDefined) {
      val mode = crcMode
      val skip = mode == "off" || (mode == "v1" && ph.pageType == 3)
      if (!skip) {
        val c = new java.util.zip.CRC32
        c.update(bytes, dataStart, ph.compressedSize)
        require(c.getValue.toInt == ph.crc,
          s"page CRC mismatch: stored ${ph.crc}, computed ${c.getValue.toInt}" +
            " (set -Dgraft.parquet.page.verify-crc=v1|off for files from " +
            "pre-PARQUET-2048 writers)")
      }
    }

  private def decodeDictPage(bytes: Array[Byte], dataStart: Int,
      ph: PqPageHeader, col: LeafColumn): IndexedSeq[Any] = {
    checkPageCrc(ph, bytes, dataStart)
    val raw = decompress(bytes, dataStart, ph.compressedSize,
      ph.uncompressedSize, col.meta.codec)
    require(ph.numValues <= raw.length, // every dict entry is >= 1 byte
      s"dict page claims ${ph.numValues} entries in ${raw.length} bytes")
    decodePlain(col.typ, col.typeLength, raw, 0, raw.length, ph.numValues)
  }

  /** Decode one DATA page (v1 or v2) of `col`: (null-suppressed values,
    * def levels or null, rep levels or null). Shared by the whole-chunk
    * [[readTriplets]] loop and the page-pruned flat read. */
  private def decodeDataPage(bytes: Array[Byte], dataStart: Int,
      ph: PqPageHeader, col: LeafColumn, dict: IndexedSeq[Any]):
      (IndexedSeq[Any], Array[Int], Array[Int]) = {
    val cm = col.meta
    checkPageCrc(ph, bytes, dataStart)
    ph.pageType match {
      case 0 => // data page v1: [rep levels][def levels][values], one region
        val raw = decompress(bytes, dataStart, ph.compressedSize,
          ph.uncompressedSize, cm.codec)
        val n = ph.numValues
        var pos = 0
        var reps: Array[Int] = null
        if (col.maxRep > 0) {
          val (lv, p2) = readLevelStream(raw, pos, n, col.maxRep, ph.repLevelEncoding)
          pos = p2
          reps = lv
        }
        if (col.maxDef > 0) {
          val (lv, p2) = readLevelStream(raw, pos, n, col.maxDef, ph.defLevelEncoding)
          pos = p2
          (decodeValues(ph.encoding, col, raw, pos,
            countMax(lv, col.maxDef), dict), lv, reps)
        } else {
          (decodeValues(ph.encoding, col, raw, pos, n, dict), null, reps)
        }
      case 3 =>
        // data page v2 (reference reader.rs:449-533): rep + def level
        // streams sit UNCOMPRESSED right after the header, RLE with NO
        // 4-byte length prefix (lengths come from the header); only the
        // value region is block-compressed (unless is_compressed=false).
        val n = ph.numValues
        val repLen = ph.repLevelsByteLen
        val defLen = ph.defLevelsByteLen
        var reps: Array[Int] = null
        if (col.maxRep > 0) {
          val dec = new RleHybridDecoder(levelBitWidth(col.maxRep), bytes,
            dataStart, dataStart + repLen)
          val tmp = new Array[Long](n)
          dec.get(tmp, 0, n)
          reps = tmp.map(_.toInt)
        }
        var nNonNull = n - ph.numNulls
        var defs: Array[Int] = null
        if (col.maxDef > 0) {
          val dec = new RleHybridDecoder(levelBitWidth(col.maxDef), bytes,
            dataStart + repLen, dataStart + repLen + defLen)
          val tmp = new Array[Long](n)
          dec.get(tmp, 0, n)
          defs = tmp.map(_.toInt)
          nNonNull = countMax(defs, col.maxDef)
        }
        val vOff = dataStart + repLen + defLen
        val vUnc = ph.uncompressedSize - repLen - defLen
        val vraw =
          if (ph.isCompressed && cm.codec != PqCodec.Uncompressed)
            decompress(bytes, vOff, ph.compressedSize - repLen - defLen,
              vUnc, cm.codec)
          else java.util.Arrays.copyOfRange(bytes, vOff, vOff + vUnc)
        (decodeValues(ph.encoding, col, vraw, 0, nNonNull, dict), defs, reps)
      case other => throw new IllegalArgumentException(
        s"page type $other not supported")
    }
  }

  private def countMax(lv: Array[Int], max: Int): Int = {
    var c = 0
    var i = 0
    while (i < lv.length) { if (lv(i) == max) c += 1; i += 1 }
    c
  }

  private def decodeValues(encoding: Int, col: LeafColumn, raw: Array[Byte],
      pos: Int, nNonNull: Int, dict: IndexedSeq[Any]): IndexedSeq[Any] =
    encoding match {
      case PqEncoding.Plain =>
        decodePlain(col.typ, col.typeLength, raw, pos, raw.length - pos, nNonNull)
      case PqEncoding.PlainDictionary | PqEncoding.RleDictionary =>
        require(dict != null, "data page references a missing dictionary")
        if (nNonNull == 0) IndexedSeq.empty
        else {
          val width = raw(pos) & 0xFF
          val dec = new RleHybridDecoder(width, raw, pos + 1, raw.length)
          val ids = new Array[Long](nNonNull)
          dec.get(ids, 0, nNonNull)
          ids.map(id => dict(id.toInt)).toIndexedSeq
        }
      case PqEncoding.DeltaBinaryPacked =>
        val vs = DeltaBinaryPackedDecoder.decode(slice(raw, pos),
          int32 = col.typ == PqType.Int32)
        require(vs.length >= nNonNull,
          s"delta stream has ${vs.length} values, page needs $nNonNull")
        if (col.typ == PqType.Int32) (0 until nNonNull).map(i => vs(i).toInt)
        else (0 until nNonNull).map(vs)
      case PqEncoding.DeltaLengthByteArray =>
        bytesVecValues(DeltaLengthByteArrayCodec.decode(slice(raw, pos)), nNonNull)
      case PqEncoding.DeltaByteArray =>
        bytesVecValues(DeltaByteArrayCodec.decode(slice(raw, pos)), nNonNull)
      case PqEncoding.ByteStreamSplit =>
        col.typ match {
          case PqType.Float =>
            ByteStreamSplitCodec.decodeFloats(raw, pos, nNonNull).toIndexedSeq
          case PqType.Double =>
            ByteStreamSplitCodec.decodeDoubles(raw, pos, nNonNull).toIndexedSeq
          case other => throw new IllegalArgumentException(
            s"BYTE_STREAM_SPLIT over physical type $other not supported")
        }
      case PqEncoding.Rle =>
        // RLE-encoded BOOLEAN values: 4-byte LE length prefix + hybrid runs
        require(col.typ == PqType.Boolean, "RLE data pages are boolean-only")
        val len = (raw(pos) & 0xFF) | ((raw(pos + 1) & 0xFF) << 8) |
          ((raw(pos + 2) & 0xFF) << 16) | ((raw(pos + 3) & 0xFF) << 24)
        val dec = new RleHybridDecoder(1, raw, pos + 4, pos + 4 + len)
        val tmp = new Array[Long](nNonNull)
        dec.get(tmp, 0, nNonNull)
        (0 until nNonNull).map(i => tmp(i) != 0L)
      case other => throw new IllegalArgumentException(
        s"data page encoding $other not supported")
    }

  private def slice(raw: Array[Byte], pos: Int): Array[Byte] =
    if (pos == 0) raw else java.util.Arrays.copyOfRange(raw, pos, raw.length)

  private def bytesVecValues(v: BytesVec, n: Int): IndexedSeq[Any] =
    (0 until n).map(i =>
      java.util.Arrays.copyOfRange(v.data, v.start(i), v.start(i) + v.len(i)))

  /** One v1 level stream: RLE (4-byte LE length prefix) or legacy BIT_PACKED
    * (fixed width, MSB-first — reference levels.rs:142-264). Returns the
    * levels and the position after the stream. */
  private def readLevelStream(raw: Array[Byte], pos0: Int, n: Int,
      maxLevel: Int, encoding: Int): (Array[Int], Int) = {
    var pos = pos0
    val width = levelBitWidth(maxLevel)
    encoding match {
      case PqEncoding.Rle =>
        val len = (raw(pos) & 0xFF) | ((raw(pos + 1) & 0xFF) << 8) |
          ((raw(pos + 2) & 0xFF) << 16) | ((raw(pos + 3) & 0xFF) << 24)
        pos += 4
        val dec = new RleHybridDecoder(width, raw, pos, pos + len)
        pos += len
        val tmp = new Array[Long](n)
        dec.get(tmp, 0, n)
        (tmp.map(_.toInt), pos)
      case PqEncoding.BitPacked =>
        val bytesUsed = (n * width + 7) / 8
        val out = new Array[Int](n)
        var bit = 0
        var i = 0
        while (i < n) {
          var v = 0
          var k = 0
          while (k < width) {
            val b = raw(pos + (bit >> 3)) & 0xFF
            v = (v << 1) | ((b >> (7 - (bit & 7))) & 1)
            bit += 1
            k += 1
          }
          out(i) = v
          i += 1
        }
        (out, pos + bytesUsed)
      case other =>
        throw new IllegalArgumentException(s"level encoding $other")
    }
  }

  // ------------------------------------------- typed flat column decode
  // The vectorized scan's hot path: one FLAT column chunk decoded into a
  // typed ColVec (null-suppressed) + def levels, with NO per-value boxing
  // and NO per-value byte-array copies — primitives bulk-copy into Spark
  // column vectors, string bytes copy arena→vector once. INT96/FLBA chunks
  // are not supported here (callers fall back to the boxed path).

  /** (non-null values as a typed ColVec, def levels or null). */
  def readColumnVec(bytes: Array[Byte], col: Column): (ColVec, Array[Int]) = {
    val leaf = LeafColumn(Seq(col.name), col.typ, -1, -1, col.maxDef, 0, col.meta)
    val cm = col.meta
    // same density guard as readTriplets: byte-derived bound for PLAIN-ish
    // pages, absolute 16M-value ceiling for legitimately-denser RLE/delta,
    // and the claimed uncompressed size clamped to a plausible codec ratio
    // of the bytes actually present before it widens the bound (see
    // readTriplets). numValues stays strictly under Int.MaxValue so the
    // +1 sentinel in offset arrays can never overflow; a large-but-honest
    // totalUncompressedSize (>2 GB chunk from a big-row-group writer) must
    // still read — only a negative claim is rejected outright.
    require(cm.totalUncompressedSize >= 0,
      s"chunk claims ${cm.totalUncompressedSize} uncompressed bytes")
    require(cm.numValues >= 0 && cm.numValues <= (Int.MaxValue - 16).toLong &&
      (cm.numValues <=
        8L * math.max(bytes.length.toLong,
          math.min(cm.totalUncompressedSize, 256L * bytes.length)) ||
        cm.numValues <= (1L << 24)),
      s"chunk claims ${cm.numValues} values in ${bytes.length} bytes")
    var off =
      if (cm.dictionaryPageOffset >= 0)
        math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    require(off >= 0 && off < bytes.length, s"page offset $off out of file")
    var dict: ColVec = null
    val parts = ArrayBuffer.empty[ColVec]
    // byte-array chunks decode into ONE shared arena across pages (single
    // copy per value) instead of per-page vectors + a whole-arena concat —
    // on a multi-page string chunk the concat alone re-copies every byte.
    // The footer sizes are only capacity HINTS (both accumulator arrays
    // double on demand), so clamp them to sane multiples of the bytes
    // actually read: a crafted footer must not force a ~2 GB upfront
    // allocation of either the data arena or the offsets array
    val acc: BytesAccum =
      if (col.typ == PqType.ByteArray)
        new BytesAccum(
          math.min(math.min(cm.totalUncompressedSize,
            64L * bytes.length + 64), (Int.MaxValue - 16).toLong).toInt,
          math.min(cm.numValues, 1L << 20).toInt)
      else null
    val defParts = if (col.maxDef > 0) ArrayBuffer.empty[Array[Int]] else null
    var remaining = cm.numValues
    while (remaining > 0) {
      val ph = ParquetMeta.parsePageHeader(bytes, off.toInt)
      val dataStart = off.toInt + ph.headerLen
      require(ph.compressedSize >= 0 &&
        dataStart.toLong + ph.compressedSize <= bytes.length,
        s"page claims ${ph.compressedSize} compressed bytes past EOF")
      checkPageCrc(ph, bytes, dataStart)
      ph.pageType match {
        case 2 =>
          val raw = decompress(bytes, dataStart, ph.compressedSize,
            ph.uncompressedSize, cm.codec)
          require(ph.numValues <= raw.length,
            s"dict page claims ${ph.numValues} entries in ${raw.length} bytes")
          dict = decodePlainVec(col.typ, raw, 0, raw.length, ph.numValues)
        case 0 =>
          val raw = decompress(bytes, dataStart, ph.compressedSize,
            ph.uncompressedSize, cm.codec)
          val n = ph.numValues
          require(n >= 0 && n <= remaining, s"page claims $n values")
          var pos = 0
          var nNonNull = n
          if (col.maxDef > 0) {
            val (lv, p2) = readLevelStream(raw, pos, n, col.maxDef,
              ph.defLevelEncoding)
            pos = p2
            defParts += lv
            nNonNull = countMax(lv, col.maxDef)
          }
          if (acc != null)
            decodeValuesInto(ph.encoding, raw, pos, nNonNull, dict, acc)
          else parts += decodeValuesVec(ph.encoding, col.typ, raw, pos,
            nNonNull, dict)
          remaining -= n
        case 3 =>
          val n = ph.numValues
          require(n >= 0 && n <= remaining, s"page claims $n values")
          val defLen = ph.defLevelsByteLen
          var nNonNull = n - ph.numNulls
          if (col.maxDef > 0) {
            val dec = new RleHybridDecoder(levelBitWidth(col.maxDef), bytes,
              dataStart, dataStart + defLen)
            val tmp = new Array[Long](n)
            dec.get(tmp, 0, n)
            val lv = tmp.map(_.toInt)
            defParts += lv
            nNonNull = countMax(lv, col.maxDef)
          }
          val vOff = dataStart + defLen
          val vUnc = ph.uncompressedSize - defLen
          val vraw =
            if (ph.isCompressed && cm.codec != PqCodec.Uncompressed)
              decompress(bytes, vOff, ph.compressedSize - defLen, vUnc, cm.codec)
            else java.util.Arrays.copyOfRange(bytes, vOff, vOff + vUnc)
          if (acc != null)
            decodeValuesInto(ph.encoding, vraw, 0, nNonNull, dict, acc)
          else parts += decodeValuesVec(ph.encoding, col.typ, vraw, 0,
            nNonNull, dict)
          remaining -= n
        case other => throw new IllegalArgumentException(
          s"page type $other not supported")
      }
      off = dataStart.toLong + ph.compressedSize
    }
    val vec =
      if (acc != null) acc.toVec
      else if (parts.isEmpty) decodePlainVec(col.typ, Array.emptyByteArray, 0, 0, 0)
      else if (parts.size == 1) parts.head
      else ChunkCodec.concat(parts.toSeq)
    val defs =
      if (defParts == null) null
      else if (defParts.size == 1) defParts.head
      else {
        val out = new Array[Int](defParts.map(_.length).sum)
        var p = 0
        defParts.foreach { a =>
          System.arraycopy(a, 0, out, p, a.length); p += a.length
        }
        out
      }
    (vec, defs)
  }

  private def decodePlainVec(typ: Int, buf: Array[Byte], off: Int, len: Int,
      n: Int): ColVec = {
    val phys = typ match {
      case PqType.Boolean => PhysicalType.Bool
      case PqType.Int32 => PhysicalType.Int32
      case PqType.Int64 => PhysicalType.Int64
      case PqType.Float => PhysicalType.Float
      case PqType.Double => PhysicalType.Double
      case PqType.ByteArray => PhysicalType.Bytes
      case other => throw new IllegalArgumentException(
        s"typed decode: physical type $other unsupported")
    }
    PlainCodec.decodeSlice(phys, buf, off, len, n)
  }

  /** Byte-array page decode into the shared chunk accumulator: PLAIN and
    * dictionary pages write values straight in (single copy); the delta
    * family reuses its page decoder and appends (same copies as the old
    * per-page-vector path). */
  private def decodeValuesInto(encoding: Int, raw: Array[Byte], pos: Int,
      nNonNull: Int, dict: ColVec, acc: BytesAccum): Unit = encoding match {
    case PqEncoding.Plain =>
      PlainCodec.decodeBytesInto(raw, pos, raw.length - pos, nNonNull, acc)
    case PqEncoding.PlainDictionary | PqEncoding.RleDictionary =>
      require(dict != null, "data page references a missing dictionary")
      if (nNonNull > 0) {
        val width = raw(pos) & 0xFF
        val dec = new RleHybridDecoder(width, raw, pos + 1, raw.length)
        val ids = new Array[Long](nNonNull)
        dec.get(ids, 0, nNonNull)
        val idx = new Array[Int](nNonNull)
        var i = 0
        val dn = dict.length
        while (i < nNonNull) {
          val id = ids(i).toInt
          require(id >= 0 && id < dn, s"dict id $id out of [0,$dn)")
          idx(i) = id
          i += 1
        }
        ChunkCodecSupport.gatherBytesInto(dict.asInstanceOf[BytesVec], idx, acc)
      }
    case other =>
      acc.append(decodeValuesVec(other, PqType.ByteArray, raw, pos,
        nNonNull, dict).asInstanceOf[BytesVec])
  }

  private def decodeValuesVec(encoding: Int, typ: Int, raw: Array[Byte],
      pos: Int, nNonNull: Int, dict: ColVec): ColVec = encoding match {
    case PqEncoding.Plain =>
      decodePlainVec(typ, raw, pos, raw.length - pos, nNonNull)
    case PqEncoding.PlainDictionary | PqEncoding.RleDictionary =>
      require(dict != null, "data page references a missing dictionary")
      if (nNonNull == 0) decodePlainVec(typ, Array.emptyByteArray, 0, 0, 0)
      else {
        val width = raw(pos) & 0xFF
        val dec = new RleHybridDecoder(width, raw, pos + 1, raw.length)
        val ids = new Array[Long](nNonNull)
        dec.get(ids, 0, nNonNull)
        val idx = new Array[Int](nNonNull)
        var i = 0
        val dn = dict.length
        while (i < nNonNull) {
          val id = ids(i).toInt
          require(id >= 0 && id < dn, s"dict id $id out of [0,$dn)")
          idx(i) = id
          i += 1
        }
        ChunkCodecSupport.gather(dict, idx)
      }
    case PqEncoding.DeltaBinaryPacked =>
      val vs = DeltaBinaryPackedDecoder.decode(slice(raw, pos),
        int32 = typ == PqType.Int32)
      require(vs.length >= nNonNull,
        s"delta stream has ${vs.length} values, page needs $nNonNull")
      if (typ == PqType.Int32) {
        val out = new Array[Int](nNonNull)
        var i = 0
        while (i < nNonNull) { out(i) = vs(i).toInt; i += 1 }
        IntVec(out)
      } else LongVec(java.util.Arrays.copyOf(vs, nNonNull))
    case PqEncoding.DeltaLengthByteArray =>
      trimBytes(DeltaLengthByteArrayCodec.decode(slice(raw, pos)), nNonNull)
    case PqEncoding.DeltaByteArray =>
      trimBytes(DeltaByteArrayCodec.decode(slice(raw, pos)), nNonNull)
    case PqEncoding.ByteStreamSplit => typ match {
      case PqType.Float =>
        FloatVec(ByteStreamSplitCodec.decodeFloats(raw, pos, nNonNull))
      case PqType.Double =>
        DoubleVec(ByteStreamSplitCodec.decodeDoubles(raw, pos, nNonNull))
      case other => throw new IllegalArgumentException(
        s"BYTE_STREAM_SPLIT over physical type $other not supported")
    }
    case PqEncoding.Rle =>
      require(typ == PqType.Boolean, "RLE data pages are boolean-only")
      val len = (raw(pos) & 0xFF) | ((raw(pos + 1) & 0xFF) << 8) |
        ((raw(pos + 2) & 0xFF) << 16) | ((raw(pos + 3) & 0xFF) << 24)
      val dec = new RleHybridDecoder(1, raw, pos + 4, pos + 4 + len)
      val tmp = new Array[Long](nNonNull)
      dec.get(tmp, 0, nNonNull)
      val out = new Array[Boolean](nNonNull)
      var i = 0
      while (i < nNonNull) { out(i) = tmp(i) != 0L; i += 1 }
      BoolVec(out)
    case other => throw new IllegalArgumentException(
      s"data page encoding $other not supported")
  }

  private def trimBytes(v: BytesVec, n: Int): BytesVec =
    if (v.length == n) v
    else BytesVec(v.data, java.util.Arrays.copyOf(v.offsets, n + 1))

  // ------------------------------------------------------------ ranged I/O
  // A projected scan must not READ unprojected bytes, not merely skip
  // decoding them: at 100 TB a 2-of-20-column projection that slurps whole
  // files does 10× the I/O the query needs. Chunk offsets in the footer
  // (data/dictionary page offset + total_compressed_size) delimit each
  // column chunk's byte range exactly, so a task reads the footer tail plus
  // only the projected chunks' ranges.

  /** Byte range [start, end) of one column chunk inside its file. */
  def chunkByteRange(cm: PqColumnMeta): (Long, Long) = {
    val start =
      if (cm.dictionaryPageOffset >= 0)
        math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    (start, start + cm.totalCompressedSize)
  }

  /** The same chunk metadata with page offsets rebased to a buffer whose
    * byte 0 is the chunk's first byte (what [[ChunkFetcher.fetch]] returns). */
  def rebaseChunk(cm: PqColumnMeta): PqColumnMeta = {
    val start = chunkByteRange(cm)._1
    cm.copy(
      dataPageOffset = cm.dataPageOffset - start,
      dictionaryPageOffset =
        if (cm.dictionaryPageOffset >= 0) cm.dictionaryPageOffset - start
        else -1L)
  }

  /** Random-access per-chunk reader: each fetch reads ONLY that chunk's
    * byte range, never the rest of the file. All downstream decode
    * entry points take (buffer, chunk meta) with offsets drawn from the
    * meta, so handing them the fetched buffer plus rebased meta reuses
    * the whole decode layer unchanged. */
  final class ChunkFetcher(path: String) extends AutoCloseable {
    private val in = GraftIO.forPath(path).open(path)
    private val fileLen = in.length
    def fetch(cm: PqColumnMeta): (Array[Byte], PqColumnMeta) = {
      val (s, e) = chunkByteRange(cm)
      require(s >= 0 && s <= e && e <= fileLen,
        s"chunk byte range [$s,$e) outside $fileLen-byte file")
      val buf = new Array[Byte]((e - s).toInt)
      in.readFully(s, buf)
      (buf, rebaseChunk(cm))
    }
    def fetchLeaf(col: LeafColumn): (Array[Byte], LeafColumn) = {
      val (b, cm) = fetch(col.meta)
      (b, col.copy(meta = cm))
    }
    def fetchColumn(col: Column): (Array[Byte], Column) = {
      val (b, cm) = fetch(col.meta)
      (b, col.copy(meta = cm))
    }
    /** Raw absolute byte range — page-index and bloom blobs live outside
      * any chunk's range. */
    def range(off: Long, len: Int): Array[Byte] = {
      require(off >= 0 && len >= 0 && off + len <= fileLen,
        s"range [$off,+$len) outside $fileLen-byte file")
      val buf = new Array[Byte](len)
      in.readFully(off, buf)
      buf
    }
    override def close(): Unit = in.close()
  }

  // ------------------------------------------------------------- flat reads

  final case class Column(name: String, typ: Int, maxDef: Int, meta: PqColumnMeta)

  /** Leaf columns of a FLAT schema (root group + primitive children). */
  def flatColumns(meta: PqFileMeta, rg: Int): Seq[Column] = {
    val leaves = meta.schema.drop(1)
    require(leaves.forall(_.numChildren == 0),
      "nested schemas not supported by the flat reader (use readFileRows)")
    leaves.zip(meta.rowGroups(rg).columns).map { case (se, cm) =>
      Column(se.name, cm.typ, if (se.repetition == 1) 1 else 0, cm)
    }
  }

  /** Decode one FLAT column chunk to per-row values (nulls inline). */
  def readColumn(bytes: Array[Byte], col: Column): IndexedSeq[Any] = {
    val t = readTriplets(bytes, LeafColumn(Seq(col.name), col.typ, -1, -1,
      col.maxDef, 0, col.meta))
    if (t.defs == null) t.values
    else {
      val out = new ArrayBuffer[Any](t.defs.length)
      var i = 0
      var vi = 0
      while (i < t.defs.length) {
        if (t.defs(i) == col.maxDef) { out += t.values(vi); vi += 1 }
        else out += null
        i += 1
      }
      out.toIndexedSeq
    }
  }

  /** Read a whole flat file: (column names, per-column values). */
  def readFile(path: String): (Seq[String], Seq[IndexedSeq[Any]]) = {
    val bytes = GraftIO.forPath(path).readAll(path)
    val meta = readFooter(bytes)
    val allCols = (0 until meta.rowGroups.size).map(rg => flatColumns(meta, rg))
    val names = allCols.head.map(_.name)
    val merged = names.indices.map { c =>
      allCols.indices.flatMap(rg => readColumn(bytes, allCols(rg)(c))).toIndexedSeq
    }
    (names, merged)
  }

  // ------------------------------------------------ statistics pruning
  // Row-group filtering over footer min/max — the reference's unrealized
  // TODO (`/root/reference/src/file/reader.rs:198`); stats themselves are
  // its statistics.rs layer. Pruned groups are never read or decoded.

  def chunkFor(meta: PqFileMeta, rg: Int,
      colName: String): Option[PqColumnMeta] =
    meta.rowGroups(rg).columns.find(c =>
      c.pathInSchema.headOption.contains(colName))

  /** Row groups whose `col` [min,max] may intersect [lo,hi] — INT32/INT64
    * stat encoding (LE). Groups without usable stats are kept (sound). */
  def rowGroupsInRange(meta: PqFileMeta, colName: String, lo: Long,
      hi: Long): Seq[Int] =
    meta.rowGroups.indices.filter { rg =>
      chunkFor(meta, rg, colName).flatMap(_.stats) match {
        case Some(st) if st.min.nonEmpty && st.max.nonEmpty =>
          MinMax.leToLong(st.max) >= lo && MinMax.leToLong(st.min) <= hi
        case _ => true
      }
    }

  /** Row groups whose [min,max] byte stats intersect [lo,hi] (unsigned
    * lexicographic). A null `lo`/`hi` side is unbounded. Conservative with
    * truncated stats: stored min ≤ real min and stored max ≥ real max, so
    * a surviving group can be a false positive but never a false miss.
    * Legacy-only stats (deprecated thrift fields 1/2, signed-compared by
    * old writers) are ignored unless min == max — see PqStats. */
  def rowGroupsInRangeBytes(meta: PqFileMeta, colName: String,
      lo: Array[Byte], hi: Array[Byte]): Seq[Int] =
    meta.rowGroups.indices.filter { rg =>
      chunkFor(meta, rg, colName).flatMap(_.stats) match {
        case Some(st) if st.min.nonEmpty && st.byteOrderTrusted =>
          (hi == null || MinMax.compareBytes(st.min, hi) <= 0) &&
            (lo == null || st.max.isEmpty ||
              MinMax.compareBytes(st.max, lo) >= 0)
        case _ => true
      }
    }

  /** Assembled records from only the row groups surviving a [lo,hi] range
    * predicate on an INT32/INT64 column. */
  def readFileRowsWhere(path: String, colName: String, lo: Long,
      hi: Long): (Seq[String], IndexedSeq[PqGroupVal]) = {
    val meta = readFooterOnly(path)
    val (rootChildren, _) = schemaTree(meta)
    val names = rootChildren.map(_.elem.name)
    val fetch = new ChunkFetcher(path)
    try {
      // pruned row groups are never read from disk, not just never decoded
      val rows = rowGroupsInRange(meta, colName, lo, hi)
        .flatMap(rg => readRowsFetched(fetch, meta, rg))
      (names, rows.toIndexedSeq)
    } finally fetch.close()
  }

  // --------------------------------------------------- page-level pruning
  // Finer granularity than row groups: every data page of our writer's
  // multi-page chunks carries min/max/null-count statistics in its header
  // (DataPageHeader field 5 / DataPageHeaderV2 field 8), so a range
  // predicate can skip individual ~1 MiB pages — they are never
  // decompressed or decoded. Pages without statistics always survive.

  /** One data page of a flat chunk: header file offset, parsed header, and
    * the first chunk row it covers (it spans `header.numValues` rows). */
  final case class PageSpan(off: Int, header: PqPageHeader, rowStart: Long)

  /** Walk a FLAT (maxRep == 0) chunk's page headers without decompressing
    * anything. Returns (dictionary page offset or -1, data page spans). */
  def pageSpans(bytes: Array[Byte], cm: PqColumnMeta): (Long, Seq[PageSpan]) = {
    var off =
      if (cm.dictionaryPageOffset >= 0)
        math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    require(off >= 0 && off < bytes.length, s"page offset $off out of file")
    var dictOff = -1L
    var row = 0L
    var remaining = cm.numValues
    val out = Seq.newBuilder[PageSpan]
    while (remaining > 0) {
      val ph = ParquetMeta.parsePageHeader(bytes, off.toInt)
      val dataStart = off.toInt + ph.headerLen
      require(ph.compressedSize >= 0 &&
        dataStart.toLong + ph.compressedSize <= bytes.length,
        s"page claims ${ph.compressedSize} compressed bytes past EOF")
      if (ph.pageType == 2) dictOff = off
      else {
        require(ph.numValues > 0 && ph.numValues <= remaining,
          s"page claims ${ph.numValues} values, chunk has $remaining left")
        out += PageSpan(off.toInt, ph, row)
        row += ph.numValues
        remaining -= ph.numValues
      }
      off = dataStart.toLong + ph.compressedSize
    }
    (dictOff, out.result())
  }

  /** Does an INT32/INT64 stats pair intersect [lo, hi]? Empty stats ⇒ yes. */
  def intStatsOverlap(st: PqStats, lo: Long, hi: Long): Boolean =
    st.min.isEmpty || st.max.isEmpty ||
      (MinMax.leToLong(st.max) >= lo && MinMax.leToLong(st.min) <= hi)

  /** Byte-stats intersection with [lo, hi] (unsigned lexicographic; null
    * side unbounded). Conservative under stat truncation, like
    * [[rowGroupsInRangeBytes]]; legacy-only stats never prune unless
    * min == max (old writers signed-compared binary stats). */
  def byteStatsOverlap(st: PqStats, lo: Array[Byte], hi: Array[Byte]): Boolean =
    st.min.isEmpty || !st.byteOrderTrusted ||
      ((hi == null || MinMax.compareBytes(st.min, hi) <= 0) &&
        (lo == null || st.max.isEmpty || MinMax.compareBytes(st.max, lo) >= 0))

  /** Chunk row ranges (ascending, disjoint, end-exclusive) covered by the
    * pages whose statistics pass `keep`; stat-less pages always pass. */
  def pageRowRanges(bytes: Array[Byte], cm: PqColumnMeta,
      keep: PqStats => Boolean): Seq[(Long, Long)] = {
    val (_, spans) = pageSpans(bytes, cm)
    val out = new ArrayBuffer[(Long, Long)]()
    spans.foreach { s =>
      if (s.header.stats.forall(keep)) {
        val r = (s.rowStart, s.rowStart + s.header.numValues)
        if (out.nonEmpty && out.last._2 == r._1)
          out(out.length - 1) = (out.last._1, r._2)
        else out += r
      }
    }
    out.toSeq
  }

  /** Chunk row ranges from the FOOTER-SIDE page index alone — the same
    * contract as [[pageRowRanges]] with zero chunk-byte I/O: the
    * ColumnIndex supplies per-page min/max/null stats, the OffsetIndex the
    * page row boundaries. Null pages and index/stat gaps are kept
    * (missed skip, never a wrong row). */
  def indexRowRanges(ci: PqColumnIndex, oi: Seq[PqPageLocation], nRows: Long,
      keep: PqStats => Boolean): Seq[(Long, Long)] = {
    val out = new ArrayBuffer[(Long, Long)]()
    var i = 0
    while (i < oi.length) {
      val st = PqStats(
        if (i < ci.minValues.length) ci.minValues(i) else Array.emptyByteArray,
        if (i < ci.maxValues.length) ci.maxValues(i) else Array.emptyByteArray,
        if (i < ci.nullCounts.length) ci.nullCounts(i) else -1L)
      if (keep(st)) {
        val start = oi(i).firstRowIndex
        val end = if (i + 1 < oi.length) oi(i + 1).firstRowIndex else nRows
        if (out.nonEmpty && out.last._2 == start)
          out(out.length - 1) = (out.last._1, end)
        else out += ((start, end))
      }
      i += 1
    }
    out.toSeq
  }

  /** Intersect two ascending disjoint range lists. */
  def intersectRowRanges(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = new ArrayBuffer[(Long, Long)]()
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val lo = math.max(a(i)._1, b(j)._1)
      val hi = math.min(a(i)._2, b(j)._2)
      if (lo < hi) out += ((lo, hi))
      if (a(i)._2 <= b(j)._2) i += 1 else j += 1
    }
    out.toSeq
  }

  /** Decode only the pages of a FLAT column chunk intersecting `ranges`
    * (ascending disjoint chunk-row intervals): returns values (nulls
    * inline) of exactly those rows, in row order. Pages outside the
    * ranges are never decompressed or decoded. */
  def readColumnRowRanges(bytes: Array[Byte], col: Column,
      ranges: Seq[(Long, Long)]): IndexedSeq[Any] = {
    if (ranges.isEmpty) return IndexedSeq.empty
    val leaf = LeafColumn(Seq(col.name), col.typ, -1, -1, col.maxDef, 0, col.meta)
    val (dictOff, spans) = pageSpans(bytes, col.meta)
    var dict: IndexedSeq[Any] = null
    if (dictOff >= 0) {
      val ph = ParquetMeta.parsePageHeader(bytes, dictOff.toInt)
      dict = decodeDictPage(bytes, dictOff.toInt + ph.headerLen, ph, leaf)
    }
    val out = new ArrayBuffer[Any]()
    spans.foreach { s =>
      val pStart = s.rowStart
      val pEnd = s.rowStart + s.header.numValues
      if (ranges.exists(r => r._1 < pEnd && r._2 > pStart)) {
        val (vals, defs, _) =
          decodeDataPage(bytes, s.off + s.header.headerLen, s.header, leaf, dict)
        // rows of this page with nulls expanded inline
        val rowVals: IndexedSeq[Any] =
          if (defs == null) vals
          else {
            val b = new ArrayBuffer[Any](defs.length)
            var vi = 0
            var i = 0
            while (i < defs.length) {
              if (defs(i) == col.maxDef) { b += vals(vi); vi += 1 } else b += null
              i += 1
            }
            b.toIndexedSeq
          }
        ranges.foreach { r =>
          var row = math.max(r._1, pStart)
          val until = math.min(r._2, pEnd)
          while (row < until) { out += rowVals((row - pStart).toInt); row += 1 }
        }
      }
    }
    out.toIndexedSeq
  }

  // --------------------------------------------------- record assembly

  /** An assembled group (struct / record) value. */
  final case class PqGroupVal(names: Seq[String], values: Seq[Any]) {
    def apply(name: String): Any = {
      val i = names.indexOf(name)
      require(i >= 0, s"no field $name in ${names.mkString(",")}")
      values(i)
    }
  }

  /** Read a whole file (nested schemas supported) as assembled records:
    * lists → Vector[Any], maps → Vector[(key, value)] (order- and
    * duplicate-preserving), groups → PqGroupVal, UTF8/ENUM byte arrays →
    * String. The reference's `RowIter` equivalent
    * (`/root/reference/src/record/reader.rs:731-903`). */
  def readFileRows(path: String): (Seq[String], IndexedSeq[PqGroupVal]) = {
    val meta = readFooterOnly(path)
    val (rootChildren, _) = schemaTree(meta)
    val names = rootChildren.map(_.elem.name)
    val fetch = new ChunkFetcher(path)
    try {
      val rows = (0 until meta.rowGroups.size)
        .flatMap(rg => readRowsFetched(fetch, meta, rg))
      (names, rows.toIndexedSeq)
    } finally fetch.close()
  }

  /** Assemble one row group into records. `projection` (top-level field
    * names) prunes column decode: chunks of unselected fields are never
    * decompressed or decoded — the column-pruning half of Spark's
    * ReadSchema pushdown, applied inside our own source. */
  def readRows(bytes: Array[Byte], meta: PqFileMeta, rg: Int,
      projection: Set[String] = null): IndexedSeq[PqGroupVal] =
    readRowsVia(lc => readTriplets(bytes, lc), meta, rg, projection)

  /** [[readRows]] over a [[ChunkFetcher]]: only the projected chunks'
    * byte ranges are ever read from disk. */
  def readRowsFetched(fetch: ChunkFetcher, meta: PqFileMeta, rg: Int,
      projection: Set[String] = null): IndexedSeq[PqGroupVal] =
    readRowsVia(lc => {
      val (b, c) = fetch.fetchLeaf(lc)
      readTriplets(b, c)
    }, meta, rg, projection)

  private def readRowsVia(tripletsOf: LeafColumn => Triplets,
      meta: PqFileMeta, rg: Int,
      projection: Set[String]): IndexedSeq[PqGroupVal] = {
    val (rootChildren, _) = schemaTree(meta)
    val kept =
      if (projection == null) rootChildren
      else rootChildren.filter(c => projection.contains(c.elem.name))
    val leafCols = leafColumns(meta, rg)
    val trips = new Array[Triplets](leafCols.size)
    kept.foreach(c => leafIdxsOf(c).foreach(i =>
      trips(i) = tripletsOf(leafCols(i))))
    val tripsSeq = scala.collection.immutable.ArraySeq.unsafeWrapArray(trips)
    val readers = kept.map(c => buildReader(c, 0, 0, tripsSeq))
    val names = kept.map(_.elem.name)
    val n = meta.rowGroups(rg).numRows
    // loosest physical bound: bools pack 8 values per uncompressed byte
    require(n >= 0 && n <= 8L * math.max(16L, meta.rowGroups(rg).totalByteSize),
      s"row group claims $n rows in ${meta.rowGroups(rg).totalByteSize} bytes")
    (0 until n.toInt).map(_ => PqGroupVal(names, readers.map(_.read())))
  }

  private def leafIdxsOf(node: SchemaNode): Seq[Int] = node match {
    case l: SchemaLeaf => Seq(l.leafIdx)
    case g: SchemaGroup => g.children.flatMap(leafIdxsOf)
  }

  /** Assembly reader tree — the reference's `Reader` combinators
    * (`/root/reference/src/record/reader.rs:98-489`): each node stores the
    * def/rep levels of its PARENT context; `read()` consumes one value,
    * `advance()` consumes one slot when an ancestor is null/empty. */
  private sealed trait RReader {
    def hasNext: Boolean
    def currentDef: Int
    def currentRep: Int
    def read(): Any
    def advance(): Unit
  }

  private final class PrimReader(t: Triplets, convert: Any => Any) extends RReader {
    private var i = 0
    private var vi = 0
    def hasNext: Boolean = i < t.slots
    def currentDef: Int = t.defAt(i)
    def currentRep: Int = t.repAt(i)
    def read(): Any = {
      val v = if (t.defAt(i) == t.maxDef) { val x = t.values(vi); vi += 1; convert(x) }
        else null
      i += 1
      v
    }
    def advance(): Unit = { if (t.defAt(i) == t.maxDef) vi += 1; i += 1 }
  }

  private final class OptionReader(pdef: Int, child: RReader) extends RReader {
    def hasNext: Boolean = child.hasNext
    def currentDef: Int = child.currentDef
    def currentRep: Int = child.currentRep
    def read(): Any =
      if (child.currentDef > pdef) child.read()
      else { child.advance(); null }
    def advance(): Unit = child.advance()
  }

  /** reference record/reader.rs:346-391 — loop one list instance. */
  private final class RepeatedReader(pdef: Int, prep: Int, child: RReader)
      extends RReader {
    def hasNext: Boolean = child.hasNext
    def currentDef: Int = child.currentDef
    def currentRep: Int = child.currentRep
    def read(): Any = {
      val out = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        if (child.currentDef > pdef) out += child.read()
        else { child.advance(); done = true }
        if (!done && (!child.hasNext || child.currentRep <= prep)) done = true
      }
      out.result()
    }
    def advance(): Unit = child.advance()
  }

  /** reference record/reader.rs:393-444 — parallel key/value readers. */
  private final class KeyValueReader(pdef: Int, prep: Int, kr: RReader,
      vr: RReader) extends RReader {
    def hasNext: Boolean = kr.hasNext
    def currentDef: Int = kr.currentDef
    def currentRep: Int = kr.currentRep
    def read(): Any = {
      val out = Vector.newBuilder[(Any, Any)]
      var done = false
      while (!done) {
        if (kr.currentDef > pdef) { val k = kr.read(); val v = vr.read(); out += (k -> v) }
        else { kr.advance(); vr.advance(); done = true }
        if (!done && (!kr.hasNext || kr.currentRep <= prep)) done = true
      }
      out.result()
    }
    def advance(): Unit = { kr.advance(); vr.advance() }
  }

  private final class GroupReader(names: Seq[String], children: Seq[RReader])
      extends RReader {
    def hasNext: Boolean = children.head.hasNext
    def currentDef: Int = children.head.currentDef
    def currentRep: Int = children.head.currentRep
    def read(): Any = PqGroupVal(names, children.map(_.read()))
    def advance(): Unit = children.foreach(_.advance())
  }

  /** Build the reader for `node` in parent context (pdef, prep). */
  private def buildReader(node: SchemaNode, pdef: Int, prep: Int,
      trips: IndexedSeq[Triplets]): RReader = node match {
    case l: SchemaLeaf =>
      val base = new PrimReader(trips(l.leafIdx), converterFor(l.elem))
      l.elem.repetition match {
        case 2 => new RepeatedReader(pdef, prep, base)
        case 1 => new OptionReader(pdef, base)
        case _ => base
      }
    case g: SchemaGroup if g.elem.repetition == 2 =>
      // unannotated repeated group (e.g. repeated_no_annotation.parquet):
      // a list whose element is the group itself
      new RepeatedReader(pdef, prep, innerReader(g, pdef + 1, prep + 1, trips))
    case g: SchemaGroup =>
      val se = g.elem
      val d = if (se.repetition == 1) pdef + 1 else pdef
      val isList = se.convertedType == PqConvertedType.List
      val isMap = se.convertedType == PqConvertedType.Map ||
        se.convertedType == PqConvertedType.MapKeyValue
      val body: RReader =
        if (isList) {
          val rep = g.children.head // the repeated child
          rep match {
            // 3-level LIST: repeated single-field wrapper group — element is
            // the field (parquet LogicalTypes backward-compat rule: a
            // single-field repeated group named "array" or "<name>_tuple" IS
            // the element)
            case rg: SchemaGroup if rg.elem.repetition == 2 &&
                rg.children.size == 1 && rg.elem.name != "array" &&
                !rg.elem.name.endsWith("_tuple") =>
              new RepeatedReader(d, prep,
                buildReader(rg.children.head, d + 1, prep + 1, trips))
            // 2-level legacy: the repeated node is the element
            case other =>
              new RepeatedReader(d, prep, innerReader(other, d + 1, prep + 1, trips))
          }
        } else if (isMap) {
          val kv = g.children.head.asInstanceOf[SchemaGroup] // repeated key_value
          new KeyValueReader(d, prep,
            buildReader(kv.children(0), d + 1, prep + 1, trips),
            buildReader(kv.children(1), d + 1, prep + 1, trips))
        } else {
          new GroupReader(g.children.map(_.elem.name),
            g.children.map(c => buildReader(c, d, prep, trips)))
        }
      if (se.repetition == 1) new OptionReader(pdef, body) else body
  }

  /** Reader for a repeated node treated as the element itself (no extra
    * Option/Repeated wrapper — the enclosing RepeatedReader owns the loop). */
  private def innerReader(node: SchemaNode, d: Int, r: Int,
      trips: IndexedSeq[Triplets]): RReader = node match {
    case l: SchemaLeaf => new PrimReader(trips(l.leafIdx), converterFor(l.elem))
    case g: SchemaGroup => new GroupReader(g.children.map(_.elem.name),
      g.children.map(c => buildReader(c, d, r, trips)))
  }

  private def converterFor(se: PqSchemaElement): Any => Any =
    if (se.typ == PqType.ByteArray &&
      (se.convertedType == PqConvertedType.Utf8 || se.convertedType == 4 /*ENUM*/ ))
      (v: Any) => new String(v.asInstanceOf[Array[Byte]],
        java.nio.charset.StandardCharsets.UTF_8)
    else identity[Any]

  // -------------------------------------------------------------- utilities

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
    case PqCodec.Lz4 =>
      // legacy LZ4 = frame format (reference compression.rs lz4::Decoder)
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(bytes, off, compLen))
      val out = new Array[Byte](uncLen)
      var o = 0
      while (o < uncLen) {
        val k = in.read(out, o, uncLen - o)
        if (k < 0) throw new java.io.EOFException("lz4 page truncated")
        o += k
      }
      out
    case PqCodec.Lz4Raw =>
      val out = new Array[Byte](uncLen)
      net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
        .decompress(bytes, off, compLen, out, 0)
      out
    case PqCodec.Brotli =>
      graft.core.Brotli.decompress(bytes, off, compLen, uncLen)
    case other => throw new IllegalArgumentException(s"codec $other not supported")
  }

  private def decodePlain(typ: Int, typeLength: Int, buf: Array[Byte],
      off: Int, len: Int, n: Int): IndexedSeq[Any] = typ match {
    case PqType.Int96 =>
      require(12L * n <= len, s"$n INT96 values need ${12L * n} > $len bytes")
      (0 until n).map(i =>
        java.util.Arrays.copyOfRange(buf, off + 12 * i, off + 12 * (i + 1)))
    case PqType.FixedLenByteArray =>
      require(typeLength > 0, "FIXED_LEN_BYTE_ARRAY needs a type_length")
      require(typeLength.toLong * n <= len,
        s"$n FLBA($typeLength) values need more than $len bytes")
      (0 until n).map(i => java.util.Arrays.copyOfRange(buf,
        off + typeLength * i, off + typeLength * (i + 1)))
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
