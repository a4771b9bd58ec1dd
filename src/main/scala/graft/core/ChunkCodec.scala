package graft.core

import scala.collection.mutable.ArrayBuffer

/** One encoded column chunk: a self-describing blob plus lineage metrics. */
final case class EncodedChunk(
    blob: Array[Byte],
    codecId: Int,
    numValues: Int,
    rawSize: Long,
    encodedSize: Long,
    /** exact size of the reference write policy (dict until the 1 MiB dict
      * page limit, then PLAIN) — the ceiling our selector must not exceed */
    refPolicySize: Long,
    dictEntries: Int) {
  def codecName: String = CodecId.names(codecId)
}

/** Column chunk writer/reader.
  *
  * Mirrors the reference's chunk write behavior
  * (`/root/reference/src/column/writer.rs:198-416` +
  * `/root/reference/src/file/properties.rs:56-65`): values are processed in
  * 1024-value mini-batches, data pages cut at a 1 MiB encoded-size estimate,
  * dictionary encoding is tried first and falls back (here: to PLAIN, the
  * v1 default) once the dictionary exceeds 1 MiB — but generalizes encoder
  * selection: a stats-driven selector picks the cheapest codec per chunk and
  * the reference policy is kept as the never-exceed ceiling.
  *
  * Chunk blob layout (our own container; we re-create the encoding layer,
  * not the Parquet file format):
  * {{{
  * 'G' 'C' u8(version) u8(physicalType) u8(primaryCodec)
  * vlq(numRows)
  * [v2 only] vlq(levelByteLen) defLevels(RLE/bit-packed hybrid, bit width 1)
  * u8(hasDict) [vlq(dictEntries) vlq(dictByteLen) dictBytes(PLAIN uniques)]
  * vlq(numPages) { u8(pageCodec) vlq(pageValues) vlq(pageByteLen) bytes }*
  * }}}
  * version = 1: no nulls, numRows == numValues (bit-identical to the
  * engine's null-free format). version = 2: a definition-level stream
  * (1 = present, 0 = null — the flat-OPTIONAL case of the reference's
  * `/root/reference/src/encodings/levels.rs:48-137`, RLE v2 mode, bit
  * width = log2(max_level+1) = 1); value pages then hold only the
  * non-null values, exactly like Parquet data pages.
  */
object ChunkCodec {
  val DataPageSizeLimit: Long = 1L << 20
  val DictPageSizeLimit: Long = 1L << 20
  val MiniBatch = 1024

  // ---------------------------------------------------------------- slicing

  private def slice(vec: ColVec, from: Int, until: Int): ColVec = vec match {
    case BoolVec(v) => BoolVec(java.util.Arrays.copyOfRange(v, from, until))
    case IntVec(v) => IntVec(java.util.Arrays.copyOfRange(v, from, until))
    case LongVec(v) => LongVec(java.util.Arrays.copyOfRange(v, from, until))
    case FloatVec(v) => FloatVec(java.util.Arrays.copyOfRange(v, from, until))
    case DoubleVec(v) => DoubleVec(java.util.Arrays.copyOfRange(v, from, until))
    case v: BytesVec => v.slice(from, until) // zero-copy arena window
  }

  private def rawSizeOf(vec: ColVec, i: Int): Long = vec match {
    case v: BytesVec => 4L + v.len(i)
    case BoolVec(_) => 1L // page-cut accounting only
    case IntVec(_) | FloatVec(_) => 4L
    case _ => 8L
  }

  /** Primitive-array concat via System.arraycopy — the multi-page decode
    * path runs this per >1 MiB chunk, and the previous flatMap-over-boxed
    * version paid a box/unbox per value (round-1 review #6). */
  private def concatPrim[A](arrs: Seq[Array[A]], out: Array[A]): Array[A] = {
    var pos = 0
    arrs.foreach { a =>
      System.arraycopy(a, 0, out, pos, a.length)
      pos += a.length
    }
    out
  }

  def concat(parts: Seq[ColVec]): ColVec = if (parts.lengthCompare(1) == 0)
    parts.head // single page (every non-content-sized column): no recopy
  else parts.head match {
    case _: BoolVec =>
      val as = parts.map(_.asInstanceOf[BoolVec].values)
      BoolVec(concatPrim(as, new Array[Boolean](as.map(_.length).sum)))
    case _: IntVec =>
      val as = parts.map(_.asInstanceOf[IntVec].values)
      IntVec(concatPrim(as, new Array[Int](as.map(_.length).sum)))
    case _: LongVec =>
      val as = parts.map(_.asInstanceOf[LongVec].values)
      LongVec(concatPrim(as, new Array[Long](as.map(_.length).sum)))
    case _: FloatVec =>
      val as = parts.map(_.asInstanceOf[FloatVec].values)
      FloatVec(concatPrim(as, new Array[Float](as.map(_.length).sum)))
    case _: DoubleVec =>
      val as = parts.map(_.asInstanceOf[DoubleVec].values)
      DoubleVec(concatPrim(as, new Array[Double](as.map(_.length).sum)))
    case _: BytesVec =>
      val vs = parts.map(_.asInstanceOf[BytesVec])
      val n = vs.map(_.length).sum
      val totalBytes = vs.map(_.totalBytes.toLong).sum
      val offsets = new Array[Int](n + 1)
      val data = new Array[Byte](math.toIntExact(totalBytes))
      var vi = 0
      var dPos = 0
      vs.foreach { v =>
        val base = v.offsets(0)
        var i = 0
        while (i < v.length) {
          offsets(vi) = dPos + (v.offsets(i) - base)
          i += 1
          vi += 1
        }
        System.arraycopy(v.data, base, data, dPos, v.totalBytes)
        dPos += v.totalBytes
      }
      offsets(n) = dPos
      BytesVec(data, offsets)
  }

  // ------------------------------------------------------------ page encode

  private def encodePage(vec: ColVec, codecId: Int): Array[Byte] = codecId match {
    case CodecId.Plain => PlainCodec.encode(vec)
    case CodecId.RleBool => RleBoolCodec.encode(vec.asInstanceOf[BoolVec].values)
    case CodecId.DeltaBinaryPacked => vec match {
      case IntVec(v) =>
        val e = new DeltaBinaryPackedEncoder(int32 = true); e.putInts(v, 0, v.length); e.result()
      case LongVec(v) =>
        val e = new DeltaBinaryPackedEncoder(int32 = false); e.put(v); e.result()
      case other => throw new IllegalArgumentException(s"delta needs ints, got $other")
    }
    case CodecId.DeltaLengthByteArray =>
      DeltaLengthByteArrayCodec.encode(vec.asInstanceOf[BytesVec])
    case CodecId.DeltaByteArray =>
      DeltaByteArrayCodec.encode(vec.asInstanceOf[BytesVec])
    case CodecId.Fsst => FsstCodec.encode(vec.asInstanceOf[BytesVec])
    case other => throw new IllegalArgumentException(s"not a page codec: $other")
  }

  private def decodePage(physicalType: Int, codecId: Int, buf: Array[Byte],
      numValues: Int, dict: ColVec): ColVec = codecId match {
    case CodecId.Plain => PlainCodec.decode(physicalType, buf, numValues)
    case CodecId.RleBool => BoolVec(RleBoolCodec.decode(buf, numValues))
    case CodecId.Dict =>
      if (numValues == 0) emptyVec(physicalType)
      else DictCodec.decodeIndices(dict, buf, numValues)
    case CodecId.DeltaBinaryPacked =>
      val longs = DeltaBinaryPackedDecoder.decode(buf, int32 = physicalType == PhysicalType.Int32)
      if (physicalType == PhysicalType.Int32) IntVec(longs.map(_.toInt)) else LongVec(longs)
    case CodecId.DeltaLengthByteArray => DeltaLengthByteArrayCodec.decode(buf)
    case CodecId.DeltaByteArray => DeltaByteArrayCodec.decode(buf)
    case CodecId.Fsst => FsstCodec.decode(buf)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  private final case class Page(codecId: Int, numValues: Int, bytes: Array[Byte])

  /** Cut `vec` into pages at the 1 MiB raw-size estimate and encode each
    * with `codecId` (non-dict codecs). FSST trains ONE chunk-wide symbol
    * table and reuses it for every page: measured both ~2.5x faster than
    * per-page training AND a better ratio (0.204 vs 0.227 of raw — the
    * chunk-wide stratified sample generalizes; a page of sorted rows is one
    * repo's style). Pages stay self-contained (each embeds the table). */
  /** Page cut end-indices over `[from, vec.length)` at the 1 MiB raw-size
    * estimate — THE single cut rule, shared by real encodes (encodePaged)
    * and the size-only reference-policy accounting so the two can never
    * desynchronize. */
  private def pageCutEnds(vec: ColVec, from: Int): ArrayBuffer[Int] = {
    val n = vec.length
    val ends = ArrayBuffer.empty[Int]
    var acc = 0L
    var i = from
    while (i < n) {
      acc += rawSizeOf(vec, i)
      i += 1
      if (acc >= DataPageSizeLimit || i == n) { ends += i; acc = 0L }
    }
    ends
  }

  private def encodePaged(vec: ColVec, codecId: Int): ArrayBuffer[Page] = {
    val fsstTable =
      if (codecId == CodecId.Fsst) FsstCodec.trainChunk(vec.asInstanceOf[BytesVec])
      else null
    def encodeOne(part: ColVec): Array[Byte] =
      if (fsstTable != null)
        FsstCodec.encodeWithTable(part.asInstanceOf[BytesVec], fsstTable)
      else encodePage(part, codecId)
    val pages = ArrayBuffer.empty[Page]
    val n = vec.length
    var start = 0
    pageCutEnds(vec, 0).foreach { end =>
      val part = if (start == 0 && end == n) vec else slice(vec, start, end)
      pages += Page(codecId, end - start, encodeOne(part))
      start = end
    }
    if (n == 0) pages += Page(codecId, 0, encodeOne(vec))
    pages
  }

  /** The dict-until-limit prefix of the reference write policy:
    * dictionary-encode mini-batches until the dictionary page would exceed
    * 1 MiB, cutting id pages at the 1 MiB estimate. Shared by the real
    * encoder (encodeDictWithFallback) and the size-only accountant
    * (refPolicySizeOnly) so page cut points and the dict-header condition
    * live in exactly one place. Returns (dict, dictPages, fallbackStart);
    * fallbackStart == vec.length when the dictionary held for the whole
    * chunk. */
  private def dictPrefix(vec: ColVec):
      (DictCodec.Encoder, ArrayBuffer[Page], Int) = {
    val n = vec.length
    val dict = new DictCodec.Encoder(vec.physicalType)
    val pages = ArrayBuffer.empty[Page]
    var i = 0
    var fellBack = false
    while (i < n && !fellBack) {
      val until = math.min(i + MiniBatch, n)
      dict.put(slice(vec, i, until))
      i = until
      if (dict.dictEncodedSize >= DictPageSizeLimit) {
        // fallback: cut the buffered ids as the last dict page, rest is PLAIN
        if (dict.numBufferedIndices > 0) {
          val nv = dict.numBufferedIndices
          pages += Page(CodecId.Dict, nv, dict.writeIndices())
        }
        fellBack = true
      } else {
        // data page cut at the 1 MiB estimate (worst-case id stream size)
        val w = dict.bitWidth
        val est = 1L + dict.numBufferedIndices.toLong * (w + 1) / 8 + 16
        if (est >= DataPageSizeLimit) {
          val nv = dict.numBufferedIndices
          pages += Page(CodecId.Dict, nv, dict.writeIndices())
        }
      }
    }
    if (!fellBack) {
      if (dict.numBufferedIndices > 0 || pages.isEmpty) {
        val nv = dict.numBufferedIndices
        pages += Page(CodecId.Dict, nv, dict.writeIndices())
      }
      (dict, pages, n)
    } else (dict, pages, i)
  }

  /** The reference write policy: dictionary-encode mini-batches until the
    * dictionary page would exceed 1 MiB, then fall back to PLAIN for the
    * rest of the chunk. Returns (dict | null, pages). */
  private def encodeDictWithFallback(vec: ColVec):
      (DictCodec.Encoder, ArrayBuffer[Page]) = {
    val (dict, pages, fb) = dictPrefix(vec)
    if (fb < vec.length)
      pages ++= encodePaged(slice(vec, fb, vec.length), CodecId.Plain)
    (dict, pages)
  }

  // ----------------------------------------------------------- chunk encode

  private def assemble(vec: ColVec, primaryCodec: Int,
      dict: DictCodec.Encoder, pages: ArrayBuffer[Page],
      defLevels: Array[Byte]): Array[Byte] = {
    // pre-size to the known payload: growing from a small buffer doubles
    // through the multi-MB page bytes, re-copying every byte O(1) extra
    // times — measurable on 8 MB content chunks
    var presize = 4096L
    pages.foreach(p => presize += p.bytes.length + 16)
    if (defLevels != null) presize += defLevels.length / 4 + 64
    if (dict != null) presize += dict.dictEncodedSize + 64
    val w = new BitWriter(math.toIntExact(
      math.min(presize, Int.MaxValue.toLong - 16)))
    w.putAligned('G'.toLong, 1); w.putAligned('C'.toLong, 1)
    w.putAligned(if (defLevels == null) 1L else 2L, 1)
    w.putAligned(vec.physicalType.toLong, 1)
    w.putAligned(primaryCodec.toLong, 1)
    if (defLevels == null) w.putVlq(vec.length.toLong)
    else {
      w.putVlq(defLevels.length.toLong)
      val rle = new RleHybridEncoder(1, math.max(64, defLevels.length / 8))
      var i = 0
      while (i < defLevels.length) { rle.put(defLevels(i).toLong); i += 1 }
      val body = rle.result()
      w.putVlq(body.length.toLong)
      w.putBytes(body)
    }
    if (dict != null && dict.numEntries > 0 && pages.exists(_.codecId == CodecId.Dict)) {
      w.putAligned(1L, 1)
      val dictBytes = dict.writeDict()
      w.putVlq(dict.numEntries.toLong)
      w.putVlq(dictBytes.length.toLong)
      w.putBytes(dictBytes)
    } else w.putAligned(0L, 1)
    w.putVlq(pages.length.toLong)
    pages.foreach { p =>
      w.putAligned(p.codecId.toLong, 1)
      w.putVlq(p.numValues.toLong)
      w.putVlq(p.bytes.length.toLong)
      w.putBytes(p.bytes)
    }
    w.result()
  }

  /** Encode with one specific codec (Dict means dict-with-PLAIN-fallback).
    * `defLevels` (one 0/1 byte per ROW) is non-null iff the chunk contains
    * nulls; `vec` then holds only the non-null values. */
  def encodeWith(vec: ColVec, codecId: Int,
      defLevels: Array[Byte] = null): Array[Byte] =
    if (codecId == CodecId.Dict) {
      val (dict, pages) = encodeDictWithFallback(vec)
      assemble(vec, CodecId.Dict, dict, pages, defLevels)
    } else assemble(vec, codecId, null, encodePaged(vec, codecId), defLevels)

  @inline private def vlqLen(v: Long): Int = {
    var x = v
    var n = 1
    while ((x & ~0x7FL) != 0) { x >>>= 7; n += 1 }
    n
  }

  private def plainSizeOf(vec: ColVec, from: Int, until: Int): Long = {
    val nv = (until - from).toLong
    vec match {
      case v: BytesVec => (v.offsets(until) - v.offsets(from)).toLong + 4L * nv
      case BoolVec(_) => (nv + 7) / 8
      case IntVec(_) | FloatVec(_) => 4L * nv
      case _ => 8L * nv
    }
  }

  /** EXACT byte size of `encodeWith(vec, Dict, null)` without materializing
    * the fallback PLAIN pages — on a high-cardinality column the reference
    * policy falls back after ~1 MiB of dictionary and the rest of the blob
    * is a PLAIN arena copy whose size is pure offset arithmetic. The dict
    * prefix still encodes for real (bounded by the 1 MiB dict limit).
    * Equality with the materializing path is a tested property. */
  def refPolicySizeOnly(vec: ColVec): Long = {
    val n = vec.length
    // dict prefix: the SAME routine the real encoder runs (cut points and
    // the dict-header condition cannot drift); only the fallback PLAIN
    // pages are replaced by offset arithmetic over the shared cut rule
    val (dict, dictPages, fb) = dictPrefix(vec)
    // (numValues, pageByteLen)
    val pages = ArrayBuffer.empty[(Int, Long)]
    dictPages.foreach(p => pages += ((p.numValues, p.bytes.length.toLong)))
    if (fb < n) {
      var start = fb
      pageCutEnds(vec, fb).foreach { end =>
        pages += ((end - start, plainSizeOf(vec, start, end)))
        start = end
      }
    }
    var size = 5L + vlqLen(n.toLong) + 1L // magic+ver+type+codec, vlq rows, hasDict
    if (dict.numEntries > 0 && dictPages.nonEmpty) {
      val dictBytes = dict.writeDict()
      size += vlqLen(dict.numEntries.toLong) + vlqLen(dictBytes.length.toLong) +
        dictBytes.length
    }
    size += vlqLen(pages.length.toLong)
    pages.foreach { case (nv, len) =>
      size += 1L + vlqLen(nv.toLong) + vlqLen(len) + len
    }
    size
  }

  /** The stats-driven auto-selector with the reference policy as ceiling. */
  def encodeAuto(vec: ColVec, statsIn: ColumnStats = null,
      defLevels: Array[Byte] = null): EncodedChunk = {
    val stats = if (statsIn == null) ChunkStats.compute(vec) else statsIn
    val refCodec = referencePolicyCodec(vec)
    val best = CodecSelector.chooseScored(vec.physicalType, stats)
    // When no candidate is the reference codec itself (high-cardinality
    // columns), the reference blob is needed only if it WINS — compute its
    // exact size cheaply and materialize only in that rare case.
    val lazyRef = defLevels == null && refCodec == CodecId.Dict &&
      best.nonEmpty && !best.exists(_._2 == refCodec)
    var chosenId = refCodec
    var chosenBlob: Array[Byte] =
      if (lazyRef) null else encodeWith(vec, refCodec, defLevels)
    val refSize: Long =
      if (lazyRef) refPolicySizeOnly(vec) else chosenBlob.length.toLong
    // encode the top estimate always; runners-up only while their estimate
    // is within 40% of the leader's — a decisive estimate gap means the
    // extra full-chunk encode pass almost never pays for itself
    val cutoff = if (best.isEmpty) Long.MaxValue
      else math.min(Long.MaxValue / 2, best.head._1) * 7 / 5
    best.zipWithIndex.foreach { case ((est, cand), rank) =>
      if (cand != refCodec && (rank == 0 || est <= cutoff)) {
        val blob = encodeWith(vec, cand, defLevels)
        if (chosenBlob == null || blob.length < chosenBlob.length) {
          chosenId = cand
          chosenBlob = blob
        }
      }
    }
    if (chosenBlob == null || refSize < chosenBlob.length) {
      // reference policy wins (or no candidate ran): materialize it
      chosenId = refCodec
      chosenBlob = encodeWith(vec, refCodec, defLevels)
    }
    val dictEntries =
      if (chosenId == CodecId.Dict && !stats.distinctCapped) stats.distinct else 0
    EncodedChunk(chosenBlob, chosenId, vec.length, vec.rawSize,
      chosenBlob.length.toLong, refSize, dictEntries)
  }

  /** The reference's default v1 writer policy: dict for every type except
    * BOOLEAN (`/root/reference/src/column/writer.rs:140-149,748-750`),
    * PLAIN otherwise. */
  def referencePolicyCodec(vec: ColVec): Int = vec match {
    case _: BoolVec => CodecId.Plain
    case _ => CodecId.Dict
  }

  // ----------------------------------------------------------- array chunks

  /** Decoded LIST chunk: null-suppressed element values plus per-slot
    * repetition (0 = first slot of a row, 1 = continuation) and definition
    * levels (0 = null array, 1 = empty array, 2 = null element, 3 =
    * element) — the reference's one-level repeated-field shredding
    * (`/root/reference/src/schema/types.rs:800-854`,
    * `src/record/reader.rs:346-444`) specialized to flat LIST columns. */
  final case class DecodedArray(elems: ColVec, rep: Array[Byte],
      defs: Array[Byte], numRows: Int)

  /** True iff `blob` is a version-3 (LIST) chunk. */
  def isArrayChunk(blob: Array[Byte]): Boolean =
    blob.length > 2 && blob(0) == 'G'.toByte && blob(1) == 'C'.toByte &&
      blob(2) == 3.toByte

  /** Encode a LIST column chunk: rep/def level streams (RLE hybrid, widths
    * 1 and 2) + a nested element chunk run through the normal auto-selector.
    * Chunk layout (version 3):
    * {{{
    * 'G' 'C' 3 u8(elemPhysicalType) u8(elemPrimaryCodec)
    * vlq(numRows) vlq(numSlots)
    * vlq(repByteLen) repBytes(RLE w1)
    * vlq(defByteLen) defBytes(RLE w2)
    * vlq(elemBlobLen) elemBlob(version-1 chunk over non-null elements)
    * }}} */
  def encodeArrayChunk(elems: ColVec, rep: Array[Byte], defs: Array[Byte],
      numRows: Int, forcedElemCodec: Int = -1): EncodedChunk = {
    require(rep.length == defs.length, "rep/def stream length mismatch")
    val inner: EncodedChunk =
      if (forcedElemCodec >= 0) {
        val blob = encodeWith(elems, forcedElemCodec)
        EncodedChunk(blob, forcedElemCodec, elems.length, elems.rawSize,
          blob.length.toLong, blob.length.toLong, 0)
      } else encodeAuto(elems)
    val repEnc = new RleHybridEncoder(1, math.max(64, rep.length / 8))
    var i = 0
    while (i < rep.length) { repEnc.put(rep(i).toLong); i += 1 }
    val repBytes = repEnc.result()
    val defEnc = new RleHybridEncoder(2, math.max(64, defs.length / 8))
    i = 0
    while (i < defs.length) { defEnc.put(defs(i).toLong); i += 1 }
    val defBytes = defEnc.result()
    val w = new BitWriter(inner.blob.length + repBytes.length + defBytes.length + 64)
    w.putAligned('G'.toLong, 1); w.putAligned('C'.toLong, 1)
    w.putAligned(3L, 1)
    w.putAligned(elems.physicalType.toLong, 1)
    w.putAligned(inner.codecId.toLong, 1)
    w.putVlq(numRows.toLong)
    w.putVlq(rep.length.toLong)
    w.putVlq(repBytes.length.toLong); w.putBytes(repBytes)
    w.putVlq(defBytes.length.toLong); w.putBytes(defBytes)
    w.putVlq(inner.blob.length.toLong); w.putBytes(inner.blob)
    val blob = w.result()
    // the level/header overhead is identical under the reference policy, so
    // encoded <= refPolicy is inherited from the inner chunk's invariant
    val overhead = (blob.length - inner.blob.length).toLong
    EncodedChunk(blob, inner.codecId, numRows,
      rawSize = 4L * numRows + elems.rawSize,
      encodedSize = blob.length.toLong,
      refPolicySize = inner.refPolicySize + overhead,
      dictEntries = inner.dictEntries)
  }

  /** Decoded MAP chunk: null-suppressed key and value vectors plus per-slot
    * repetition (0 = first entry of a row, 1 = continuation) and definition
    * levels (0 = null map, 1 = empty map, 2 = entry with null value, 3 =
    * entry with value) — the same one-level shredding as LIST with the
    * repeated group carrying two leaves (key required, value optional), the
    * reference's MAP_KEY_VALUE structure
    * (`/root/reference/src/schema/types.rs:800-854`). Keys exist for every
    * slot with def >= 2; values only for def == 3. */
  final case class DecodedMap(keys: ColVec, vals: ColVec, rep: Array[Byte],
      defs: Array[Byte], numRows: Int)

  /** True iff `blob` is a version-4 (MAP) chunk. */
  def isMapChunk(blob: Array[Byte]): Boolean =
    blob.length > 2 && blob(0) == 'G'.toByte && blob(1) == 'C'.toByte &&
      blob(2) == 4.toByte

  /** Encode a MAP column chunk: one rep/def stream pair shared by both
    * leaves + two nested v1 chunks (keys, non-null values), each through the
    * normal auto-selector.
    * Chunk layout (version 4):
    * {{{
    * 'G' 'C' 4 u8(keyPhysicalType) u8(valPhysicalType)
    * vlq(numRows) vlq(numSlots)
    * vlq(repByteLen) repBytes(RLE w1)
    * vlq(defByteLen) defBytes(RLE w2)
    * vlq(keyBlobLen) keyBlob(version-1 chunk, one key per def>=2 slot)
    * vlq(valBlobLen) valBlob(version-1 chunk, one value per def==3 slot)
    * }}} */
  def encodeMapChunk(keys: ColVec, vals: ColVec, rep: Array[Byte],
      defs: Array[Byte], numRows: Int): EncodedChunk = {
    require(rep.length == defs.length, "rep/def stream length mismatch")
    val kInner = encodeAuto(keys)
    val vInner = encodeAuto(vals)
    val repEnc = new RleHybridEncoder(1, math.max(64, rep.length / 8))
    var i = 0
    while (i < rep.length) { repEnc.put(rep(i).toLong); i += 1 }
    val repBytes = repEnc.result()
    val defEnc = new RleHybridEncoder(2, math.max(64, defs.length / 8))
    i = 0
    while (i < defs.length) { defEnc.put(defs(i).toLong); i += 1 }
    val defBytes = defEnc.result()
    val w = new BitWriter(kInner.blob.length + vInner.blob.length +
      repBytes.length + defBytes.length + 64)
    w.putAligned('G'.toLong, 1); w.putAligned('C'.toLong, 1)
    w.putAligned(4L, 1)
    w.putAligned(keys.physicalType.toLong, 1)
    w.putAligned(vals.physicalType.toLong, 1)
    w.putVlq(numRows.toLong)
    w.putVlq(rep.length.toLong)
    w.putVlq(repBytes.length.toLong); w.putBytes(repBytes)
    w.putVlq(defBytes.length.toLong); w.putBytes(defBytes)
    w.putVlq(kInner.blob.length.toLong); w.putBytes(kInner.blob)
    w.putVlq(vInner.blob.length.toLong); w.putBytes(vInner.blob)
    val blob = w.result()
    // level/header overhead is policy-invariant, so encoded <= refPolicy is
    // inherited from the two inner chunks' invariants
    val overhead = (blob.length - kInner.blob.length - vInner.blob.length).toLong
    EncodedChunk(blob, kInner.codecId, numRows,
      rawSize = 4L * numRows + keys.rawSize + vals.rawSize,
      encodedSize = blob.length.toLong,
      refPolicySize = kInner.refPolicySize + vInner.refPolicySize + overhead,
      dictEntries = kInner.dictEntries)
  }

  def decodeMapChunk(blob: Array[Byte]): DecodedMap = {
    val r = new BitReader(blob)
    require(r.getAligned(1) == 'G'.toLong && r.getAligned(1) == 'C'.toLong,
      "bad chunk magic")
    require(r.getAligned(1) == 4L, "not a map chunk")
    r.getAligned(1) // key physical type (the nested blobs self-describe)
    r.getAligned(1) // value physical type
    val numRows = checkedDense(r.getVlq(), blob.length, "row count")
    val numSlots = checkedDense(r.getVlq(), blob.length, "slot count")
    val rep = readLevels(r, numSlots, 1, "rep bytes")
    val defs = readLevels(r, numSlots, 2, "def bytes")
    val kLen = checkedLen(r.getVlq(), r, "key blob")
    val kInner = decodeWithLevels(r.getBytes(kLen))
    require(kInner.defLevels == null, "map key chunk must be version 1")
    val vLen = checkedLen(r.getVlq(), r, "value blob")
    val vInner = decodeWithLevels(r.getBytes(vLen))
    require(vInner.defLevels == null, "map value chunk must be version 1")
    DecodedMap(kInner.vec, vInner.vec, rep, defs, numRows)
  }

  def decodeArrayChunk(blob: Array[Byte]): DecodedArray = {
    val r = new BitReader(blob)
    require(r.getAligned(1) == 'G'.toLong && r.getAligned(1) == 'C'.toLong,
      "bad chunk magic")
    require(r.getAligned(1) == 3L, "not an array chunk")
    r.getAligned(1) // element physical type (the nested blob self-describes)
    r.getAligned(1) // element primary codec (informational)
    val numRows = checkedDense(r.getVlq(), blob.length, "row count")
    val numSlots = checkedDense(r.getVlq(), blob.length, "slot count")
    val rep = readLevels(r, numSlots, 1, "rep bytes")
    val defs = readLevels(r, numSlots, 2, "def bytes")
    val innerLen = checkedLen(r.getVlq(), r, "element blob")
    val inner = decodeWithLevels(r.getBytes(innerLen))
    require(inner.defLevels == null, "array element chunk must be version 1")
    DecodedArray(inner.vec, rep, defs, numRows)
  }

  // ----------------------------------------------------------- chunk decode

  /** Decode a null-free chunk (version 1). */
  def decode(blob: Array[Byte]): ColVec = {
    val d = decodeWithLevels(blob)
    require(d.defLevels == null, "chunk has nulls; use decodeWithLevels")
    d.vec
  }

  /** Decoded chunk: non-null values + (for v2 chunks) one 0/1 def level
    * per row; `defLevels == null` means no nulls. */
  final case class Decoded(vec: ColVec, defLevels: Array[Byte]) {
    def numRows: Int = if (defLevels == null) vec.length else defLevels.length
  }

  def decodeWithLevels(blob: Array[Byte]): Decoded = {
    val r = new BitReader(blob)
    require(r.getAligned(1) == 'G'.toLong && r.getAligned(1) == 'C'.toLong,
      "bad chunk magic")
    val version = r.getAligned(1)
    require(version == 1L || version == 2L, s"bad chunk version $version")
    val physicalType = r.getAligned(1).toInt
    r.getAligned(1) // primary codec (informational)
    val numRows = checkedDense(r.getVlq(), blob.length, "row count")
    var defLevels: Array[Byte] = null
    var numValues = numRows
    if (version == 2L) {
      val levelLen = checkedLen(r.getVlq(), r, "level bytes")
      val levelBytes = r.getBytes(levelLen)
      val dec = new RleHybridDecoder(1, levelBytes, 0, levelBytes.length)
      val tmp = new Array[Long](numRows)
      dec.get(tmp, 0, numRows)
      defLevels = new Array[Byte](numRows)
      numValues = 0
      var i = 0
      while (i < numRows) {
        defLevels(i) = tmp(i).toByte
        if (tmp(i) != 0L) numValues += 1
        i += 1
      }
    }
    val hasDict = r.getAligned(1) == 1L
    var dict: ColVec = null
    if (hasDict) {
      val entries = checkedDense(r.getVlq(), blob.length, "dict entries")
      val len = checkedLen(r.getVlq(), r, "dict bytes")
      val bytes = r.getBytes(len)
      dict = PlainCodec.decode(physicalType, bytes, entries)
    }
    val numPages = checkedDense(r.getVlq(), blob.length, "page count")
    val parts = new ArrayBuffer[ColVec](numPages)
    var p = 0
    while (p < numPages) {
      val codec = r.getAligned(1).toInt
      val nv = checkedDense(r.getVlq(), blob.length, "page values")
      val len = checkedLen(r.getVlq(), r, "page bytes")
      val bytes = r.getBytes(len)
      parts += decodePage(physicalType, codec, bytes, nv, dict)
      p += 1
    }
    val out = if (parts.isEmpty) emptyVec(physicalType) else concat(parts.toSeq)
    require(out.length == numValues, s"chunk decode: ${out.length} != $numValues")
    Decoded(out, defLevels)
  }

  /** Fuzz guards (cf. the reference's AFL target, fuzz/src/main.rs): a
    * corrupted vlq must raise, never drive a huge allocation or a hang. */
  @inline private def checkedCount(v: Long, what: String): Int = {
    require(v >= 0 && v <= Int.MaxValue, s"corrupt chunk: $what = $v")
    v.toInt
  }

  /** Count that will drive an upfront allocation: bound it by the bytes
    * actually present (same density rule as the parquet-side readers —
    * ParquetFileIO readTriplets/readColumnVec). RLE/delta streams are
    * legitimately denser than 8 values/byte (one run header can cover
    * millions of values), so small claims pass on a 16M absolute ceiling
    * instead (~128 MB transient worst case); a forged multi-GB claim in a
    * tiny blob raises cleanly instead of OOM-ing the executor. */
  @inline private def checkedDense(v: Long, bytesPresent: Int,
      what: String): Int = {
    require(v >= 0 && (v <= 8L * bytesPresent || v <= (1L << 24)),
      s"corrupt chunk: $what = $v in $bytesPresent bytes")
    v.toInt
  }

  @inline private def checkedLen(v: Long, r: BitReader, what: String): Int = {
    require(v >= 0 && v <= r.bytesLeft, s"corrupt chunk: $what = $v > ${r.bytesLeft} left")
    v.toInt
  }

  /** One length-prefixed RLE-hybrid level stream → `numSlots` byte levels
    * (shared by the array- and map-chunk readers). */
  private def readLevels(r: BitReader, numSlots: Int, width: Int,
      what: String): Array[Byte] = {
    val len = checkedLen(r.getVlq(), r, what)
    val bytes = r.getBytes(len)
    val dec = new RleHybridDecoder(width, bytes, 0, bytes.length)
    val tmp = new Array[Long](numSlots)
    dec.get(tmp, 0, numSlots)
    val out = new Array[Byte](numSlots)
    var i = 0
    while (i < numSlots) { out(i) = tmp(i).toByte; i += 1 }
    out
  }

  private def emptyVec(physicalType: Int): ColVec = physicalType match {
    case PhysicalType.Bool => BoolVec(Array.empty)
    case PhysicalType.Int32 => IntVec(Array.empty)
    case PhysicalType.Int64 => LongVec(Array.empty)
    case PhysicalType.Float => FloatVec(Array.empty)
    case PhysicalType.Double => DoubleVec(Array.empty)
    case PhysicalType.Bytes => BytesVec.empty
  }
}

/** Stats-driven codec ranking ("sample column statistics … to pick the
  * cheapest encoding per column chunk" — the north star's generalization of
  * the reference's dict-size-only trigger). Returns candidate codec ids in
  * preference order; the caller measures actual bytes and keeps the
  * reference policy as ceiling. */
object CodecSelector {
  def choose(physicalType: Int, s: ColumnStats): Seq[Int] =
    chooseScored(physicalType, s).map(_._2)

  /** Candidates as (estimated bytes, codec id), best estimate first. */
  def chooseScored(physicalType: Int, s: ColumnStats): Seq[(Long, Int)] = {
    val n = s.numValues.toDouble
    physicalType match {
      case PhysicalType.Bool =>
        val estRle = s.runs * 3 + 8
        val estPlain = (s.numValues + 7) / 8
        if (estRle < estPlain) Seq((estRle, CodecId.RleBool))
        else Seq((estPlain, CodecId.Plain))

      case PhysicalType.Int32 | PhysicalType.Int64 =>
        val w = BitUtil.dictBitWidth(s.distinct)
        val estDict =
          if (s.distinctCapped) Long.MaxValue
          else s.distinctRawSize + (n * w / 8).toLong + (n / 512).toLong + 8
        val range = s.maxValue - s.minValue // may overflow; treated as wide
        val deltaBits =
          if (range < 0) 64
          else if (s.sortedness > 0.99) BitUtil.numRequiredBits(
            math.max(1L, range / math.max(1L, s.numValues)) * 4)
          else BitUtil.numRequiredBits(math.max(1L, range)) + 1
        val estDelta = (n * math.min(deltaBits, 64) / 8).toLong + (n / 16).toLong + 16
        val estPlain = s.rawSize
        Seq((estDict, CodecId.Dict), (estDelta, CodecId.DeltaBinaryPacked),
          (estPlain, CodecId.Plain)).sortBy(_._1).take(2)

      case PhysicalType.Float | PhysicalType.Double =>
        val w = BitUtil.dictBitWidth(s.distinct)
        val estDict =
          if (s.distinctCapped) Long.MaxValue
          else s.distinctRawSize + (n * w / 8).toLong + (n / 512).toLong + 8
        if (estDict < s.rawSize) Seq((estDict, CodecId.Dict))
        else Seq((s.rawSize, CodecId.Plain))

      case PhysicalType.Bytes =>
        val avgLen = if (s.numValues == 0) 0.0 else s.rawSize / n - 4.0
        val w = BitUtil.dictBitWidth(s.distinct)
        val estDict =
          if (s.distinctCapped || s.distinctRawSize >= ChunkCodec.DictPageSizeLimit)
            Long.MaxValue
          else {
            val idsBitPacked = (n * w / 8).toLong
            val idsRle = s.runs * (1 + (w + 7) / 8 + 1)
            s.distinctRawSize + math.min(idsBitPacked, idsRle) + (n / 512).toLong + 8
          }
        val estDeltaByte =
          (s.rawSize * (1.0 - s.avgPrefixShare)).toLong + (3 * s.numValues) + 32
        val estDeltaLen = math.max(0L, s.rawSize - 2 * s.numValues) + 16
        val estFsst =
          if (s.entropyBitsPerByte < 6.8 && avgLen >= 12)
            (s.rawSize * math.max(0.30, s.entropyBitsPerByte / 8.0 * 0.75)).toLong + 2048
          else Long.MaxValue
        val estPlain = s.rawSize
        Seq((estDict, CodecId.Dict), (estDeltaByte, CodecId.DeltaByteArray),
          (estFsst, CodecId.Fsst), (estDeltaLen, CodecId.DeltaLengthByteArray),
          (estPlain, CodecId.Plain)).sortBy(_._1).take(2)
    }
  }
}
