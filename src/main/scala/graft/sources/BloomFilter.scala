package graft.sources

import graft.core.{BytesVec, ColVec, DoubleVec, FloatVec, IntVec, LongVec}

/** Parquet split-block bloom filter (SBBF) — the public parquet-format
  * `BloomFilter.md` spec. The reference has no bloom filters (its reader's
  * row-group filtering is an unrealized TODO,
  * `/root/reference/src/file/reader.rs:198`); at 100 TB they are the
  * standard answer to the pruning gap min/max statistics cannot close:
  * equality probes on high-cardinality, unsorted columns (commit hashes,
  * document ids) where every row group's [min,max] spans the whole domain.
  *
  * Layout per the spec: the filter is an array of 256-bit blocks, each
  * block eight little-endian 32-bit words. A value is hashed with
  * xxHash64 (seed 0) over its PLAIN-encoded bytes (byte arrays: raw bytes,
  * no length prefix); the top 32 hash bits select the block, the low 32
  * set/check one bit in each of the eight words through the spec's eight
  * salt constants.
  */
final class Sbbf(val words: Array[Int]) {
  require(words.length >= 8 && (words.length & 7) == 0 &&
    Integer.bitCount(words.length) == 1,
    s"SBBF word count ${words.length} must be a power of two >= 8")

  private val nBlocks = words.length >>> 3

  def numBytes: Int = words.length * 4

  @inline private def blockOf(h: Long): Int =
    (((h >>> 32) * nBlocks) >>> 32).toInt

  def insertHash(h: Long): Unit = {
    val b = blockOf(h) << 3
    val x = h.toInt
    var i = 0
    while (i < 8) {
      words(b + i) |= 1 << ((x * Sbbf.Salt(i)) >>> 27)
      i += 1
    }
  }

  def mightContainHash(h: Long): Boolean = {
    val b = blockOf(h) << 3
    val x = h.toInt
    var i = 0
    while (i < 8) {
      if ((words(b + i) & (1 << ((x * Sbbf.Salt(i)) >>> 27))) == 0) return false
      i += 1
    }
    true
  }

  /** Little-endian serialized bitset (the bytes following the thrift
    * BloomFilterHeader in the file). */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](words.length * 4)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      out(4 * i) = w.toByte
      out(4 * i + 1) = (w >>> 8).toByte
      out(4 * i + 2) = (w >>> 16).toByte
      out(4 * i + 3) = (w >>> 24).toByte
      i += 1
    }
    out
  }
}

object Sbbf {
  /** The spec's eight block salts (public parquet-format BloomFilter.md). */
  val Salt: Array[Int] = Array(0x47b6137b, 0x44974d91, 0x8824ad5b,
    0xa2b7289d, 0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  val MinBytes = 32
  val MaxBytes: Int = 1 << 20 // cap one filter at 1 MiB

  def fromBytes(bytes: Array[Byte]): Sbbf = {
    require(bytes.length >= MinBytes && (bytes.length & 31) == 0,
      s"SBBF bitset of ${bytes.length} bytes")
    val words = new Array[Int](bytes.length / 4)
    var i = 0
    while (i < words.length) {
      words(i) = (bytes(4 * i) & 0xFF) | ((bytes(4 * i + 1) & 0xFF) << 8) |
        ((bytes(4 * i + 2) & 0xFF) << 16) | ((bytes(4 * i + 3) & 0xFF) << 24)
      i += 1
    }
    new Sbbf(words)
  }

  /** Smallest power-of-two byte size meeting `fpp` for `ndv` distinct
    * values — the spec's k=8 formula, clamped to [MinBytes, MaxBytes]. */
  def optimalNumBytes(ndv: Long, fpp: Double = 0.01): Int = {
    val bits = -8.0 * ndv / math.log(1.0 - math.pow(fpp, 1.0 / 8.0))
    val bytes = math.ceil(bits / 8.0)
    var p = MinBytes
    while (p < bytes && p < MaxBytes) p <<= 1
    p
  }

  def sized(ndv: Long, fpp: Double = 0.01): Sbbf =
    new Sbbf(new Array[Int](optimalNumBytes(ndv, fpp) / 4))

  // ------------------------------------------------------------- hashing
  // xxHash64 seed 0 over the value's plain-encoded bytes (ints/floats LE;
  // BYTE_ARRAY raw, no length prefix) — the spec's hash contract, which is
  // what makes our filters interoperable with parquet-mr / pyarrow blooms.

  private val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash64()
  private val scratch8: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8))

  def hashBytes(b: Array[Byte], off: Int, len: Int): Long =
    xx.hash(b, off, len, 0L)

  def hashBytes(b: Array[Byte]): Long = hashBytes(b, 0, b.length)

  def hashInt(v: Int): Long = {
    val s = scratch8.get()
    s(0) = v.toByte; s(1) = (v >>> 8).toByte
    s(2) = (v >>> 16).toByte; s(3) = (v >>> 24).toByte
    xx.hash(s, 0, 4, 0L)
  }

  def hashLong(v: Long): Long = {
    val s = scratch8.get()
    var i = 0
    while (i < 8) { s(i) = (v >>> (8 * i)).toByte; i += 1 }
    xx.hash(s, 0, 8, 0L)
  }

  def hashFloat(v: Float): Long = hashInt(java.lang.Float.floatToIntBits(v))
  def hashDouble(v: Double): Long =
    hashLong(java.lang.Double.doubleToLongBits(v))

  /** Hash of a pushed-filter value against a column of parquet physical
    * type `typ` (INT32 columns hash 4 LE bytes even when the predicate
    * literal arrived as a Long). None when the (value, type) pair is not
    * bloom-hashable — callers must then keep the row group. */
  def hashForType(typ: Int, value: Any): Option[Long] = (typ, value) match {
    case (PqType.Int32, v: Long) if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(hashInt(v.toInt))
    case (PqType.Int64, v: Long) => Some(hashLong(v))
    case (PqType.ByteArray, b: Array[Byte]) => Some(hashBytes(b))
    case _ => None
  }

  /** Hashes of every distinct value in a chunk vector (the writer side). */
  def hashVec(vec: ColVec): Array[Long] = {
    val set = new java.util.HashSet[java.lang.Long](math.min(vec.length, 1 << 16))
    vec match {
      case IntVec(vs) => vs.foreach(v => set.add(hashInt(v)))
      case LongVec(vs) => vs.foreach(v => set.add(hashLong(v)))
      case FloatVec(vs) => vs.foreach(v => set.add(hashFloat(v)))
      case DoubleVec(vs) => vs.foreach(v => set.add(hashDouble(v)))
      case b: BytesVec =>
        var i = 0
        while (i < b.length) {
          set.add(hashBytes(b.data, b.start(i), b.len(i)))
          i += 1
        }
      case _: graft.core.BoolVec =>
        throw new IllegalArgumentException("no bloom filters over booleans")
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def build(vec: ColVec, fpp: Double = 0.01): Sbbf = {
    val hashes = hashVec(vec)
    val f = sized(hashes.length.toLong, fpp)
    hashes.foreach(f.insertHash)
    f
  }

  // ------------------------------------------------- thrift header + file IO

  /** BloomFilterHeader { 1: numBytes, 2: algorithm=BLOCK{}, 3: hash=XXHASH{},
    * 4: compression=UNCOMPRESSED{} } (unions = one-field structs). */
  def writeHeader(numBytes: Int): Array[Byte] = {
    val w = new ThriftCompact.Writer
    w.i32Field(1, 0, numBytes)
    var last = 1
    Seq(2, 3, 4).foreach { id =>
      w.fieldHeader(id, ThriftCompact.TStruct, last)
      w.fieldHeader(1, ThriftCompact.TStruct, 0)
      w.stop() // empty variant struct
      w.stop() // union
      last = id
    }
    w.stop()
    w.result()
  }

  /** (numBytes, header byte length). Unknown algorithm/hash variants (field
    * ids != 1) return numBytes = -1 — caller must ignore the filter. */
  def parseHeader(buf: Array[Byte], off: Int): (Int, Int) = {
    val r = new ThriftCompact.Reader(buf, off)
    var numBytes = -1
    var supported = true
    var last = 0
    var done = false
    while (!done) {
      val (id, t) = r.fieldHeader(last)
      if (t == ThriftCompact.TStop) done = true
      else {
        id match {
          case 1 => numBytes = r.zigzag().toInt
          case 2 | 3 | 4 =>
            // union: exactly one variant struct; variant id 1 is the spec's
            // BLOCK / XXHASH / UNCOMPRESSED — anything else we can't use
            var l2 = 0
            var d2 = false
            while (!d2) {
              val (vid, vt) = r.fieldHeader(l2)
              if (vt == ThriftCompact.TStop) d2 = true
              else {
                if (vid != 1) supported = false
                r.skip(vt)
                l2 = vid
              }
            }
          case _ => r.skip(t)
        }
        last = id
      }
    }
    (if (supported) numBytes else -1, r.pos - off)
  }

  /** Read the bloom filter of a column chunk, if present and readable.
    * One bounded ranged read — never touches page data. Takes the
    * [[GraftIO.SeekableInput]] seam, so bloom pruning works over any
    * backing filesystem. */
  def readFromFile(in: GraftIO.SeekableInput,
      cm: PqColumnMeta): Option[Sbbf] = {
    if (cm.bloomOffset < 0) return None
    try {
      // the header is tiny (~16 bytes); 64 covers any field ordering
      val headBuf = new Array[Byte](64)
      val got = math.min(headBuf.length.toLong,
        in.length - cm.bloomOffset).toInt
      if (got <= 0) return None
      in.readFully(cm.bloomOffset, headBuf, 0, got)
      val (numBytes, headerLen) = parseHeader(headBuf, 0)
      if (numBytes < MinBytes || numBytes > MaxBytes * 8) return None
      val bits = new Array[Byte](numBytes)
      in.readFully(cm.bloomOffset + headerLen, bits)
      Some(fromBytes(bits))
    } catch { case _: Exception => None } // corrupted filter = no pruning
  }
}
