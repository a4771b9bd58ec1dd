package graft.core

/** Dictionary encoding (reference semantics at
  * `/root/reference/src/encodings/encoding.rs:185-424`):
  *
  *  - ids are assigned in FIRST-SEEN order (the hash table only affects
  *    probe cost, never the output bytes — ids come from insertion order);
  *  - dictionary page = the unique values, PLAIN-encoded;
  *  - index page = 1 byte bit width then the ids as an RLE/bit-packed
  *    hybrid stream; bit width = 0 for an empty dict, 1 for a single
  *    entry, else ceil(log2(nUniques)).
  */
object DictCodec {

  final class Encoder(physicalType: Int) {
    private val ids = new java.util.HashMap[AnyRef, Integer]()
    private val uniqueKeys = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    private val bufferedIndices = new IntArrayList()
    private var dictBytes = 0L

    /** Wrapper giving Array[Byte] value equality for the hash map. */
    private final class BKey(val a: Array[Byte]) {
      override val hashCode: Int = java.util.Arrays.hashCode(a)
      override def equals(o: Any): Boolean = o match {
        case b: BKey => java.util.Arrays.equals(a, b.a)
        case _ => false
      }
    }

    private def putOne(key: AnyRef, encodedSize: Long): Unit = {
      var id = ids.get(key)
      if (id == null) {
        id = Integer.valueOf(uniqueKeys.length)
        ids.put(key, id)
        uniqueKeys += key
        dictBytes += encodedSize
      }
      bufferedIndices.add(id.intValue())
    }

    def put(vec: ColVec): Unit = vec match {
      case IntVec(vs) =>
        var i = 0; while (i < vs.length) { putOne(Integer.valueOf(vs(i)), 4L); i += 1 }
      case LongVec(vs) =>
        var i = 0; while (i < vs.length) { putOne(java.lang.Long.valueOf(vs(i)), 8L); i += 1 }
      case FloatVec(vs) =>
        var i = 0; while (i < vs.length) { putOne(java.lang.Float.valueOf(vs(i)), 4L); i += 1 }
      case DoubleVec(vs) =>
        var i = 0; while (i < vs.length) { putOne(java.lang.Double.valueOf(vs(i)), 8L); i += 1 }
      case BytesVec(vs) =>
        var i = 0; while (i < vs.length) { putOne(new BKey(vs(i)), 4L + vs(i).length); i += 1 }
      case BoolVec(_) =>
        throw new IllegalArgumentException("booleans are never dictionary-encoded")
    }

    def numEntries: Int = uniqueKeys.length

    /** Size in bytes of the PLAIN-encoded dictionary (the reference's
      * fallback trigger compares this against the 1 MiB dict page limit). */
    def dictEncodedSize: Long = dictBytes

    def bitWidth: Int = BitUtil.dictBitWidth(uniqueKeys.length)

    def numBufferedIndices: Int = bufferedIndices.size

    /** PLAIN-encoded dictionary page of the uniques, in id order. */
    def writeDict(): Array[Byte] = PlainCodec.encode(uniquesVec)

    def uniquesVec: ColVec = physicalType match {
      case PhysicalType.Int32 =>
        IntVec(uniqueKeys.map(_.asInstanceOf[Integer].intValue()).toArray)
      case PhysicalType.Int64 =>
        LongVec(uniqueKeys.map(_.asInstanceOf[java.lang.Long].longValue()).toArray)
      case PhysicalType.Float =>
        FloatVec(uniqueKeys.map(_.asInstanceOf[java.lang.Float].floatValue()).toArray)
      case PhysicalType.Double =>
        DoubleVec(uniqueKeys.map(_.asInstanceOf[java.lang.Double].doubleValue()).toArray)
      case PhysicalType.Bytes =>
        BytesVec(uniqueKeys.map(_.asInstanceOf[BKey].a).toArray)
      case other => throw new IllegalArgumentException(s"no dict for type $other")
    }

    /** Index page: [bit width: u8] ++ hybrid-encoded ids. Clears buffered ids. */
    def writeIndices(): Array[Byte] = {
      val width = bitWidth
      val rle = new RleHybridEncoder(width, math.max(256, bufferedIndices.size / 4))
      var i = 0
      while (i < bufferedIndices.size) { rle.put(bufferedIndices.get(i).toLong); i += 1 }
      val body = rle.result()
      val out = new Array[Byte](1 + body.length)
      out(0) = width.toByte
      System.arraycopy(body, 0, out, 1, body.length)
      bufferedIndices.clear()
      out
    }

    /** Replay buffered ids through a non-dict encoder during dict fallback. */
    def drainBufferedValues(): ColVec = {
      val u = uniquesVec
      val n = bufferedIndices.size
      val vec: ColVec = u match {
        case IntVec(us) =>
          val o = new Array[Int](n); var i = 0
          while (i < n) { o(i) = us(bufferedIndices.get(i)); i += 1 }; IntVec(o)
        case LongVec(us) =>
          val o = new Array[Long](n); var i = 0
          while (i < n) { o(i) = us(bufferedIndices.get(i)); i += 1 }; LongVec(o)
        case FloatVec(us) =>
          val o = new Array[Float](n); var i = 0
          while (i < n) { o(i) = us(bufferedIndices.get(i)); i += 1 }; FloatVec(o)
        case DoubleVec(us) =>
          val o = new Array[Double](n); var i = 0
          while (i < n) { o(i) = us(bufferedIndices.get(i)); i += 1 }; DoubleVec(o)
        case BytesVec(us) =>
          val o = new Array[Array[Byte]](n); var i = 0
          while (i < n) { o(i) = us(bufferedIndices.get(i)); i += 1 }; BytesVec(o)
        case BoolVec(_) => throw new IllegalStateException("unreachable")
      }
      bufferedIndices.clear()
      vec
    }
  }

  /** Decode an index page against a decoded dictionary. */
  def decodeIndices(dict: ColVec, indexPage: Array[Byte], numValues: Int): ColVec = {
    val width = indexPage(0) & 0xFF
    val dec = new RleHybridDecoder(width, indexPage, 1, indexPage.length)
    val idx = new Array[Long](numValues)
    dec.get(idx, 0, numValues)
    dict match {
      case IntVec(us) =>
        val o = new Array[Int](numValues); var i = 0
        while (i < numValues) { o(i) = us(idx(i).toInt); i += 1 }; IntVec(o)
      case LongVec(us) =>
        val o = new Array[Long](numValues); var i = 0
        while (i < numValues) { o(i) = us(idx(i).toInt); i += 1 }; LongVec(o)
      case FloatVec(us) =>
        val o = new Array[Float](numValues); var i = 0
        while (i < numValues) { o(i) = us(idx(i).toInt); i += 1 }; FloatVec(o)
      case DoubleVec(us) =>
        val o = new Array[Double](numValues); var i = 0
        while (i < numValues) { o(i) = us(idx(i).toInt); i += 1 }; DoubleVec(o)
      case BytesVec(us) =>
        val o = new Array[Array[Byte]](numValues); var i = 0
        while (i < numValues) { o(i) = us(idx(i).toInt); i += 1 }; BytesVec(o)
      case BoolVec(_) => throw new IllegalArgumentException("no bool dict")
    }
  }
}

/** Tiny growable int list (avoids boxing on the id hot path). */
final class IntArrayList(initialCapacity: Int = 64) {
  private var a = new Array[Int](math.max(initialCapacity, 8))
  private var n = 0
  def add(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
    a(n) = v; n += 1
  }
  def get(i: Int): Int = a(i)
  def size: Int = n
  def clear(): Unit = n = 0
}
