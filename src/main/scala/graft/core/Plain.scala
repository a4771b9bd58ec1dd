package graft.core

/** PLAIN encoding (reference semantics at
  * `/root/reference/src/encodings/encoding.rs:85-183`):
  *  - BOOLEAN: 1 bit per value, LSB-first
  *  - INT32/FLOAT: 4-byte little-endian
  *  - INT64/DOUBLE: 8-byte little-endian
  *  - BYTE_ARRAY: 4-byte LE length prefix then the bytes
  */
object PlainCodec {

  def encode(vec: ColVec): Array[Byte] = vec match {
    case BoolVec(vs) =>
      val w = new BitWriter(BitUtil.ceil8(vs.length) + 8)
      var i = 0
      while (i < vs.length) { w.putValue(if (vs(i)) 1L else 0L, 1); i += 1 }
      w.result()
    case IntVec(vs) =>
      val out = new Array[Byte](4 * vs.length)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < vs.length) { bb.putInt(vs(i)); i += 1 }
      out
    case LongVec(vs) =>
      val out = new Array[Byte](8 * vs.length)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < vs.length) { bb.putLong(vs(i)); i += 1 }
      out
    case FloatVec(vs) =>
      val out = new Array[Byte](4 * vs.length)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < vs.length) { bb.putFloat(vs(i)); i += 1 }
      out
    case DoubleVec(vs) =>
      val out = new Array[Byte](8 * vs.length)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < vs.length) { bb.putDouble(vs(i)); i += 1 }
      out
    case BytesVec(vs) =>
      var total = 0L
      var i = 0
      while (i < vs.length) { total += 4L + vs(i).length; i += 1 }
      val out = new Array[Byte](total.toInt)
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      i = 0
      while (i < vs.length) { bb.putInt(vs(i).length); bb.put(vs(i)); i += 1 }
      out
  }

  def decode(physicalType: Int, buf: Array[Byte], numValues: Int): ColVec =
    decodeSlice(physicalType, buf, 0, buf.length, numValues)

  def decodeSlice(physicalType: Int, buf: Array[Byte], off: Int, len: Int,
      numValues: Int): ColVec = physicalType match {
    case PhysicalType.Bool =>
      val r = new BitReader(buf, off, off + len)
      val out = new Array[Boolean](numValues)
      var i = 0
      while (i < numValues) { out(i) = r.getValue(1) != 0L; i += 1 }
      BoolVec(out)
    case PhysicalType.Int32 =>
      val bb = java.nio.ByteBuffer.wrap(buf, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Int](numValues)
      var i = 0
      while (i < numValues) { out(i) = bb.getInt(); i += 1 }
      IntVec(out)
    case PhysicalType.Int64 =>
      val bb = java.nio.ByteBuffer.wrap(buf, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Long](numValues)
      var i = 0
      while (i < numValues) { out(i) = bb.getLong(); i += 1 }
      LongVec(out)
    case PhysicalType.Float =>
      val bb = java.nio.ByteBuffer.wrap(buf, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](numValues)
      var i = 0
      while (i < numValues) { out(i) = bb.getFloat(); i += 1 }
      FloatVec(out)
    case PhysicalType.Double =>
      val bb = java.nio.ByteBuffer.wrap(buf, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Double](numValues)
      var i = 0
      while (i < numValues) { out(i) = bb.getDouble(); i += 1 }
      DoubleVec(out)
    case PhysicalType.Bytes =>
      val bb = java.nio.ByteBuffer.wrap(buf, off, len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Array[Byte]](numValues)
      var i = 0
      while (i < numValues) {
        val n = bb.getInt()
        val a = new Array[Byte](n)
        bb.get(a)
        out(i) = a
        i += 1
      }
      BytesVec(out)
  }
}
