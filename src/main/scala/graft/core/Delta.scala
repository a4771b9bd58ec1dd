package graft.core

/** DELTA_BINARY_PACKED (frame-of-reference) for INT32/INT64.
  *
  * Stream layout (reference semantics at
  * `/root/reference/src/encodings/encoding.rs:516-811`):
  * {{{
  * header := vlq(blockSize=128) vlq(numMiniBlocks=4) vlq(totalValues)
  *           zigzagVlq(firstValue)
  * block  := zigzagVlq(minDelta) [4 miniblock bit-width bytes]
  *           [miniblocks: 32 values each, bit-packed (delta - minDelta)]
  * }}}
  * Deltas use WRAPPING subtraction; the INT32 path wraps in 32 bits and
  * zero-extends the packed (delta - minDelta) to avoid high garbage bits.
  * Partial miniblocks are padded with zeros; miniblocks never started keep
  * bit width 0. Partial blocks are flushed at `flush()`.
  */
final class DeltaBinaryPackedEncoder(int32: Boolean) {
  private val BlockSize = 128
  private val NumMiniBlocks = 4
  private val MiniBlockSize = BlockSize / NumMiniBlocks

  private val blocks = new BitWriter(1024)
  private var totalValues = 0L
  private var firstValue = 0L
  private var currentValue = 0L
  private var valuesInBlock = 0
  private val deltas = new Array[Long](BlockSize)

  @inline private def subtract(left: Long, right: Long): Long =
    if (int32) (left.toInt - right.toInt).toLong else left - right

  @inline private def subtractU64(left: Long, right: Long): Long =
    if (int32) ((left.toInt - right.toInt).toLong & 0xFFFFFFFFL) else left - right

  def put(values: Array[Long], off: Int, len: Int): Unit = {
    if (len == 0) return
    var idx = off
    if (totalValues == 0) {
      firstValue = values(off)
      currentValue = firstValue
      idx += 1
    }
    totalValues += len
    val end = off + len
    while (idx < end) {
      val v = values(idx)
      deltas(valuesInBlock) = subtract(v, currentValue)
      currentValue = v
      idx += 1
      valuesInBlock += 1
      if (valuesInBlock == BlockSize) flushBlock()
    }
  }

  def put(values: Array[Long]): Unit = put(values, 0, values.length)

  def putInts(values: Array[Int], off: Int, len: Int): Unit = {
    var i = 0
    val tmp = new Array[Long](len)
    while (i < len) { tmp(i) = values(off + i).toLong; i += 1 }
    put(tmp, 0, len)
  }

  def estimatedSize: Int = blocks.bytesWritten

  /** Emit header ++ blocks and reset so the encoder is reusable. */
  def result(): Array[Byte] = {
    flushBlock()
    val header = new BitWriter(32)
    header.putVlq(BlockSize.toLong)
    header.putVlq(NumMiniBlocks.toLong)
    header.putVlq(totalValues)
    header.putZigZagVlq(firstValue)
    val h = header.result()
    val b = blocks.result()
    val out = new Array[Byte](h.length + b.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(b, 0, out, h.length, b.length)
    blocks.clear()
    totalValues = 0
    firstValue = 0
    currentValue = 0
    valuesInBlock = 0
    out
  }

  private def flushBlock(): Unit = {
    if (valuesInBlock == 0) return
    var minDelta = Long.MaxValue
    var i = 0
    while (i < valuesInBlock) { minDelta = math.min(minDelta, deltas(i)); i += 1 }
    blocks.putZigZagVlq(minDelta)
    val widthsPos = blocks.skip(NumMiniBlocks)
    var mb = 0
    var left = valuesInBlock
    while (mb < NumMiniBlocks && left > 0) {
      val n = math.min(MiniBlockSize, left)
      var maxPacked = 0L
      var j = 0
      while (j < n) {
        val p = subtractU64(deltas(mb * MiniBlockSize + j), minDelta)
        if (java.lang.Long.compareUnsigned(p, maxPacked) > 0) maxPacked = p
        j += 1
      }
      val width = BitUtil.numRequiredBits(maxPacked)
      blocks.putAlignedOffset(width.toLong, 1, widthsPos + mb)
      j = 0
      while (j < n) {
        blocks.putValue(subtractU64(deltas(mb * MiniBlockSize + j), minDelta), width)
        j += 1
      }
      while (j < MiniBlockSize) { blocks.putValue(0L, width); j += 1 }
      left -= n
      mb += 1
    }
    valuesInBlock = 0
  }
}

object DeltaBinaryPackedDecoder {
  /** Decode a full stream produced by [[DeltaBinaryPackedEncoder]]. */
  def decode(buf: Array[Byte], int32: Boolean): Array[Long] = {
    val r = new BitReader(buf)
    val blockSize = r.getVlq().toInt
    val numMiniBlocks = r.getVlq().toInt
    val total = r.getVlq().toInt
    val miniBlockSize = blockSize / numMiniBlocks
    val out = new Array[Long](total)
    if (total == 0) { r.getZigZagVlq(); return out }
    var current = r.getZigZagVlq()
    out(0) = if (int32) current.toInt.toLong else current
    var produced = 1
    val mbVals = new Array[Long](miniBlockSize)
    while (produced < total) {
      val minDelta = r.getZigZagVlq()
      val widths = new Array[Int](numMiniBlocks)
      var i = 0
      while (i < numMiniBlocks) { widths(i) = (r.getAligned(1) & 0xFF).toInt; i += 1 }
      var mb = 0
      while (mb < numMiniBlocks && produced < total) {
        r.getBatch(mbVals, 0, miniBlockSize, widths(mb))
        val take = math.min(miniBlockSize, total - produced)
        var j = 0
        while (j < take) {
          current =
            if (int32) (current.toInt + minDelta.toInt + mbVals(j).toInt).toLong
            else current + minDelta + mbVals(j)
          out(produced) = current
          produced += 1
          j += 1
        }
        mb += 1
      }
    }
    out
  }
}

/** DELTA_LENGTH_BYTE_ARRAY: lengths DELTA_BINARY_PACKED (int32) followed by
  * the concatenated raw bytes (reference
  * `/root/reference/src/encodings/encoding.rs:813-884`). */
object DeltaLengthByteArrayCodec {
  def encode(values: Array[Array[Byte]]): Array[Byte] = {
    val lenEnc = new DeltaBinaryPackedEncoder(int32 = true)
    val lens = new Array[Long](values.length)
    var total = 0L
    var i = 0
    while (i < values.length) { lens(i) = values(i).length.toLong; total += values(i).length; i += 1 }
    lenEnc.put(lens)
    val head = lenEnc.result()
    val out = new Array[Byte]((head.length + total).toInt)
    System.arraycopy(head, 0, out, 0, head.length)
    var pos = head.length
    i = 0
    while (i < values.length) {
      System.arraycopy(values(i), 0, out, pos, values(i).length)
      pos += values(i).length
      i += 1
    }
    out
  }

  /** Returns (values, bytesConsumed). */
  def decodeWithLength(buf: Array[Byte], off: Int): (Array[Array[Byte]], Int) = {
    // The length stream is self-delimiting only via its value count, so we
    // re-walk it with a reader to find where the data section starts.
    val r = new BitReader(buf, off, buf.length)
    val blockSize = r.getVlq().toInt
    val numMiniBlocks = r.getVlq().toInt
    val total = r.getVlq().toInt
    val miniBlockSize = blockSize / numMiniBlocks
    val lens = new Array[Int](total)
    var dataStart = off
    if (total == 0) { r.getZigZagVlq(); dataStart = r.position }
    else {
      var current = r.getZigZagVlq().toInt
      lens(0) = current
      var produced = 1
      val mbVals = new Array[Long](miniBlockSize)
      while (produced < total) {
        val minDelta = r.getZigZagVlq().toInt
        val widths = new Array[Int](numMiniBlocks)
        var i = 0
        while (i < numMiniBlocks) { widths(i) = (r.getAligned(1) & 0xFF).toInt; i += 1 }
        var mb = 0
        while (mb < numMiniBlocks && produced < total) {
          r.getBatch(mbVals, 0, miniBlockSize, widths(mb))
          val take = math.min(miniBlockSize, total - produced)
          var j = 0
          while (j < take) {
            current = current + minDelta + mbVals(j).toInt
            lens(produced) = current
            produced += 1
            j += 1
          }
          mb += 1
        }
      }
      r.alignToByte()
      dataStart = r.position
    }
    val out = new Array[Array[Byte]](total)
    var pos = dataStart
    var i = 0
    while (i < total) {
      out(i) = java.util.Arrays.copyOfRange(buf, pos, pos + lens(i))
      pos += lens(i)
      i += 1
    }
    (out, pos - off)
  }

  def decode(buf: Array[Byte]): Array[Array[Byte]] = decodeWithLength(buf, 0)._1
}

/** DELTA_BYTE_ARRAY (incremental / front coding): shared-prefix lengths vs
  * the previous value DELTA_BINARY_PACKED, suffixes DELTA_LENGTH_BYTE_ARRAY
  * (reference `/root/reference/src/encodings/encoding.rs:886-967`). The
  * `previous` state persists across `put` calls and resets on `result()`. */
final class DeltaByteArrayEncoder {
  private val prefixLens = scala.collection.mutable.ArrayBuffer.empty[Long]
  private val suffixes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private var previous: Array[Byte] = Array.emptyByteArray

  def put(values: Array[Array[Byte]]): Unit = {
    var i = 0
    while (i < values.length) {
      val cur = values(i)
      val maxLen = math.min(previous.length, cur.length)
      var m = 0
      while (m < maxLen && previous(m) == cur(m)) m += 1
      prefixLens += m.toLong
      suffixes += java.util.Arrays.copyOfRange(cur, m, cur.length)
      previous = cur
      i += 1
    }
  }

  def result(): Array[Byte] = {
    val lenEnc = new DeltaBinaryPackedEncoder(int32 = true)
    lenEnc.put(prefixLens.toArray)
    val head = lenEnc.result()
    val tail = DeltaLengthByteArrayCodec.encode(suffixes.toArray)
    val out = new Array[Byte](head.length + tail.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(tail, 0, out, head.length, tail.length)
    prefixLens.clear()
    suffixes.clear()
    previous = Array.emptyByteArray
    out
  }
}

object DeltaByteArrayCodec {
  def encode(values: Array[Array[Byte]]): Array[Byte] = {
    val e = new DeltaByteArrayEncoder
    e.put(values)
    e.result()
  }

  def decode(buf: Array[Byte]): Array[Array[Byte]] = {
    val prefixStream = DeltaBinaryPackedDecoder.decode(buf, int32 = true)
    // find where the prefix-length stream ends: re-walk with a reader
    val r = new BitReader(buf)
    val blockSize = r.getVlq().toInt
    val numMiniBlocks = r.getVlq().toInt
    val total = r.getVlq().toInt
    r.getZigZagVlq()
    val miniBlockSize = blockSize / numMiniBlocks
    var produced = if (total == 0) 0 else 1
    while (produced < total) {
      r.getZigZagVlq()
      val widths = new Array[Int](numMiniBlocks)
      var i = 0
      while (i < numMiniBlocks) { widths(i) = (r.getAligned(1) & 0xFF).toInt; i += 1 }
      var mb = 0
      while (mb < numMiniBlocks && produced < total) {
        var j = 0
        while (j < miniBlockSize) { r.getValue(widths(mb)); j += 1 }
        produced += math.min(miniBlockSize, total - produced)
        mb += 1
      }
    }
    r.alignToByte()
    val (suffixes, _) = DeltaLengthByteArrayCodec.decodeWithLength(buf, r.position)
    val out = new Array[Array[Byte]](total)
    var prev: Array[Byte] = Array.emptyByteArray
    var i = 0
    while (i < total) {
      val p = prefixStream(i).toInt
      val s = suffixes(i)
      val v = new Array[Byte](p + s.length)
      System.arraycopy(prev, 0, v, 0, p)
      System.arraycopy(s, 0, v, p, s.length)
      out(i) = v
      prev = v
      i += 1
    }
    out
  }
}
