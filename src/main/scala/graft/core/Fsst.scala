package graft.core

/** FSST-style string compression (extension codec required by the north
  * rule; not present in the reference — design follows the published FSST
  * idea: "FSST: Fast Random Access String Compression", Boncz, Neumann,
  * Leis, VLDB 2018).
  *
  * A per-chunk symbol table of up to 255 symbols (1..8 bytes each) is
  * trained on a sample; encoding greedily replaces the longest matching
  * symbol with its 1-byte code. Byte 255 is the escape code: it is followed
  * by one literal byte.
  *
  * Chunk stream layout (our own container — the reference pins no FSST
  * format):
  * {{{
  * vlq(numSymbols) { u8 len, bytes }*   -- the symbol table
  * vlq(numValues)
  * DELTA_BINARY_PACKED(compressedLengths)
  * concatenated compressed bytes
  * }}}
  */
object FsstCodec {
  private val Escape = 255
  private val MaxSymbols = 255
  private val MaxSymbolLen = 8

  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    // fast path: symbol as little-endian long + length mask, so a candidate
    // check is one masked 64-bit compare instead of a byte loop (the
    // "longCodes" idea of the FSST paper, re-derived — no code consulted)
    private[FsstCodec] val symWord: Array[Long] = symbols.map(wordOf)
    private[FsstCodec] val symMask: Array[Long] =
      symbols.map(s => if (s.length >= 8) -1L else (1L << (8 * s.length)) - 1)
    private[FsstCodec] val symLen: Array[Int] = symbols.map(_.length)
    // index: first byte -> symbol codes sorted by length descending (256
    // entries stays L1-resident; a 2-byte 64K index measured slower due to
    // cache misses)
    private[FsstCodec] val byFirst: Array[Array[Int]] = {
      val tmp = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val b = symbols(c)(0) & 0xFF
        tmp(b) = c :: tmp(b)
        c += 1
      }
      tmp.map(_.sortBy(c => -symbols(c).length).toArray)
    }
  }

  private val LongView = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Little-endian load of up to 8 bytes of `a` from [pos, end). */
  @inline private def loadWord(a: Array[Byte], pos: Int, end: Int): Long =
    if (pos + 8 <= end) LongView.get(a, pos).asInstanceOf[Long]
    else {
      val n = end - pos
      var w = 0L
      var k = 0
      while (k < n) { w |= (a(pos + k) & 0xFFL) << (8 * k); k += 1 }
      w
    }

  @inline private def wordOf(s: Array[Byte]): Long = loadWord(s, 0, s.length)

  /** Train a symbol table on sample text via iterative pair merging: start
    * from frequent single bytes, repeatedly count adjacent (symbol, symbol)
    * concatenations under the current table and keep the highest-gain 255. */
  def train(sample: Array[Byte], iterations: Int = 4): SymbolTable = {
    if (sample.isEmpty) return new SymbolTable(Array.empty)
    // iteration 0: frequent single bytes
    val byteCount = new Array[Long](256)
    var i = 0
    while (i < sample.length) { byteCount(sample(i) & 0xFF) += 1; i += 1 }
    var table = new SymbolTable(
      (0 until 256).filter(byteCount(_) > 0)
        .sortBy(b => -byteCount(b))
        .take(MaxSymbols)
        .map(b => Array(b.toByte))
        .toArray)

    var it = 0
    while (it < iterations) {
      // encode the sample with the current table, counting symbol usage and
      // adjacent-pair concatenations
      val gain = scala.collection.mutable.HashMap.empty[String, Long] // latin-1 keyed bytes
      def keyOf(a: Array[Byte], from: Int, len: Int): String =
        new String(a, from, len, java.nio.charset.StandardCharsets.ISO_8859_1)
      def bump(k: String, v: Long): Unit = gain.update(k, gain.getOrElse(k, 0L) + v)
      var pos = 0
      var prevStart = -1
      var prevLen = 0
      while (pos < sample.length) {
        val len = matchLen(table, sample, pos)
        val symLen = math.max(len, 1)
        // gain of keeping this symbol: bytes covered per 1 code byte
        bump(keyOf(sample, pos, symLen), symLen.toLong)
        // candidate: concat of previous symbol and this one (≤ 8 bytes)
        if (prevStart >= 0 && prevLen + symLen <= MaxSymbolLen) {
          bump(keyOf(sample, prevStart, prevLen + symLen), (prevLen + symLen - 1).toLong)
        }
        prevStart = pos
        prevLen = symLen
        pos += symLen
      }
      // deterministic: sort by gain desc, then key, and keep the top 255
      val top = gain.toSeq.sortBy { case (k, g) => (-g, k) }.take(MaxSymbols)
      table = new SymbolTable(top.map { case (k, _) =>
        k.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      }.toArray)
      it += 1
    }
    table
  }

  @inline private def matchLen(t: SymbolTable, a: Array[Byte], pos: Int): Int = {
    val code = matchCode(t, a, pos, a.length)
    if (code >= 0) t.symLen(code) else 0
  }

  @inline private def matchCode(t: SymbolTable, a: Array[Byte], pos: Int,
      end: Int): Int = {
    val cands = t.byFirst(a(pos) & 0xFF)
    if (cands.length == 0) return -1
    val word = loadWord(a, pos, end)
    val avail = end - pos
    var ci = 0
    while (ci < cands.length) {
      val code = cands(ci)
      if (t.symLen(code) <= avail &&
          (word & t.symMask(code)) == t.symWord(code)) return code
      ci += 1
    }
    -1
  }

  /** Compress a[from, from+len) into `out` starting at `outPos`; returns
    * new outPos. `out` must have >= 2*len headroom (worst case all
    * escapes). Symbol matches never cross the value's end boundary. */
  private def compressInto(t: SymbolTable, a: Array[Byte], from: Int, len: Int,
      out: Array[Byte], outPos0: Int): Int = {
    var outPos = outPos0
    var pos = from
    val end = from + len
    while (pos < end) {
      val code = matchCode(t, a, pos, end)
      if (code >= 0) {
        out(outPos) = code.toByte; outPos += 1
        pos += t.symLen(code)
      } else {
        out(outPos) = Escape.toByte
        out(outPos + 1) = a(pos)
        outPos += 2
        pos += 1
      }
    }
    outPos
  }

  def encode(vec: BytesVec, sampleBytes: Int = 1 << 14): Array[Byte] = {
    val n = vec.length
    // deterministic sample: prefix of the concatenated values (the arena is
    // already that concatenation)
    val sampleLen = math.min(sampleBytes, vec.totalBytes)
    val sample = java.util.Arrays.copyOfRange(vec.data, vec.offsets(0),
      vec.offsets(0) + sampleLen)
    val table = train(sample)
    val w = new BitWriter(1024)
    w.putVlq(table.symbols.length.toLong)
    var i = 0
    while (i < table.symbols.length) {
      w.putAligned(table.symbols(i).length.toLong, 1)
      w.putBytes(table.symbols(i))
      i += 1
    }
    w.putVlq(n.toLong)
    // single shared output buffer: worst case 2x raw (all escapes)
    val body = new Array[Byte](math.toIntExact(2L * vec.totalBytes + 8))
    val lens = new Array[Long](n)
    var bodyPos = 0
    i = 0
    while (i < n) {
      val next = compressInto(table, vec.data, vec.start(i), vec.len(i), body, bodyPos)
      lens(i) = (next - bodyPos).toLong
      bodyPos = next
      i += 1
    }
    val lenEnc = new DeltaBinaryPackedEncoder(int32 = true)
    lenEnc.put(lens)
    w.putBytes(lenEnc.result())
    w.putBytes(body, 0, bodyPos)
    w.result()
  }

  def decode(buf: Array[Byte]): BytesVec = {
    val r = new BitReader(buf)
    val nSyms = r.getVlq().toInt
    val symbols = new Array[Array[Byte]](nSyms)
    var i = 0
    while (i < nSyms) {
      val len = (r.getAligned(1) & 0xFF).toInt
      symbols(i) = r.getBytes(len)
      i += 1
    }
    val nValues = r.getVlq().toInt
    // decode the length stream, then slice the compressed bytes
    val lensStart = r.position
    val lens = DeltaBinaryPackedDecoder
      .decode(java.util.Arrays.copyOfRange(buf, lensStart, buf.length), int32 = true)
    // advance the reader past the length stream
    skipDeltaStream(r)
    // pass 1: exact decompressed sizes -> arena offsets
    val offsets = new Array[Int](nValues + 1)
    var acc = 0
    var pos = r.position
    i = 0
    while (i < nValues) {
      offsets(i) = acc
      acc += decompressedSize(symbols, buf, pos, lens(i).toInt)
      pos += lens(i).toInt
      i += 1
    }
    offsets(nValues) = acc
    // pass 2: fill the arena
    val data = new Array[Byte](acc)
    pos = r.position
    i = 0
    while (i < nValues) {
      decompressInto(symbols, buf, pos, lens(i).toInt, data, offsets(i))
      pos += lens(i).toInt
      i += 1
    }
    BytesVec(data, offsets)
  }

  private def skipDeltaStream(r: BitReader): Unit = {
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
  }

  private def decompressedSize(symbols: Array[Array[Byte]], buf: Array[Byte],
      off: Int, len: Int): Int = {
    var outLen = 0
    var pos = off
    val end = off + len
    while (pos < end) {
      val code = buf(pos) & 0xFF
      if (code == Escape) { outLen += 1; pos += 2 }
      else { outLen += symbols(code).length; pos += 1 }
    }
    outLen
  }

  private def decompressInto(symbols: Array[Array[Byte]], buf: Array[Byte],
      off: Int, len: Int, out: Array[Byte], outOff: Int): Unit = {
    var o = outOff
    var pos = off
    val end = off + len
    while (pos < end) {
      val code = buf(pos) & 0xFF
      if (code == Escape) {
        out(o) = buf(pos + 1); o += 1; pos += 2
      } else {
        val s = symbols(code)
        System.arraycopy(s, 0, out, o, s.length)
        o += s.length
        pos += 1
      }
    }
  }
}
