package graft.core

/** From-scratch Brotli (RFC 7932) codec — the reference's BrotliCodec
  * (`/root/reference/src/compression.rs:141-172`, brotli crate q1/lgwin22/
  * 22-bit window) realized on the JVM with zero new dependencies so that
  * brotli-compressed parquet pages from other writers (arrow, parquet-mr +
  * brotli-codec, duckdb) read, and our pages read back everywhere.
  *
  * Decoder: complete RFC 7932 — stream header, metadata/uncompressed/
  * compressed metablocks, simple+complex prefix codes, block switching for
  * all three categories, literal context modes (LSB6/MSB6/UTF8/Signed),
  * context maps with RLE + inverse move-to-front, NPOSTFIX/NDIRECT distance
  * alphabets, the 4-slot distance ring, and static-dictionary references
  * with all 121 word transforms.
  *
  * Encoder: valid RFC 7932 streams at a quality-1-like point — greedy LZ77
  * over a hash table, one metablock per 4 MiB, one block type and one
  * prefix tree per category (no context modeling, no dictionary refs),
  * canonical length-limited Huffman codes, distance-code-0 reuse, and an
  * uncompressed-metablock fallback for incompressible input. Streams are
  * verified externally against another implementation's decoder (pyarrow's
  * bundled brotli) — see BrotliSpec fixtures.
  *
  * The static tables (122,784-byte word dictionary, 121 transforms, the
  * 2,048-byte literal-context lookup) are the public constants of RFC 7932
  * Appendices A/B and §7.1, shipped as resources under /graft/brotli/.
  */
object Brotli {

  final class InvalidStream(msg: String) extends RuntimeException(msg)
  private def invalid(msg: String): Nothing = throw new InvalidStream(msg)

  // ------------------------------------------------------------ static data

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    if (in == null) invalid(s"missing brotli resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** RFC 7932 Appendix A word dictionary (sha256 20e42eb1…f35c70). */
  private lazy val dictData: Array[Byte] = {
    val d = res("/graft/brotli/dict.bin")
    require(d.length == 122784, s"dict.bin ${d.length}")
    d
  }

  /** §7.1 context lookup: 512 bytes per mode (256 for p1, 256 for p2) in
    * mode order LSB6, MSB6, UTF8, Signed. */
  private lazy val contextLut: Array[Byte] = {
    val c = res("/graft/brotli/context.bin")
    require(c.length == 2048, s"context.bin ${c.length}")
    c
  }

  /** Appendix B transforms, serialized as (u8 prefLen, pref, u8 kind,
    * u8 sufLen, suf) × 121. Kinds: 0 identity, 1-9 omit-last-N,
    * 10 uppercase-first, 11 uppercase-all, 12-20 omit-first-N. */
  private lazy val (tPrefix, tKind, tSuffix):
      (Array[Array[Byte]], Array[Int], Array[Array[Byte]]) = {
    val raw = res("/graft/brotli/transforms.bin")
    val pre = new Array[Array[Byte]](121)
    val kind = new Array[Int](121)
    val suf = new Array[Array[Byte]](121)
    var p = 0
    var i = 0
    while (i < 121) {
      val pl = raw(p) & 0xff; p += 1
      pre(i) = java.util.Arrays.copyOfRange(raw, p, p + pl); p += pl
      kind(i) = raw(p) & 0xff; p += 1
      val sl = raw(p) & 0xff; p += 1
      suf(i) = java.util.Arrays.copyOfRange(raw, p, p + sl); p += sl
      i += 1
    }
    require(p == raw.length, "transforms.bin trailing bytes")
    (pre, kind, suf)
  }

  /** Appendix A: #words of each length = 1 << SizeBits(len); 0 = invalid. */
  private val SizeBitsByLength = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7,
    6, 6, 5, 5)
  private val OffsetsByLength = Array(
    0, 0, 0, 0, 0, 4096, 9216, 21504, 35840, 44032, 53248, 63488, 74752,
    87040, 93696, 100864, 104704, 106752, 108928, 113536, 115968, 118528,
    119872, 121280, 122016, 122784)

  // §3.5 code-length-code symbol order and its fixed prefix code, as a
  // 4-bit LSB-first lookup (len, value).
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11,
    12, 13, 14, 15)
  private val ClclLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClclValue = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  /** Encoder side of the same fixed code: value → (LSB-first bits, len). */
  private val ClclEmitBits = Array(0, 7, 3, 2, 1, 15)
  private val ClclEmitLen = Array(2, 4, 3, 2, 2, 4)

  // §5 insert/copy length codes and §6 block count codes.
  private val InsertBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsertExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4,
    4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val BlockLenBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81,
    97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433,
    16625)
  private val BlockLenExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5,
    5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  /** §5: insert/copy high-bit groups for insert-and-copy cells 2..10
    * (cells 0,1 reuse entries 0,1 with an implied distance code 0). */
  private val InsertRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  // -------------------------------------------------------------- bit input

  /** LSB-first bit reader over a byte array with a 64-bit accumulator.
    * `peek` zero-pads past end-of-stream (final-byte padding); `skip`/`take`
    * fail on a genuine over-read. */
  private final class Bits(val buf: Array[Byte], val off: Int, val end: Int) {
    private var pos = off
    private var acc = 0L
    private var cnt = 0

    private def fill(): Unit = {
      if (pos + 8 <= end) {
        // one unaligned LE long load refills the accumulator to >= 56 bits;
        // bits shifted off the top belong to bytes we don't consume
        val v = BitUtil.LongView.get(buf, pos): Long
        val nBytes = (64 - cnt) >>> 3
        acc |= v << cnt
        cnt += nBytes << 3
        pos += nBytes
      } else {
        while (cnt <= 55 && pos < end) {
          acc |= (buf(pos) & 0xffL) << cnt
          cnt += 8
          pos += 1
        }
      }
    }
    def peek(n: Int): Int = {
      if (cnt < n) fill()
      (acc & ((1L << n) - 1)).toInt
    }
    def skip(n: Int): Unit = {
      if (cnt < n) { fill(); if (cnt < n) invalid("truncated brotli stream") }
      acc >>>= n
      cnt -= n
    }
    def take(n: Int): Int = {
      if (n == 0) return 0
      if (cnt < n) { fill(); if (cnt < n) invalid("truncated brotli stream") }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      cnt -= n
      v
    }
    def alignByte(): Unit = {
      val r = cnt & 7
      acc >>>= r
      cnt -= r
    }
    /** Whole bytes only — call after alignByte. Drains buffered bytes first. */
    def readBytes(dst: Array[Byte], dstOff: Int, len: Int): Unit = {
      var o = dstOff
      var rem = len
      while (cnt > 0 && rem > 0) {
        dst(o) = (acc & 0xff).toByte
        acc >>>= 8; cnt -= 8; o += 1; rem -= 1
      }
      // the bulk fill parks a preview of buf(pos)'s low bits above cnt;
      // once the valid bits are drained and pos is about to move, that
      // preview is stale and must not be OR-merged with the next fill
      if (cnt == 0) acc = 0
      if (rem > 0) {
        if (pos + rem > end) invalid("truncated uncompressed metablock")
        System.arraycopy(buf, pos, dst, o, rem)
        pos += rem
      }
    }
  }

  // ------------------------------------------------------- prefix code trees

  /** Flat decode table: entry = (codeLen << 16) | symbol, indexed by the
    * next `bits` stream bits (LSB-first). bits == 0 ⇒ single-symbol tree. */
  private final class HTree(val bits: Int, val tab: Array[Int])

  private def readSym(t: HTree, b: Bits): Int = {
    if (t.bits == 0) return t.tab(0) & 0xffff
    val e = t.tab(b.peek(t.bits))
    if (e < 0) invalid("invalid prefix code bits")
    b.skip(e >>> 16)
    e & 0xffff
  }

  /** Canonical tree from code lengths (complete Kraft required unless a
    * single symbol is used). Assignment order: by length, then symbol. */
  private def buildTree(lengths: Array[Int], n: Int): HTree = {
    var maxLen = 0
    var used = 0
    var lone = -1
    val blCount = new Array[Int](16)
    var i = 0
    while (i < n) {
      val l = lengths(i)
      if (l > 0) {
        if (l > 15) invalid("code length > 15")
        blCount(l) += 1
        if (l > maxLen) maxLen = l
        used += 1
        lone = i
      }
      i += 1
    }
    if (used == 0) invalid("empty prefix code")
    if (used == 1) return new HTree(0, Array(lone))
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    var space = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      space += blCount(l) << (maxLen - l)
      l += 1
    }
    if (space != (1 << maxLen)) invalid("prefix code not complete")
    val tab = new Array[Int](1 << maxLen)
    java.util.Arrays.fill(tab, -1)
    i = 0
    while (i < n) {
      val len = lengths(i)
      if (len > 0) {
        val c = nextCode(len); nextCode(len) += 1
        var j = Integer.reverse(c) >>> (32 - len)
        val step = 1 << len
        while (j < tab.length) {
          tab(j) = (len << 16) | i
          j += step
        }
      }
      i += 1
    }
    new HTree(maxLen, tab)
  }

  private def alphabetBits(alphabetSize: Int): Int =
    32 - Integer.numberOfLeadingZeros(alphabetSize - 1)

  /** §3.4/3.5: read one prefix-code description from the stream. */
  private def readHuffmanCode(alphabetSize: Int, b: Bits): HTree = {
    val ident = b.take(2)
    if (ident == 1) {
      // simple code: 1..4 symbols given explicitly
      val nsym = b.take(2) + 1
      val abits = alphabetBits(alphabetSize)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = b.take(abits)
        if (s >= alphabetSize) invalid("simple-code symbol out of range")
        var j = 0
        while (j < i) { if (syms(j) == s) invalid("duplicate simple symbol"); j += 1 }
        syms(i) = s
        i += 1
      }
      val lengths = new Array[Int](alphabetSize)
      nsym match {
        case 1 =>
          lengths(syms(0)) = 1 // any nonzero; buildTree returns 0-bit tree
        case 2 =>
          if (syms(0) > syms(1)) { val t = syms(0); syms(0) = syms(1); syms(1) = t }
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          if (syms(1) > syms(2)) { val t = syms(1); syms(1) = syms(2); syms(2) = t }
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case 4 =>
          if (b.take(1) == 0) {
            java.util.Arrays.sort(syms)
            var k = 0; while (k < 4) { lengths(syms(k)) = 2; k += 1 }
          } else {
            if (syms(2) > syms(3)) { val t = syms(2); syms(2) = syms(3); syms(3) = t }
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      buildTree(lengths, alphabetSize)
    } else {
      // complex code: code lengths themselves prefix-coded
      val hskip = ident // 0, 2 or 3
      val clLens = new Array[Int](18)
      var space = 32
      var i = hskip
      while (i < 18 && space > 0) {
        val idx = b.peek(4)
        b.skip(ClclLen(idx))
        val v = ClclValue(idx)
        clLens(ClOrder(i)) = v
        if (v != 0) space -= 32 >> v
        i += 1
      }
      if (space < 0) invalid("code-length code over-subscribed")
      val clTree = buildTree(clLens, 18)

      val lens = new Array[Int](alphabetSize)
      var symbol = 0
      var space2 = 32768
      var prevLen = 8
      var repeat = 0
      var repLen = 0
      while (symbol < alphabetSize && space2 > 0) {
        val c = readSym(clTree, b)
        if (c < 16) {
          lens(symbol) = c
          symbol += 1
          if (c != 0) { prevLen = c; space2 -= 32768 >> c }
          repeat = 0
        } else {
          val extraBits = if (c == 16) 2 else 3
          val nl = if (c == 16) prevLen else 0
          if (repLen != nl) { repeat = 0; repLen = nl }
          val old = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extraBits }
          repeat += b.take(extraBits) + 3
          val delta = repeat - old
          if (symbol + delta > alphabetSize) invalid("repeat past alphabet")
          var k = 0
          while (k < delta) { lens(symbol) = repLen; symbol += 1; k += 1 }
          if (repLen != 0) space2 -= delta * (32768 >> repLen)
        }
      }
      if (space2 < 0) invalid("prefix code over-subscribed")
      buildTree(lens, alphabetSize) // enforces completeness unless 1 symbol
    }
  }

  /** §7.3: context map with RLE-of-zeros and optional inverse MTF. */
  private def readContextMap(size: Int, ntrees: Int, b: Bits): Array[Byte] = {
    val rleMax = if (b.take(1) == 1) b.take(4) + 1 else 0
    val tree = readHuffmanCode(ntrees + rleMax, b)
    val map = new Array[Byte](size)
    var i = 0
    while (i < size) {
      val s = readSym(tree, b)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        var reps = (1 << s) + b.take(s)
        if (i + reps > size) invalid("context-map RLE past end")
        i += reps // zeros already there
      } else {
        map(i) = (s - rleMax).toByte
        i += 1
      }
    }
    if (b.take(1) == 1) {
      val mtf = new Array[Byte](256)
      var k = 0
      while (k < 256) { mtf(k) = k.toByte; k += 1 }
      i = 0
      while (i < size) {
        val idx = map(i) & 0xff
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(i) = v
        i += 1
      }
    }
    map
  }

  // ---------------------------------------------------------------- decoder

  private val BlockLenInfinite = 1 << 28

  /** Per-category (literal / insert&copy / distance) block-switch state. */
  private final class BlockCat(b: Bits, val n: Int) {
    var btype = 0
    private var prev = 1
    var len: Int = BlockLenInfinite
    private var typeTree: HTree = null
    private var lenTree: HTree = null
    if (n >= 2) {
      typeTree = readHuffmanCode(n + 2, b)
      lenTree = readHuffmanCode(26, b)
      len = readBlockLen(b)
    }
    private def readBlockLen(b: Bits): Int = {
      val s = readSym(lenTree, b)
      BlockLenBase(s) + b.take(BlockLenExtra(s))
    }
    def switchIfDone(b: Bits): Unit = {
      if (len == 0) {
        val s = readSym(typeTree, b)
        val nt =
          if (s == 0) prev
          else if (s == 1) { val t = btype + 1; if (t == n) 0 else t }
          else s - 2
        prev = btype
        btype = nt
        len = readBlockLen(b)
      }
    }
  }

  def decompress(in: Array[Byte]): Array[Byte] = decompress(in, 0, in.length, -1)

  def decompress(in: Array[Byte], expectedLen: Int): Array[Byte] =
    decompress(in, 0, in.length, expectedLen)

  /** Decode a complete brotli stream. `expectedLen < 0` ⇒ unknown (output
    * grows); otherwise the decoded size must match exactly. */
  def decompress(in: Array[Byte], off: Int, len: Int, expectedLen: Int): Array[Byte] = {
    val b = new Bits(in, off, off + len)

    // stream header: window size
    val wbits =
      if (b.take(1) == 0) 16
      else {
        val n = b.take(3)
        if (n != 0) 17 + n
        else {
          val m = b.take(3)
          if (m == 0) 17
          else if (m == 1) invalid("reserved WBITS")
          else 8 + m
        }
      }
    val windowSize = (1 << wbits) - 16

    var out = new Array[Byte](
      if (expectedLen >= 0) expectedLen else math.max(64, len * 3))
    var pos = 0
    def ensure(extra: Int): Unit = {
      if (pos + extra > out.length) {
        if (expectedLen >= 0) invalid("brotli output exceeds declared size")
        var cap = out.length
        while (cap < pos + extra) cap = cap + (cap >> 1) + 64
        out = java.util.Arrays.copyOf(out, cap)
      }
    }

    // distance ring: most recent at ring(ringIdx). Virgin ring per RFC 7932
    // §4 (google/brotli dist_rb = {16,15,11,4}, dist_rb_idx = 0, so code 0
    // on a virgin ring reads dist_rb[3] = 4 — "last" starts at 4, not 16).
    val ring = Array(16, 15, 11, 4)
    var ringIdx = 3
    def ringGet(k: Int): Int = ring((ringIdx - k) & 3)
    def ringPush(d: Int): Unit = { ringIdx = (ringIdx + 1) & 3; ring(ringIdx) = d }

    val word = new Array[Byte](64) // scratch for transformed dictionary words

    var done = false
    while (!done) {
      val islast = b.take(1) == 1
      if (islast && b.take(1) == 1) {
        done = true // ISLASTEMPTY
      } else {
        val mnib = b.take(2)
        if (mnib == 3) {
          // metadata block: skipped
          if (islast) invalid("metadata block cannot be last")
          if (b.take(1) != 0) invalid("reserved metadata bit")
          val skipBytes = b.take(2)
          var skip = 0
          var k = 0
          var lastByte = 0
          while (k < skipBytes) { lastByte = b.take(8); skip |= lastByte << (8 * k); k += 1 }
          if (skipBytes > 0) {
            if (lastByte == 0) invalid("metadata length padding")
            skip += 1
          }
          b.alignByte()
          val sink = new Array[Byte](math.min(skip, 4096))
          var rem = skip
          while (rem > 0) { val c = math.min(rem, sink.length); b.readBytes(sink, 0, c); rem -= c }
        } else {
          val mlen = b.take(4 * (4 + mnib)) + 1
          val uncompressed = !islast && b.take(1) == 1
          ensure(mlen)
          if (uncompressed) {
            b.alignByte()
            b.readBytes(out, pos, mlen)
            pos += mlen
          } else {
            // ---- metablock header ----
            val L = new BlockCat(b, readNBltypes(b))
            val I = new BlockCat(b, readNBltypes(b))
            val D = new BlockCat(b, readNBltypes(b))
            val npostfix = b.take(2)
            val ndirect = b.take(4) << npostfix
            val cmodes = new Array[Int](L.n)
            var i = 0
            while (i < L.n) { cmodes(i) = b.take(2); i += 1 }
            val ntreesL = readNBltypes(b)
            val cmapL =
              if (ntreesL >= 2) readContextMap(L.n * 64, ntreesL, b)
              else new Array[Byte](L.n * 64)
            val ntreesD = readNBltypes(b)
            val cmapD =
              if (ntreesD >= 2) readContextMap(D.n * 4, ntreesD, b)
              else new Array[Byte](D.n * 4)
            val litTrees = new Array[HTree](ntreesL)
            i = 0; while (i < ntreesL) { litTrees(i) = readHuffmanCode(256, b); i += 1 }
            val cmdTrees = new Array[HTree](I.n)
            i = 0; while (i < I.n) { cmdTrees(i) = readHuffmanCode(704, b); i += 1 }
            val distAlpha = 16 + ndirect + (48 << npostfix)
            val distTrees = new Array[HTree](ntreesD)
            i = 0; while (i < ntreesD) { distTrees(i) = readHuffmanCode(distAlpha, b); i += 1 }

            // ---- command loop ----
            var rem = mlen
            while (rem > 0) {
              I.switchIfDone(b); I.len -= 1
              val cmd = readSym(cmdTrees(I.btype), b)
              val cell = cmd >>> 6
              val lutIdx = if (cell < 2) cell else cell - 2
              val insCode = InsertRangeLut(lutIdx) + ((cmd >>> 3) & 7)
              val copyCode = CopyRangeLut(lutIdx) + (cmd & 7)
              val insLen = InsertBase(insCode) + b.take(InsertExtra(insCode))
              val copyLen = CopyBase(copyCode) + b.take(CopyExtra(copyCode))
              if (insLen > rem) invalid("insert length exceeds metablock")

              if (L.n == 1 && ntreesL == 1) {
                // common writer shape (q0/q1, incl. ours): one literal block
                // type, one literal tree — context and switch checks vanish
                val t = litTrees(0)
                var j = 0
                while (j < insLen) {
                  out(pos) = readSym(t, b).toByte
                  pos += 1
                  j += 1
                }
              } else {
                var j = 0
                while (j < insLen) {
                  L.switchIfDone(b); L.len -= 1
                  val mode = cmodes(L.btype) << 9
                  val p1 = if (pos > 0) out(pos - 1) & 0xff else 0
                  val p2 = if (pos > 1) out(pos - 2) & 0xff else 0
                  val ctx = (contextLut(mode + p1) | contextLut(mode + 256 + p2)) & 0xff
                  out(pos) = readSym(litTrees(cmapL(L.btype * 64 + ctx) & 0xff), b).toByte
                  pos += 1
                  j += 1
                }
              }
              rem -= insLen

              if (rem > 0) {
                val maxDist = math.min(pos.toLong, windowSize.toLong).toInt
                var distance = 0
                if (cell < 2) {
                  distance = ringGet(0)
                } else {
                  D.switchIfDone(b); D.len -= 1
                  val dctx = if (copyLen > 4) 3 else copyLen - 2
                  val dsym = readSym(distTrees(cmapD(D.btype * 4 + dctx) & 0xff), b)
                  if (dsym < 16) {
                    distance = dsym match {
                      case 0 => ringGet(0)
                      case 1 => ringGet(1)
                      case 2 => ringGet(2)
                      case 3 => ringGet(3)
                      case k if k < 10 => ringGet(0) + (if ((k & 1) == 1) (k - 3) >> 1 else -((k - 2) >> 1))
                      case k => ringGet(1) + (if ((k & 1) == 1) (k - 9) >> 1 else -((k - 8) >> 1))
                    }
                    if (distance <= 0) invalid("non-positive ring distance")
                  } else if (dsym < 16 + ndirect) {
                    distance = dsym - 16 + 1
                  } else {
                    val dcode = dsym - 16 - ndirect
                    val postfix = dcode & ((1 << npostfix) - 1)
                    val hcode = dcode >>> npostfix
                    val nbits = 1 + (hcode >> 1)
                    val extra = b.take(nbits)
                    val offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = ((offset + extra) << npostfix) + postfix + ndirect + 1
                  }
                  if (dsym != 0 && distance <= maxDist) ringPush(distance)
                }

                if (distance <= maxDist) {
                  if (copyLen > rem) invalid("copy length exceeds metablock")
                  var src = pos - distance
                  if (distance >= copyLen) {
                    System.arraycopy(out, src, out, pos, copyLen)
                    pos += copyLen
                  } else {
                    // overlapping: replicate the period, doubling via
                    // arraycopy once enough bytes exist
                    var done2 = 0
                    while (done2 < copyLen && done2 < distance) {
                      out(pos) = out(src); pos += 1; src += 1; done2 += 1
                    }
                    while (done2 < copyLen) {
                      val chunk = math.min(done2, copyLen - done2)
                      System.arraycopy(out, pos - done2, out, pos, chunk)
                      pos += chunk
                      done2 += chunk
                    }
                  }
                  rem -= copyLen
                } else {
                  // static dictionary reference
                  if (copyLen < 4 || copyLen > 24) invalid(s"dictionary length $copyLen")
                  val ndbits = SizeBitsByLength(copyLen)
                  val address = distance - maxDist - 1
                  val wordIdx = address & ((1 << ndbits) - 1)
                  val tid = address >>> ndbits
                  if (tid >= 121) invalid(s"transform id $tid")
                  val n = transformWord(word, copyLen, wordIdx, tid)
                  if (n > rem) invalid("dictionary word exceeds metablock")
                  System.arraycopy(word, 0, out, pos, n)
                  pos += n
                  rem -= n
                }
              }
            }
          }
          if (islast) done = true
        }
      }
    }

    if (expectedLen >= 0 && pos != expectedLen)
      invalid(s"decoded $pos bytes, expected $expectedLen")
    if (pos == out.length) out else java.util.Arrays.copyOf(out, pos)
  }

  private def readNBltypes(b: Bits): Int =
    if (b.take(1) == 0) 1
    else {
      val n = b.take(3)
      (1 << n) + 1 + b.take(n)
    }

  /** Emit dictionary word `wordIdx` of length `len` under transform `tid`
    * into `dst`; returns output length (≤ 24 + prefix + suffix ≤ 64). */
  private def transformWord(dst: Array[Byte], len: Int, wordIdx: Int, tid: Int): Int = {
    val pre = tPrefix(tid)
    val suf = tSuffix(tid)
    val kind = tKind(tid)
    var p = 0
    System.arraycopy(pre, 0, dst, 0, pre.length)
    p += pre.length
    var ws = OffsetsByLength(len) + len * wordIdx
    var we = ws + len
    if (kind >= 12) ws += math.min(kind - 11, len) // omit-first-N
    else if (kind >= 1 && kind <= 9) we -= math.min(kind, len) // omit-last-N
    val q = p
    while (ws < we) { dst(p) = dictData(ws); ws += 1; p += 1 }
    if (kind == 10) uppercase(dst, q, p, once = true)
    else if (kind == 11) uppercase(dst, q, p, once = false)
    System.arraycopy(suf, 0, dst, p, suf.length)
    p + suf.length
  }

  /** §8 UTF-8-aware uppercasing used by transforms 10/11. */
  private def uppercase(buf: Array[Byte], from: Int, to: Int, once: Boolean): Unit = {
    var i = from
    while (i < to) {
      val c = buf(i) & 0xff
      if (c < 192) {
        if (c >= 97 && c <= 122) buf(i) = (c ^ 32).toByte
        i += 1
      } else if (c < 224) {
        if (i + 1 < to) buf(i + 1) = (buf(i + 1) ^ 32).toByte
        i += 2
      } else {
        if (i + 2 < to) buf(i + 2) = (buf(i + 2) ^ 5).toByte
        i += 3
      }
      if (once) i = to
    }
  }

  // ---------------------------------------------------------------- encoder

  private val MaxMetablock = 1 << 22 // 4 MiB input per metablock
  private val HashBits = 16
  private val MinMatch = 4

  def compress(in: Array[Byte]): Array[Byte] = compress(in, 0, in.length)

  def compress(in: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val w = new BitWriter(math.max(64, len / 3))

    // window: smallest WBITS whose window covers the input (capped at 24)
    var wbits = 10
    while (wbits < 24 && (1L << wbits) - 16 < len) wbits += 1
    val windowSize = ((1L << wbits) - 16).toInt
    if (wbits == 16) w.putValue(0, 1)
    else if (wbits >= 18) { w.putValue(1, 1); w.putValue(wbits - 17, 3) }
    else if (wbits == 17) { w.putValue(1, 1); w.putValue(0, 3); w.putValue(0, 3) }
    else { w.putValue(1, 1); w.putValue(0, 3); w.putValue(wbits - 8, 3) }

    if (len == 0) {
      w.putValue(1, 1) // ISLAST
      w.putValue(1, 1) // ISLASTEMPTY
      w.alignToByte()
      return w.result()
    }

    val table = new Array[Int](1 << HashBits) // pos+1; 0 = empty
    var lastDist = 4 // decoder's virgin-ring last distance (RFC 7932 §4)
    var needFinalEmpty = false
    var blockStart = off
    val end = off + len
    while (blockStart < end) {
      val blockEnd = math.min(blockStart + MaxMetablock, end)
      val isLast = blockEnd == end
      needFinalEmpty = emitMetablock(w, in, off, blockStart, blockEnd, isLast,
        windowSize, table, ld => lastDist = ld, lastDist)
      blockStart = blockEnd
    }
    if (needFinalEmpty) {
      w.putValue(1, 1) // ISLAST
      w.putValue(1, 1) // ISLASTEMPTY
    }
    w.alignToByte()
    w.result()
  }

  /** One metablock: greedy-LZ parse, single tree per category, entropy-cost
    * fallback to an uncompressed metablock. Returns true when a final empty
    * metablock is still needed (uncompressed blocks cannot carry ISLAST). */
  private def emitMetablock(w: BitWriter, in: Array[Byte], streamOff: Int,
      start: Int, endPos: Int, isLast: Boolean, windowSize: Int,
      table: Array[Int], setLastDist: Int => Unit, lastDist0: Int): Boolean = {
    val mlen = endPos - start

    // ---- greedy LZ parse ----
    // command i: literals [litStart(i), litStart(i)+litLen(i)), then copy
    // copyLen(i) at dist(i); dist(i) == 0 ⇒ trailing literal-only command.
    val litStart = new IntArrayList
    val litLen = new IntArrayList
    val copyLen = new IntArrayList
    val dist = new IntArrayList

    var i = start
    var anchor = start
    val hashEnd = endPos - 3
    while (i < hashEnd) {
      val v = load32(in, i)
      val h = (v * -1640531535) >>> (32 - HashBits)
      val cand = table(h) - 1 + streamOff
      table(h) = i + 1 - streamOff
      val d = i - cand
      if (cand >= streamOff && d <= windowSize && load32(in, cand) == v) {
        var l = MinMatch
        val maxL = endPos - i
        while (l < maxL && in(cand + l) == in(i + l)) l += 1
        litStart.add(anchor); litLen.add(i - anchor)
        copyLen.add(l); dist.add(d)
        var k = i + 1
        val stop = math.min(i + l, hashEnd)
        while (k < stop) {
          table((load32(in, k) * -1640531535) >>> (32 - HashBits)) = k + 1 - streamOff
          k += 2
        }
        i += l
        anchor = i
      } else i += 1
    }
    if (anchor < endPos) {
      litStart.add(anchor); litLen.add(endPos - anchor)
      copyLen.add(0); dist.add(0)
    }
    val nCmd = litStart.size

    // ---- symbol assignment + histograms ----
    val cmdSym = new Array[Int](nCmd)
    val distSym = new Array[Int](nCmd) // -1: none (implied or trailing)
    val distExtraVal = new Array[Int](nCmd)
    val distExtraBits = new Array[Int](nCmd)
    val litHist = new Array[Int](256)
    val cmdHist = new Array[Int](704)
    val distHist = new Array[Int](64) // NPOSTFIX=0, NDIRECT=0 ⇒ 16+48
    var ld = lastDist0
    var bitsEstimate = 0L
    i = 0
    while (i < nCmd) {
      val il = litLen.get(i)
      val cl0 = copyLen.get(i)
      val d = dist.get(i)
      val trailing = d == 0
      val cl = if (trailing) 2 else cl0
      val ic = lengthCode(il, InsertBase)
      val cc = lengthCode(cl, CopyBase)
      bitsEstimate += InsertExtra(ic) + CopyExtra(cc)
      val useD0 = !trailing && d == ld
      var sym = 0
      if (useD0 && ic < 8 && cc < 16) {
        sym = ((cc >> 3) << 6) | ((ic & 7) << 3) | (cc & 7)
        distSym(i) = -1
      } else {
        val cellIdx = (ic >> 3, cc >> 3) match {
          case (0, 0) => 2
          case (0, 1) => 3
          case (1, 0) => 4
          case (1, 1) => 5
          case (0, 2) => 6
          case (2, 0) => 7
          case (1, 2) => 8
          case (2, 1) => 9
          case _ => 10
        }
        sym = (cellIdx << 6) | ((ic & 7) << 3) | (cc & 7)
        if (trailing) distSym(i) = -1
        else if (useD0) { distSym(i) = 0; distExtraBits(i) = 0; distHist(0) += 1 }
        else {
          // invert §4: distance = ((2 + (hc&1)) << nbits) - 4 + extra + 1
          val u = d + 3
          val nbits = 30 - Integer.numberOfLeadingZeros(u)
          val hc = 2 * (nbits - 1) + ((u >>> nbits) - 2)
          distSym(i) = 16 + hc
          distExtraVal(i) = u & ((1 << nbits) - 1)
          distExtraBits(i) = nbits
          distHist(16 + hc) += 1
          bitsEstimate += nbits
        }
      }
      if (!trailing && distSym(i) != 0) ld = d
      cmdSym(i) = sym
      cmdHist(sym) += 1
      var j = litStart.get(i)
      val je = j + il
      while (j < je) { litHist(in(j) & 0xff) += 1; j += 1 }
      i += 1
    }

    // ---- entropy decision: compressed vs uncompressed metablock ----
    // a tree description must exist even for a category never used (e.g.
    // a literal-only block still declares a distance tree)
    if (allZero(litHist)) litHist(0) = 1
    if (allZero(distHist)) distHist(0) = 1
    val litLens = huffLengths(litHist, 15)
    val cmdLens = huffLengths(cmdHist, 15)
    val distLens = huffLengths(distHist, 15)
    // symbols of a single-entry alphabet cost zero bits on the wire
    val litEmit = emissionLens(litLens)
    val cmdEmit = emissionLens(cmdLens)
    val distEmit = emissionLens(distLens)
    var b = bitsEstimate + 700 // header slack
    b += treeCost(litHist, litEmit) + treeCost(cmdHist, cmdEmit) +
      treeCost(distHist, distEmit)
    if (b >>> 3 >= mlen) {
      // uncompressed metablock (never ISLAST; caller adds the empty tail)
      w.putValue(0, 1) // ISLAST
      writeMlen(w, mlen)
      w.putValue(1, 1) // ISUNCOMPRESSED
      w.alignToByte()
      w.putBytes(in, start, mlen)
      // decoder state: uncompressed bytes enter the window but leave the
      // distance ring alone, so lastDist survives as-is.
      setLastDist(lastDist0)
      return true
    }

    setLastDist(ld)
    w.putValue(if (isLast) 1 else 0, 1)
    if (isLast) w.putValue(0, 1) // ISLASTEMPTY = 0
    writeMlen(w, mlen)
    if (!isLast) w.putValue(0, 1) // ISUNCOMPRESSED = 0
    w.putValue(0, 1) // NBLTYPES_L = 1
    w.putValue(0, 1) // NBLTYPES_I = 1
    w.putValue(0, 1) // NBLTYPES_D = 1
    w.putValue(0, 2) // NPOSTFIX = 0
    w.putValue(0, 4) // NDIRECT = 0
    w.putValue(0, 2) // context mode 0 (LSB6; single tree, irrelevant)
    w.putValue(0, 1) // NTREES_L = 1
    w.putValue(0, 1) // NTREES_D = 1
    writeHuffmanCode(w, litLens, 256)
    writeHuffmanCode(w, cmdLens, 704)
    writeHuffmanCode(w, distLens, 64)

    val litCodes = canonicalCodes(litLens)
    val cmdCodes = canonicalCodes(cmdLens)
    val distCodes = canonicalCodes(distLens)
    i = 0
    while (i < nCmd) {
      putCode(w, cmdCodes, cmdEmit, cmdSym(i))
      val il = litLen.get(i)
      val cl0 = copyLen.get(i)
      val cl = if (cl0 == 0) 2 else cl0
      val ic = lengthCode(il, InsertBase)
      val cc = lengthCode(cl, CopyBase)
      if (InsertExtra(ic) > 0) w.putValue(il - InsertBase(ic), InsertExtra(ic))
      if (CopyExtra(cc) > 0) w.putValue(cl - CopyBase(cc), CopyExtra(cc))
      var j = litStart.get(i)
      val je = j + il
      while (j < je) { putCode(w, litCodes, litEmit, in(j) & 0xff); j += 1 }
      val ds = distSym(i)
      if (ds >= 0) {
        putCode(w, distCodes, distEmit, ds)
        if (distExtraBits(i) > 0) w.putValue(distExtraVal(i), distExtraBits(i))
      }
      i += 1
    }
    false
  }

  @inline private def allZero(a: Array[Int]): Boolean = {
    var i = 0
    while (i < a.length) { if (a(i) != 0) return false; i += 1 }
    true
  }

  /** On-the-wire code lengths: identical to the header lengths except a
    * single-symbol alphabet, whose symbol costs zero bits. */
  private def emissionLens(lens: Array[Int]): Array[Int] = {
    var used = 0
    var i = 0
    while (i < lens.length) { if (lens(i) > 0) used += 1; i += 1 }
    if (used == 1) new Array[Int](lens.length) else lens
  }

  private def writeMlen(w: BitWriter, mlen: Int): Unit = {
    val nibbles =
      if (mlen <= (1 << 16)) 4 else if (mlen <= (1 << 20)) 5 else 6
    w.putValue(nibbles - 4, 2)
    w.putValue((mlen - 1).toLong, 4 * nibbles)
  }

  @inline private def load32(a: Array[Byte], i: Int): Int =
    (a(i) & 0xff) | ((a(i + 1) & 0xff) << 8) | ((a(i + 2) & 0xff) << 16) |
      ((a(i + 3) & 0xff) << 24)

  /** Largest code whose base ≤ v (tables are ascending, 24 entries). */
  private def lengthCode(v: Int, base: Array[Int]): Int = {
    var lo = 0
    var hi = 23
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (base(mid) <= v) lo = mid else hi = mid - 1
    }
    lo
  }

  private def treeCost(hist: Array[Int], lens: Array[Int]): Long = {
    var s = 0L
    var i = 0
    while (i < hist.length) { s += hist(i).toLong * lens(i); i += 1 }
    s
  }

  /** Length-limited Huffman code lengths (complete Kraft by construction,
    * zlib-style overflow repair). Returns all-zero for an empty histogram
    * and a single length-1 entry for a one-symbol histogram — both special
    * cases the callers route through the simple form / zero-bit emission. */
  private def huffLengths(hist: Array[Int], maxLen: Int): Array[Int] = {
    val n = hist.length
    val lens = new Array[Int](n)
    var used = 0
    var i = 0
    while (i < n) { if (hist(i) > 0) used += 1; i += 1 }
    if (used == 0) return lens
    if (used == 1) {
      i = 0
      while (i < n) { if (hist(i) > 0) lens(i) = 1; i += 1 }
      return lens
    }

    // leaves sorted by (weight, symbol) ascending
    val sorted = new Array[Long](used)
    var k = 0
    i = 0
    while (i < n) {
      if (hist(i) > 0) { sorted(k) = (hist(i).toLong << 32) | i; k += 1 }
      i += 1
    }
    java.util.Arrays.sort(sorted)
    val leafW = new Array[Long](used)
    val leafSym = new Array[Int](used)
    i = 0
    while (i < used) {
      leafW(i) = sorted(i) >>> 32
      leafSym(i) = (sorted(i) & 0xffffffffL).toInt
      i += 1
    }

    // two-queue Huffman merge; nodes indexed used.. with parent pointers
    val weight = new Array[Long](2 * used)
    val parent = new Array[Int](2 * used)
    java.util.Arrays.fill(parent, -1)
    var li = 0
    var nodeHead = used
    var nodeTail = used
    def takeMin(): Int =
      if (li < used && (nodeHead == nodeTail || leafW(li) <= weight(nodeHead))) {
        li += 1; li - 1
      } else { nodeHead += 1; nodeHead - 1 }
    var merges = 0
    while (merges < used - 1) {
      val a = takeMin()
      val c = takeMin()
      weight(nodeTail) = (if (a < used) leafW(a) else weight(a)) +
        (if (c < used) leafW(c) else weight(c))
      parent(a) = nodeTail
      parent(c) = nodeTail
      nodeTail += 1
      merges += 1
    }

    // depth per leaf, counts clamped at maxLen
    val counts = new Array[Int](maxLen + 1)
    var overflow = false
    i = 0
    while (i < used) {
      var d = 0
      var p = parent(i)
      while (p != -1) { d += 1; p = parent(p) }
      if (d > maxLen) { d = maxLen; overflow = true }
      lens(leafSym(i)) = d
      counts(d) += 1
      i += 1
    }
    if (overflow) {
      // zlib gen_bitlen repair: move one code up from the deepest non-empty
      // level < maxLen until the Kraft sum is exact again
      var kraft = 0L
      var l = 1
      while (l <= maxLen) { kraft += counts(l).toLong << (maxLen - l); l += 1 }
      val full = 1L << maxLen
      while (kraft > full) {
        var bits = maxLen - 1
        while (counts(bits) == 0) bits -= 1
        counts(bits) -= 1
        counts(bits + 1) += 2
        counts(maxLen) -= 1
        // net change: -2^-(bits) + 2·2^-(bits+1) - 2^-maxLen = -2^-maxLen
        kraft -= 1
      }
      // reassign: shortest lengths to heaviest leaves (leafSym ascending)
      var posHi = used - 1
      l = 1
      while (l <= maxLen) {
        var c = counts(l)
        while (c > 0) { lens(leafSym(posHi)) = l; posHi -= 1; c -= 1 }
        l += 1
      }
    }
    lens
  }

  /** Canonical code values (MSB-first), same assignment as the decoder. */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val n = lens.length
    val codes = new Array[Int](n)
    val blCount = new Array[Int](16)
    var maxLen = 0
    var i = 0
    while (i < n) {
      val l = lens(i)
      if (l > 0) { blCount(l) += 1; if (l > maxLen) maxLen = l }
      i += 1
    }
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    i = 0
    while (i < n) {
      val ln = lens(i)
      if (ln > 0) { codes(i) = nextCode(ln); nextCode(ln) += 1 }
      i += 1
    }
    codes
  }

  @inline private def putCode(w: BitWriter, codes: Array[Int],
      lens: Array[Int], sym: Int): Unit = {
    val l = lens(sym)
    w.putValue((Integer.reverse(codes(sym)) >>> (32 - l)).toLong, l)
  }

  /** Emit a §3.4/3.5 prefix-code description for `lens`. */
  private def writeHuffmanCode(w: BitWriter, lens: Array[Int],
      alphabetSize: Int): Unit = {
    var used = 0
    var i = 0
    while (i < lens.length) { if (lens(i) > 0) used += 1; i += 1 }
    require(used > 0, "cannot emit empty prefix code")
    if (used <= 4) {
      // simple form: symbols ordered by (length, symbol)
      val syms = (0 until lens.length).filter(lens(_) > 0)
        .sortBy(s => (lens(s), s)).toArray
      w.putValue(1, 2)
      w.putValue(used - 1, 2)
      val abits = alphabetBits(alphabetSize)
      var k = 0
      while (k < used) { w.putValue(syms(k).toLong, abits); k += 1 }
      if (used == 4) {
        // tree-select: 0 = (2,2,2,2), 1 = (1,2,3,3)
        w.putValue(if (lens(syms(0)) == 1) 1 else 0, 1)
      }
      return
    }

    // complex form: token stream over the code-length alphabet, chain-free
    // rep codes (a literal length between consecutive 16/17s resets the
    // decoder's repeat chain, keeping emission independent).
    var last = lens.length - 1
    while (lens(last) == 0) last -= 1
    val tokSym = new IntArrayList
    val tokExtra = new IntArrayList
    i = 0
    while (i <= last) {
      val v = lens(i)
      var run = 1
      while (i + run <= last && lens(i + run) == v) run += 1
      if (v == 0) {
        var n = run
        var first = true
        while (n >= 3) {
          if (!first) { tokSym.add(0); tokExtra.add(-1); n -= 1 }
          if (n >= 3) {
            val k = math.min(n, 10)
            tokSym.add(17); tokExtra.add(k - 3)
            n -= k
          }
          first = false
        }
        while (n > 0) { tokSym.add(0); tokExtra.add(-1); n -= 1 }
      } else {
        var n = run
        tokSym.add(v); tokExtra.add(-1); n -= 1
        while (n >= 3) {
          val k = math.min(n, 6)
          tokSym.add(16); tokExtra.add(k - 3)
          n -= k
          if (n >= 3) { tokSym.add(v); tokExtra.add(-1); n -= 1 }
        }
        while (n > 0) { tokSym.add(v); tokExtra.add(-1); n -= 1 }
      }
      i += run
    }

    val clHist = new Array[Int](18)
    i = 0
    while (i < tokSym.size) { clHist(tokSym.get(i)) += 1; i += 1 }
    val clLens = huffLengths(clHist, 5)
    // the complex reader needs a complete code-length code (≥2 symbols);
    // token streams over ≥5 distinct value-lengths always produce ≥2
    require(clHist.count(_ > 0) >= 2, "degenerate code-length code")
    val clCodes = canonicalCodes(clLens)

    w.putValue(0, 2) // HSKIP = 0
    var lastOrder = 17
    while (clLens(ClOrder(lastOrder)) == 0) lastOrder -= 1
    i = 0
    while (i <= lastOrder) {
      val v = clLens(ClOrder(i))
      w.putValue(ClclEmitBits(v), ClclEmitLen(v))
      i += 1
    }
    i = 0
    while (i < tokSym.size) {
      val s = tokSym.get(i)
      putCode(w, clCodes, clLens, s)
      val e = tokExtra.get(i)
      if (e >= 0) w.putValue(e, if (s == 16) 2 else 3)
      i += 1
    }
  }
}
