package graft.core

/** Per-chunk min/max statistics (the reference's `Statistics`,
  * `/root/reference/src/file/statistics.rs:252-330`): values are
  * PLAIN-encoded WITHOUT a length prefix (`:116-119`). Byte-array stats are
  * truncated to [[MaxByteStat]] bytes Parquet-style: min keeps a plain
  * prefix (still a lower bound); max increments the last incrementable byte
  * of the prefix (still an upper bound), or is omitted when the prefix is
  * all 0xFF. An empty array means "no stat" (all-null chunk or omitted). */
object MinMax {
  val MaxByteStat = 64

  /** (minStat, maxStat) for a vector of non-null values. */
  def compute(vec: ColVec): (Array[Byte], Array[Byte]) = vec match {
    case BoolVec(vs) =>
      if (vs.isEmpty) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        var anyF = false
        var anyT = false
        var i = 0
        while (i < vs.length) { if (vs(i)) anyT = true else anyF = true; i += 1 }
        (Array[Byte](if (anyF) 0 else 1), Array[Byte](if (anyT) 1 else 0))
      }
    case IntVec(vs) =>
      if (vs.isEmpty) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        var mn = vs(0); var mx = vs(0); var i = 1
        while (i < vs.length) {
          if (vs(i) < mn) mn = vs(i)
          if (vs(i) > mx) mx = vs(i)
          i += 1
        }
        (le(mn.toLong, 4), le(mx.toLong, 4))
      }
    case LongVec(vs) =>
      if (vs.isEmpty) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        var mn = vs(0); var mx = vs(0); var i = 1
        while (i < vs.length) {
          if (vs(i) < mn) mn = vs(i)
          if (vs(i) > mx) mx = vs(i)
          i += 1
        }
        (le(mn, 8), le(mx, 8))
      }
    // float/double follow the spec's TypeDefinedOrder writer rules
    // (parquet-format Statistics docs): NaN never lands in min/max (a
    // leading NaN would otherwise poison both via always-false compares),
    // all-NaN chunks omit the stat entirely, and signed zeros canonicalize
    // to min=-0.0 / max=+0.0 so a reader ordering -0.0 < +0.0 never prunes
    // a chunk that holds the other zero.
    case FloatVec(vs) =>
      var mn = Float.NaN; var mx = Float.NaN; var i = 0
      while (i < vs.length) {
        val v = vs(i)
        if (!v.isNaN) {
          if (mn.isNaN || v < mn) mn = v
          if (mx.isNaN || v > mx) mx = v
        }
        i += 1
      }
      if (mn.isNaN) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        if (mn == 0.0f) mn = -0.0f
        if (mx == 0.0f) mx = 0.0f
        (le(java.lang.Float.floatToIntBits(mn).toLong, 4),
          le(java.lang.Float.floatToIntBits(mx).toLong, 4))
      }
    case DoubleVec(vs) =>
      var mn = Double.NaN; var mx = Double.NaN; var i = 0
      while (i < vs.length) {
        val v = vs(i)
        if (!v.isNaN) {
          if (mn.isNaN || v < mn) mn = v
          if (mx.isNaN || v > mx) mx = v
        }
        i += 1
      }
      if (mn.isNaN) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        if (mn == 0.0) mn = -0.0
        if (mx == 0.0) mx = 0.0
        (le(java.lang.Double.doubleToLongBits(mn), 8),
          le(java.lang.Double.doubleToLongBits(mx), 8))
      }
    case v: BytesVec =>
      if (v.length == 0) (Array.emptyByteArray, Array.emptyByteArray)
      else {
        var mnI = 0
        var mxI = 0
        var i = 1
        while (i < v.length) {
          if (compareValues(v, i, v, mnI) < 0) mnI = i
          if (compareValues(v, i, v, mxI) > 0) mxI = i
          i += 1
        }
        (truncMin(v.valueBytes(mnI)), truncMax(v.valueBytes(mxI)))
      }
  }

  @inline private def le(v: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (v >>> (8 * i)).toByte; i += 1 }
    out
  }

  def leToLong(a: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < a.length) { v |= (a(i) & 0xFFL) << (8 * i); i += 1 }
    // sign-extend 4-byte stats
    if (a.length == 4) v.toInt.toLong else v
  }

  /** Unsigned lexicographic compare of two arena values. */
  private def compareValues(a: BytesVec, ai: Int, b: BytesVec, bi: Int): Int = {
    val aOff = a.start(ai); val aLen = a.len(ai)
    val bOff = b.start(bi); val bLen = b.len(bi)
    val n = math.min(aLen, bLen)
    var k = 0
    while (k < n) {
      val c = (a.data(aOff + k) & 0xFF) - (b.data(bOff + k) & 0xFF)
      if (c != 0) return c
      k += 1
    }
    aLen - bLen
  }

  /** Unsigned lexicographic compare of raw byte arrays. */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var k = 0
    while (k < n) {
      val c = (a(k) & 0xFF) - (b(k) & 0xFF)
      if (c != 0) return c
      k += 1
    }
    a.length - b.length
  }

  private def truncMin(v: Array[Byte]): Array[Byte] =
    if (v.length <= MaxByteStat) v else java.util.Arrays.copyOf(v, MaxByteStat)

  private def truncMax(v: Array[Byte]): Array[Byte] = {
    if (v.length <= MaxByteStat) return v
    val p = java.util.Arrays.copyOf(v, MaxByteStat)
    var i = MaxByteStat - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) Array.emptyByteArray // unbounded
    else {
      p(i) = (p(i) + 1).toByte
      java.util.Arrays.copyOf(p, i + 1)
    }
  }
}
