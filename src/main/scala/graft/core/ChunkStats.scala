package graft.core

/** Sampled per-chunk column statistics that drive codec selection
  * (the north rule's "cardinality, run-length histogram, string entropy"
  * sampling; generalizes the reference's dict-size-only policy at
  * `/root/reference/src/column/writer.rs:393-416`). */
final case class ColumnStats(
    numValues: Long,
    rawSize: Long,
    /** exact distinct count, capped at [[ChunkStats.DistinctCap]] */
    distinct: Int,
    distinctCapped: Boolean,
    /** PLAIN-encoded size of the distinct values seen (dict page estimate) */
    distinctRawSize: Long,
    /** number of runs of equal adjacent values */
    runs: Long,
    /** fraction of adjacent pairs that are non-decreasing */
    sortedness: Double,
    /** strings: average fraction of each value shared as prefix with its
      * predecessor (front-coding benefit) */
    avgPrefixShare: Double,
    /** strings: sampled Shannon entropy of bytes, in bits/byte */
    entropyBitsPerByte: Double,
    minValue: Long, // ints only (else 0)
    maxValue: Long,
) {
  def distinctRatio: Double =
    if (numValues == 0) 0.0 else distinct.toDouble / numValues
}

object ChunkStats {
  val DistinctCap = 65536

  def compute(vec: ColVec): ColumnStats = vec match {
    case BoolVec(vs) =>
      var runs = if (vs.isEmpty) 0L else 1L
      var i = 1
      while (i < vs.length) { if (vs(i) != vs(i - 1)) runs += 1; i += 1 }
      ColumnStats(vs.length, vec.rawSize, math.min(2, vs.length), distinctCapped = false,
        distinctRawSize = 1, runs = runs, sortedness = 0, avgPrefixShare = 0,
        entropyBitsPerByte = 1, 0, 0)
    case IntVec(vs) => longStats(vec, vs.length, i => vs(i).toLong, 4)
    case LongVec(vs) => longStats(vec, vs.length, i => vs(i), 8)
    case FloatVec(vs) => longStats(vec, vs.length,
      i => java.lang.Float.floatToRawIntBits(vs(i)).toLong, 4)
    case DoubleVec(vs) => longStats(vec, vs.length,
      i => java.lang.Double.doubleToRawLongBits(vs(i)), 8)
    case v: BytesVec => bytesStats(v)
  }

  private def longStats(vec: ColVec, n: Int, at: Int => Long, width: Int): ColumnStats = {
    val seen = new java.util.HashSet[java.lang.Long]()
    var runs = if (n == 0) 0L else 1L
    var nondec = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var capped = false
    var i = 0
    var prev = 0L // carried across iterations — at(i) may convert float bits
    while (i < n) {
      val v = at(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      if (!capped) {
        seen.add(java.lang.Long.valueOf(v))
        if (seen.size >= DistinctCap) capped = true
      }
      if (i > 0) {
        if (v != prev) runs += 1
        if (v >= prev) nondec += 1
      }
      prev = v
      i += 1
    }
    ColumnStats(n, vec.rawSize, seen.size, capped, seen.size.toLong * width, runs,
      if (n > 1) nondec.toDouble / (n - 1) else 1.0, 0.0, 0.0,
      if (n == 0) 0 else mn, if (n == 0) 0 else mx)
  }

  private def bytesStats(vec: BytesVec): ColumnStats = {
    val n = vec.length
    val data = vec.data
    val seen = new java.util.HashSet[Int]() // distinct via hash (estimate)
    var distinctRaw = 0L
    var runs = if (n == 0) 0L else 1L
    var nondec = 0L
    var prefixShareSum = 0.0
    var capped = false
    // byte histogram over a bounded sample for entropy
    val hist = new Array[Long](256)
    var histBytes = 0L
    val HistLimit = 1L << 16
    var i = 0
    while (i < n) {
      val off = vec.start(i)
      val len = vec.len(i)
      if (!capped) {
        // hash a bounded window + the length: exact for short values (the
        // only dict-viable ones — a 1 MiB dict page holds no long-string
        // column anyway), one bounded read for long ones. For len > 64 the
        // window is head(64) + middle(16) + tail(32): fixed-width templated
        // records and padded log lines share 64-byte prefixes AND lengths,
        // so a prefix-only hash collapsed their distinct count to ~1
        // (round-2 advice) — the tail/middle samples keep them apart.
        var h = 1 + len * 31
        var k = off
        val end = off + math.min(len, 64)
        while (k < end) { h = 31 * h + data(k); k += 1 }
        if (len > 64) {
          val midStart = off + len / 2
          val midEnd = midStart + math.min(16, len - len / 2)
          k = midStart
          while (k < midEnd) { h = 31 * h + data(k); k += 1 }
          val tailStart = off + len - math.min(32, len - 64)
          k = math.max(tailStart, midEnd)
          val tailEnd = off + len
          while (k < tailEnd) { h = 31 * h + data(k); k += 1 }
        }
        if (seen.add(h)) distinctRaw += 4L + len
        if (seen.size >= DistinctCap) capped = true
      }
      if (histBytes < HistLimit) {
        val take = math.min(len.toLong, HistLimit - histBytes).toInt
        var k = 0
        while (k < take) { hist(data(off + k) & 0xFF) += 1; k += 1 }
        histBytes += take
      }
      if (i > 0) {
        val pOff = vec.start(i - 1)
        val pLen = vec.len(i - 1)
        val maxLen = math.min(pLen, len)
        var m = 0
        while (m < maxLen && data(pOff + m) == data(off + m)) m += 1
        // lexicographic compare via first mismatch
        val cmp =
          if (m < maxLen) (data(pOff + m) & 0xFF) - (data(off + m) & 0xFF)
          else pLen - len
        if (cmp != 0) runs += 1
        if (cmp <= 0) nondec += 1
        prefixShareSum += (if (len == 0) 1.0 else m.toDouble / len)
      }
      i += 1
    }
    var entropy = 0.0
    if (histBytes > 0) {
      var b = 0
      while (b < 256) {
        if (hist(b) > 0) {
          val p = hist(b).toDouble / histBytes
          entropy -= p * (math.log(p) / math.log(2.0))
        }
        b += 1
      }
    }
    ColumnStats(n, vec.rawSize, seen.size, capped, distinctRaw, runs,
      if (n > 1) nondec.toDouble / (n - 1) else 1.0,
      if (n > 1) prefixShareSum / (n - 1) else 0.0,
      entropy, 0, 0)
  }
}
