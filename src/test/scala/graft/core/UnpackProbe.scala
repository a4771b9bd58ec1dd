package graft.core

/** Micro-probe for the batch bit-unpacker: RLE-hybrid id decode + delta
  * decode throughput (the paths the word-load getBatch accelerates). */
object UnpackProbe {
  def main(args: Array[String]): Unit = {
    val n = 4 << 20
    val rnd = new scala.util.Random(7)
    // low-run data so the hybrid stays in bit-packed mode (worst case)
    val ids = Array.fill(n)(rnd.nextInt(4096).toLong)
    val enc = new RleHybridEncoder(12)
    ids.foreach(enc.put)
    val bytes = enc.result()
    val out = new Array[Long](n)
    (1 to 2).foreach { round =>
      var best = Double.MaxValue
      (0 until 5).foreach { _ =>
        val t0 = System.nanoTime()
        val dec = new RleHybridDecoder(12, bytes, 0, bytes.length)
        dec.get(out, 0, n)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"round $round rle-hybrid w12 unpack: ${n / best / 1e6}%8.1f Mvals/s")
    }
    // delta: monotone-ish ints
    val vals = IntVec(Array.tabulate(n)(i => i * 3 + rnd.nextInt(5)))
    val blob = ChunkCodec.encodeWith(vals, CodecId.DeltaBinaryPacked)
    (1 to 2).foreach { round =>
      var best = Double.MaxValue
      (0 until 5).foreach { _ =>
        val t0 = System.nanoTime()
        ChunkCodec.decode(blob)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"round $round delta-i32 decode:     ${n / best / 1e6}%8.1f Mvals/s")
    }
  }
}
