package graft.core

import graft.sources.CodeTableGen

/** Scratch: pure-JVM codec thread scaling — N threads each encodeAuto-ing
  * their own 16k-row content chunk, 8 vs 32 threads. */
object CodecScale {
  def main(args: Array[String]): Unit = {
    val n = 16384
    def chunk(seed: Int): BytesVec = BytesVec.of(
      (0 until n).map(i => CodeTableGen.genRow(seed.toLong, i.toLong, 1024, 1536)
        .content.getBytes("UTF-8")).toArray)
    val proto = chunk(0)
    val raw = proto.rawSize
    // warm
    ChunkCodec.encodeAuto(proto)
    (0 until 2).foreach { round =>
      Seq(1, 8, 32).foreach { threads =>
        val chunks = (0 until threads).map(t => chunk(t)).toArray
        val ts = (0 until threads).map { t =>
          new Thread(() => { ChunkCodec.encodeAuto(chunks(t)); () })
        }
        val t0 = System.nanoTime()
        ts.foreach(_.start())
        ts.foreach(_.join())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[codec] threads=$threads time=$dt%.2fs aggregate=${threads * raw / dt / 1e6}%.0f MB/s")
      }
    }
  }
}
