package graft.core

import graft.sources.CodeTableGen

/** Scratch single-thread kernel profiler (not a ScalaTest suite; run via
  * `sbt "Test/runMain graft.core.KernelBench"`). */
object KernelBench {
  /** Best-of-`reps` timing — single-shot numbers on this host are dominated
    * by JIT warmup and GC pauses from earlier ops. */
  def time[A](label: String, rawBytes: Long, reps: Int = 4)(f: => A): A = {
    var best = Double.MaxValue
    var a: A = null.asInstanceOf[A]
    var r = 0
    while (r < reps) {
      val t0 = System.nanoTime()
      a = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      r += 1
    }
    println(f"$label%-34s ${best}%8.3fs  ${rawBytes / best / 1e6}%10.1f MB/s")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = 16384
    val rows = (0 until n).map(i => CodeTableGen.genRow(42L, i.toLong, 1024, 1536))
    val content = BytesVec.of(rows.map(_.content.getBytes("UTF-8")).toArray)
    val path = BytesVec.of(rows.map(_.path.getBytes("UTF-8")).toArray)
    val commit = BytesVec.of(rows.map(_.commit.getBytes("UTF-8")).toArray)
    val lang = BytesVec.of(rows.map(_.lang.getBytes("UTF-8")).toArray)
    val repo = BytesVec.of(rows.map(_.repo.getBytes("UTF-8")).toArray)
    val lens = IntVec(rows.map(_.content.length).toArray)

    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("stats content", content.rawSize)(ChunkStats.compute(content))
      time("plain content", content.rawSize)(ChunkCodec.encodeWith(content, CodecId.Plain))
      time("dictRef content", content.rawSize)(ChunkCodec.encodeWith(content, CodecId.Dict))
      time("fsst content", content.rawSize)(ChunkCodec.encodeWith(content, CodecId.Fsst))
      time("deltaByte content", content.rawSize)(ChunkCodec.encodeWith(content, CodecId.DeltaByteArray))
      time("deltaLen content", content.rawSize)(ChunkCodec.encodeWith(content, CodecId.DeltaLengthByteArray))
      time("AUTO content", content.rawSize)(ChunkCodec.encodeAuto(content))
      time("AUTO path", path.rawSize)(ChunkCodec.encodeAuto(path))
      time("AUTO commit", commit.rawSize)(ChunkCodec.encodeAuto(commit))
      time("AUTO lang", lang.rawSize)(ChunkCodec.encodeAuto(lang))
      time("AUTO repo", repo.rawSize)(ChunkCodec.encodeAuto(repo))
      time("AUTO lens", lens.rawSize)(ChunkCodec.encodeAuto(lens))
      time("train content", content.rawSize)(FsstCodec.trainChunk(content))
      time("train path", path.rawSize)(FsstCodec.trainChunk(path))
      time("train commit", commit.rawSize)(FsstCodec.trainChunk(commit))
      val blob = ChunkCodec.encodeAuto(content).blob
      val fsstBlob = ChunkCodec.encodeWith(content, CodecId.Fsst)
      println(f"  fsst content ratio ${fsstBlob.length.toDouble / content.rawSize}%.4f")
      Seq("content" -> content, "path" -> path, "commit" -> commit,
        "lang" -> lang, "repo" -> repo).foreach { case (nm, v) =>
        val e = ChunkCodec.encodeAuto(v)
        println(f"  AUTO $nm%-8s codec=${e.codecId} ratio ${e.blob.length.toDouble / v.rawSize}%.4f")
      }
      time("decode content", content.rawSize)(ChunkCodec.decode(blob))
      // bit-unpack-bound decode paths: dict id streams (RLE/bit-packed
      // getBatch) and delta miniblocks
      val dictBlob = ChunkCodec.encodeWith(path, CodecId.Dict)
      time("decode path dict", path.rawSize)(ChunkCodec.decode(dictBlob))
      val deltaBlob = ChunkCodec.encodeWith(lens, CodecId.DeltaBinaryPacked)
      time("decode lens delta", lens.rawSize)(ChunkCodec.decode(deltaBlob))
    }
  }
}
