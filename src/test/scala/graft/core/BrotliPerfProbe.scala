package graft.core
import org.scalatest.funsuite.AnyFunSuite

class BrotliPerfProbe extends AnyFunSuite {
  test("brotli throughput probe") {
    // ~64 MB of varied synthetic source text: seeded word soup with
    // identifiers, so LZ matches are short-range and realistic
    val words = Array("val", "def", "class", "import", "return", "match",
      "case", "object", "extends", "private", "override", "spark", "column",
      "partition", "encode", "decode", "buffer", "offset", "length", "assert")
    val r = new scala.util.Random(42)
    val sb = new java.lang.StringBuilder(70 << 20)
    while (sb.length < (64 << 20)) {
      sb.append(words(r.nextInt(words.length)))
      if (r.nextInt(4) == 0) { sb.append('_'); sb.append(r.nextInt(10000)) }
      sb.append(if (r.nextInt(12) == 0) '\n' else ' ')
    }
    val raw = sb.toString.getBytes("UTF-8")
    var enc = Brotli.compress(raw)
    var dec = Brotli.decompress(enc, raw.length)
    assert(java.util.Arrays.equals(dec, raw))
    def best(n: Int)(f: => Unit): Double = {
      var b = Double.MaxValue
      (0 until n).foreach { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        if (dt < b) b = dt
      }
      b
    }
    val te = best(3) { enc = Brotli.compress(raw) }
    val td = best(3) { dec = Brotli.decompress(enc, raw.length) }
    info(f"raw=${raw.length / 1e6}%.1f MB enc=${enc.length / 1e6}%.1f MB ratio=${enc.length.toDouble / raw.length}%.4f")
    info(f"encode ${raw.length / te / 1e6}%.1f MB/s  decode ${raw.length / td / 1e6}%.1f MB/s")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/brotli_perf.raw"), raw)
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/brotli_perf.ours.br"), enc)
    // decode google-brotli q1 stream of the same corpus if present (2nd pass)
    val g = java.nio.file.Paths.get("/tmp/brotli_perf.google_q1.br")
    if (java.nio.file.Files.exists(g)) {
      val gb = java.nio.file.Files.readAllBytes(g)
      var out: Array[Byte] = null
      val tg = best(3) { out = Brotli.decompress(gb, raw.length) }
      assert(java.util.Arrays.equals(out, raw))
      info(f"decode of google q1 stream (${gb.length / 1e6}%.1f MB): ${raw.length / tg / 1e6}%.1f MB/s")
    }
  }
}
