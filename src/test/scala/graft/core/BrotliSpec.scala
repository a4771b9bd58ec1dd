package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Brotli (RFC 7932) codec spec — the reference's BrotliCodec
  * (/root/reference/src/compression.rs:141-172) realized from scratch.
  *
  * External anchor: the `.br` fixtures under src/test/resources/brotli were
  * produced by pyarrow's bundled google/brotli encoder
  * (`pyarrow.Codec('brotli', compression_level=q)`) at qualities 1/5/9/11 —
  * q1 is what parquet writers actually emit (the reference pins quality 1,
  * compression.rs:160), q11 exercises static-dictionary references, word
  * transforms, context modeling, and block switching. Decoding all of them
  * value-exactly is the interop proof for third-party brotli parquet pages.
  */
class BrotliSpec extends AnyFunSuite {

  private val fixtures =
    Seq("empty", "one", "four", "short_rep", "doc_small", "docs", "english",
      "utf8", "random", "runs")
  private val qualities = Seq(1, 5, 9, 11)

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes pyarrow/google-brotli streams at q1/q5/q9/q11 value-exactly") {
    for (f <- fixtures; q <- qualities) {
      val raw = res(s"$f.raw")
      val br = res(s"$f.q$q.br")
      val gotKnown = Brotli.decompress(br, raw.length)
      assert(java.util.Arrays.equals(gotKnown, raw), s"$f q$q (known size)")
      val gotUnknown = Brotli.decompress(br)
      assert(java.util.Arrays.equals(gotUnknown, raw), s"$f q$q (grown)")
    }
  }

  test("own-encoder roundtrip over every fixture") {
    for (f <- fixtures) {
      val raw = res(s"$f.raw")
      val enc = Brotli.compress(raw)
      val dec = Brotli.decompress(enc, raw.length)
      assert(java.util.Arrays.equals(dec, raw), s"$f roundtrip")
      // compressible text must actually compress; incompressible input must
      // stay near raw (uncompressed-metablock fallback, not blowup)
      if (f == "docs" || f == "english" || f == "runs")
        assert(enc.length < raw.length / 2, s"$f ratio ${enc.length}/${raw.length}")
      assert(enc.length <= raw.length + 64, s"$f expansion ${enc.length}")
    }
  }

  test("seeded roundtrips across sizes and byte distributions") {
    val r = new Random(7)
    val sizes = Seq(0, 1, 2, 7, 63, 64, 65, 1000, 4096, 70000, 1 << 20)
    def uniform(n: Int) = { val a = new Array[Byte](n); r.nextBytes(a); a }
    def lowEntropy(n: Int) = Array.fill(n)((r.nextInt(4) + 'a').toByte)
    def runs(n: Int) = {
      val a = new Array[Byte](n); var i = 0
      while (i < n) {
        val len = math.min(n - i, 1 + r.nextInt(200)); val v = r.nextInt(256).toByte
        java.util.Arrays.fill(a, i, i + len, v); i += len
      }
      a
    }
    def textish(n: Int) = {
      val words = Seq("scan", "merge", "window", "the", "batch", "columnar", "of")
      val sb = new StringBuilder
      while (sb.length < n) { sb.append(words(r.nextInt(words.length))); sb.append(' ') }
      sb.toString.take(n).getBytes("UTF-8")
    }
    for (n <- sizes; (kind, gen) <- Seq[(String, Int => Array[Byte])](
        ("uniform", uniform), ("lowent", lowEntropy), ("runs", runs), ("text", textish))) {
      val raw = gen(n)
      val dec = Brotli.decompress(Brotli.compress(raw), raw.length)
      assert(java.util.Arrays.equals(dec, raw), s"$kind n=$n")
    }
  }

  test("crosses the 4 MiB metablock boundary") {
    val r = new Random(11)
    val n = (4 << 20) + 12345
    val raw = new Array[Byte](n)
    var i = 0
    while (i < n) { raw(i) = (((i * 2654435761L) >>> 24) & 0x3f).toByte; i += 1 }
    val enc = Brotli.compress(raw)
    assert(java.util.Arrays.equals(Brotli.decompress(enc, n), raw))
    // and an incompressible one (uncompressed metablocks) over the boundary
    val rnd = new Array[Byte](n); r.nextBytes(rnd)
    val enc2 = Brotli.compress(rnd)
    assert(java.util.Arrays.equals(Brotli.decompress(enc2, n), rnd))
  }

  test("compressed metablock followed by uncompressed metablock") {
    // regression: the bulk bit refill parks a preview of the next byte's low
    // bits above cnt; readBytes must not leave that preview behind once the
    // read position moves past the previewed byte, or the first metablock
    // after an uncompressed one decodes corrupt. Needs a stream whose
    // uncompressed block FOLLOWS a compressed one (all-uncompressed streams
    // never pollute the accumulator).
    val r = new Random(13)
    val n = (4 << 20) + (1 << 20)
    val raw = new Array[Byte](n)
    var i = 0
    while (i < (4 << 20)) { raw(i) = ('a' + (i % 7)).toByte; i += 1 } // compresses
    val tail = new Array[Byte](1 << 20); r.nextBytes(tail) // doesn't
    System.arraycopy(tail, 0, raw, 4 << 20, tail.length)
    val enc = Brotli.compress(raw)
    assert(java.util.Arrays.equals(Brotli.decompress(enc, n), raw))
    // and the reverse order in one stream: incompressible then compressible
    val raw2 = new Array[Byte](n)
    System.arraycopy(tail, 0, raw2, 0, tail.length)
    r.nextBytes(tail); System.arraycopy(tail, 0, raw2, 1 << 20, tail.length)
    r.nextBytes(tail); System.arraycopy(tail, 0, raw2, 2 << 20, tail.length)
    r.nextBytes(tail); System.arraycopy(tail, 0, raw2, 3 << 20, tail.length)
    i = 4 << 20
    while (i < n) { raw2(i) = ('a' + (i % 7)).toByte; i += 1 }
    val enc2 = Brotli.compress(raw2)
    assert(java.util.Arrays.equals(Brotli.decompress(enc2, n), raw2))
    // the sharp trigger: compressed (pollutes the accumulator with preview
    // bits) -> uncompressed (drains it and moves pos) -> compressed again
    // (misreads its header if the stale preview survived). A trailing-only
    // uncompressed block can't catch it: the final empty metablock is all
    // 1-bits and OR-corruption never clears bits.
    val n3 = (9 << 20)
    val raw3 = new Array[Byte](n3)
    i = 0
    while (i < (4 << 20)) { raw3(i) = ('a' + (i % 7)).toByte; i += 1 }
    val mid = new Array[Byte](4 << 20); r.nextBytes(mid)
    System.arraycopy(mid, 0, raw3, 4 << 20, mid.length)
    i = 8 << 20
    while (i < n3) { raw3(i) = ('k' + (i % 5)).toByte; i += 1 }
    val enc3 = Brotli.compress(raw3)
    assert(java.util.Arrays.equals(Brotli.decompress(enc3, n3), raw3))
    // google/brotli q1 over alternating text/random content interleaves
    // compressed and uncompressed metablocks freely — the third-party shape
    // that exercises the accumulator across every block-kind transition
    val mraw = res("mixed.raw")
    val mbr = res("mixed.q1.br")
    assert(java.util.Arrays.equals(Brotli.decompress(mbr, mraw.length), mraw))
  }

  test("truncated and corrupted streams fail cleanly, never hang") {
    val br = res("docs.q5.br")
    val raw = res("docs.raw")
    val r = new Random(3)
    for (cut <- Seq(0, 1, 2, br.length / 4, br.length / 2, br.length - 1)) {
      val t = java.util.Arrays.copyOf(br, cut)
      intercept[Exception](Brotli.decompress(t, raw.length))
    }
    var i = 0
    while (i < 200) {
      val mut = br.clone()
      mut(r.nextInt(mut.length)) = (mut(r.nextInt(mut.length)) ^ (1 << r.nextInt(8))).toByte
      // corruption must surface as an exception or a wrong payload — bounded
      // either way (no OOM from hostile lengths, no infinite loop)
      try {
        val got = Brotli.decompress(mut, raw.length)
        assert(got.length == raw.length)
      } catch { case _: Exception => () }
      i += 1
    }
  }

  test("declared-size mismatch is rejected") {
    val br = res("english.q1.br")
    val raw = res("english.raw")
    intercept[Exception](Brotli.decompress(br, raw.length - 1))
    // too-large declared size must also fail (stream ends early), not pad
    val got = try Brotli.decompress(br, raw.length + 10) catch {
      case _: Exception => null
    }
    assert(got == null || !java.util.Arrays.equals(got, raw))
  }

  test("BlockCodec BROTLI id roundtrips a chunk blob") {
    val r = new Random(5)
    val blob = new Array[Byte](50000)
    r.nextBytes(blob)
    java.util.Arrays.fill(blob, 10000, 40000, 'z'.toByte)
    val wrapped = BlockCodec.wrap(blob, BlockCodec.Brotli)
    assert(java.util.Arrays.equals(BlockCodec.maybeUnwrap(wrapped), blob))
    assert(BlockCodec.byName("brotli") == BlockCodec.Brotli)
    assert(BlockCodec.names(BlockCodec.Brotli) == "BROTLI")
  }
}
