package graft.core

/** General-purpose block compression over encoded chunk blobs — the
  * counterpart of the reference's `Codec` trait and factory
  * (`/root/reference/src/compression.rs:55-80`; SNAPPY `:83-116`, ZSTD level
  * 1 `:217-247`, LZ4 `:174-215`). Spark ships snappy-java, zstd-jni and
  * lz4-java, so no new dependencies.
  *
  * Wrapped blob layout: `'G' 'Z' u8(codecId) vlq(rawLen) compressedBytes`.
  * [[maybeUnwrap]] transparently passes through unwrapped ('G' 'C') chunk
  * blobs, so block compression composes with every chunk codec.
  */
object BlockCodec {
  val None = 0
  val Snappy = 1
  val Zstd = 2
  val Lz4 = 3
  val Gzip = 4
  val Brotli = 5

  val names: Map[Int, String] = Map(
    None -> "NONE", Snappy -> "SNAPPY", Zstd -> "ZSTD", Lz4 -> "LZ4",
    Gzip -> "GZIP", Brotli -> "BROTLI")

  def byName(name: String): Int = name.toUpperCase match {
    case "NONE" | "" => None
    case "SNAPPY" => Snappy
    case "ZSTD" => Zstd
    case "LZ4" => Lz4
    case "GZIP" => Gzip
    case "BROTLI" => Brotli
    case other => throw new IllegalArgumentException(s"unknown block codec $other")
  }

  /** GZIP via the JDK Deflater/Inflater (zlib, gzip wrapper) — the
    * reference's GZipCodec (`/root/reference/src/compression.rs:119-172`)
    * with zero new dependencies. */
  private def gzipCompress(blob: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(64, blob.length / 2))
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(blob); gz.close()
    bos.toByteArray
  }

  private def gzipDecompress(blob: Array[Byte], pos: Int, rawLen: Int): Array[Byte] = {
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(blob, pos, blob.length - pos))
    val out = new Array[Byte](rawLen)
    var off = 0
    while (off < rawLen) {
      val n = gz.read(out, off, rawLen - off)
      if (n < 0) throw new java.io.EOFException(
        s"gzip stream ended at $off of $rawLen")
      off += n
    }
    gz.close()
    out
  }

  /** Compress an encoded chunk blob. codecId None returns it unchanged. */
  def wrap(blob: Array[Byte], codecId: Int): Array[Byte] = {
    if (codecId == None) return blob
    val compressed = codecId match {
      case Snappy => org.xerial.snappy.Snappy.compress(blob)
      case Zstd => com.github.luben.zstd.Zstd.compress(blob, 1) // level 1, compression.rs:228
      case Lz4 =>
        val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
        c.compress(blob)
      case Gzip => gzipCompress(blob)
      case Brotli => graft.core.Brotli.compress(blob)
      case other => throw new IllegalArgumentException(s"unknown block codec $other")
    }
    val w = new BitWriter(compressed.length + 16)
    w.putAligned('G'.toLong, 1); w.putAligned('Z'.toLong, 1)
    w.putAligned(codecId.toLong, 1)
    w.putVlq(blob.length.toLong)
    w.putBytes(compressed)
    w.result()
  }

  /** If `blob` is block-compressed, decompress it; else return it as-is. */
  def maybeUnwrap(blob: Array[Byte]): Array[Byte] = {
    if (blob.length < 2 || blob(0) != 'G'.toByte || blob(1) != 'Z'.toByte) return blob
    val r = new BitReader(blob)
    r.getAligned(2)
    val codecId = r.getAligned(1).toInt
    val rawLen = r.getVlq().toInt
    val pos = r.position
    codecId match {
      case Snappy =>
        val out = new Array[Byte](rawLen)
        org.xerial.snappy.Snappy.uncompress(blob, pos, blob.length - pos, out, 0)
        out
      case Zstd =>
        val out = new Array[Byte](rawLen)
        com.github.luben.zstd.Zstd.decompressByteArray(out, 0, rawLen,
          blob, pos, blob.length - pos)
        out
      case Lz4 =>
        val d = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
        d.decompress(blob, pos, rawLen)
      case Gzip => gzipDecompress(blob, pos, rawLen)
      case Brotli => graft.core.Brotli.decompress(blob, pos, blob.length - pos, rawLen)
      case other => throw new IllegalArgumentException(s"unknown block codec $other")
    }
  }
}
