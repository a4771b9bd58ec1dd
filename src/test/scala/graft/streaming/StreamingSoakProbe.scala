package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ChunkRow, DecodeJob, Verifier}

/** Streaming-encode soak driver for the 21 GB kill-and-resume drill: the
  * big-input parquet table rides `readStream` (file source, bounded
  * files-per-trigger) through [[StreamingEncode]]'s chunk sink; an
  * external SIGKILL mid-stream plus a rerun of the same command proves
  * checkpoint replay + idempotent batch paths at scale, and `--verify`
  * decodes every chunk back and sha256-compares all non-key columns
  * against the source (plus an exactly-once row count). Not a ScalaTest —
  * the kill comes from outside:
  *
  * {{{
  * spark-submit --class graft.streaming.StreamingSoakProbe tests.jar \
  *   /dev/shm/big-input /dev/shm/stream-out          # encode (kill this)
  * ... same command again                            # restart, completes
  * ... same + --verify                               # bit-identity gate
  * }}}
  */
object StreamingSoakProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val verify = args.contains("--verify")
    val spark = SparkSession.builder().appName("graft-streaming-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val source = spark.read.parquet(src)
    if (!verify) {
      val t0 = System.nanoTime()
      val q = StreamingEncode.start(
        spark.readStream.schema(source.schema)
          .option("maxFilesPerTrigger", "32").parquet(src),
        out, numPartitions = 32,
        partitionKeys = Seq("repo", "lang"),
        sortKeys = Seq("repo", "path", "commit"))
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val agg = spark.read.parquet(s"$out/lineage")
        .agg(sum("inputBytes"), sum("outputBytes")).collect()(0)
      println(f"STREAMSOAK encoded raw=${agg.getLong(0)} " +
        f"enc=${agg.getLong(1)} in $secs%.1f s " +
        f"(${agg.getLong(0) / secs / 1e9}%.3f GB/s)")
    } else {
      val chunks = spark.read.parquet(s"$out/chunks").as[ChunkRow]
      val decoded = DecodeJob.decode(chunks, source.schema)
      val nSrc = source.count()
      val nDec = decoded.count()
      var bad = 0L
      Verifier.verifyAll(source, decoded, Seq("repo", "path", "commit"),
        source.schema.fieldNames.filterNot(
          Seq("repo", "path", "commit").contains).toSeq).foreach {
        case (c, (ns, nd, mismatched)) =>
          println(s"STREAMSOAK verify $c: source=$ns decoded=$nd " +
            s"mismatched=$mismatched")
          bad += mismatched
      }
      println(s"STREAMSOAK rows source=$nSrc decoded=$nDec " +
        s"exactlyOnce=${nSrc == nDec} mismatches=$bad")
      if (bad > 0 || nSrc != nDec) sys.exit(1)
    }
    spark.stop()
  }
}
