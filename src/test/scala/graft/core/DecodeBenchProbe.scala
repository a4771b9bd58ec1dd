package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DecodeJob, EncodeJob}
import graft.sources.CodeTableGen

/** Scratch single-thread decode profiler (not a ScalaTest suite). Encodes
  * the code table once, then times the local decode path repeatedly — run
  * under JFR to see where decode wall time goes.
  * Run: `sbt "Test/runMain graft.core.DecodeBenchProbe [cores] [rows]"` */
object DecodeBenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 1
    val rows = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/dev/shm/spark-local/pipe-input-$rows"
    if (!new java.io.File(path).exists()) {
      CodeTableGen.generate(spark, rows, 256).toDF()
        .withColumn("content_len", octet_length(col("content")))
        .withColumn("line_count", graft.functions.TextOps.lineCount(col("content")).cast("int"))
        .write.mode("overwrite").parquet(path)
    }
    val df = spark.read.parquet(path)
    val rawBytes = 2.106e9 * (rows / 1000000.0)
    val chunks = EncodeJob.encode(df, 256, Seq("repo", "lang"),
      Seq("repo", "path", "commit")).cache()
    chunks.count()
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      DecodeJob.decodeLocal(chunks, df.schema).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"decode round $r: $s%7.2fs  ${rawBytes / s / 1e9}%6.2f GB/s")
    }
    spark.stop()
  }
}
