package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DecodeJob, EncodeJob}
import graft.sources.CodeTableGen

/** Ad-hoc decode-throughput probe for same-window jar A/Bs (the decode
  * section of Bench needs the whole 15-minute run; this isolates it).
  * Drives whatever main jar is on the classpath, like [[QueryTimer]].
  *
  * Usage: spark-submit --class graft.DecodeProbe <testsJar+mainJar> [rows]
  */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 500000L
    val spark = SparkSession.builder().appName("graft-decode-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = CodeTableGen.generate(spark, rows, 64).toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count",
        graft.functions.TextOps.lineCount(col("content")).cast("int"))
    val chunks = EncodeJob.encode(df, 64,
      Seq("repo", "lang"), Seq("repo", "path", "commit")).cache()
    val raw = chunks.toDF().agg(sum("rawBytes")).collect()(0).getLong(0)
    chunks.count()
    (0 until 5).foreach { i =>
      val t0 = System.nanoTime()
      DecodeJob.decodeLocal(chunks, df.schema).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"DP rep$i ${raw / s / 1e9}%.3f GB/s ($s%.2f s, raw $raw)")
    }
    spark.stop()
  }
}
