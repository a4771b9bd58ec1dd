package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EncodeJob

/** Scratch: decompose the benchmark's per-level time at one core count.
  * args: cores, inputPath */
object HiProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val inputPath = args(1)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(inputPath)
    def t(label: String)(f: => Unit): Unit = (0 until 3).foreach { r =>
      val t0 = System.nanoTime()
      f
      println(f"[hi] cores=$cores $label rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    t("scan-count")(df.count())
    t("scan-fullread") {
      df.agg(sum(octet_length(col("content"))), sum(octet_length(col("path")))).collect()
    }
    t("shuffle-sort-noop") {
      df.repartition(256, col("repo"), col("lang"))
        .sortWithinPartitions("repo", "path", "commit")
        .write.format("noop").mode("overwrite").save()
    }
    t("full-encode") {
      EncodeJob.encode(df, 256, Seq("repo", "lang"), Seq("repo", "path", "commit"))
        .toDF().agg(sum("rawBytes")).collect()
    }
    spark.stop()
  }
}
