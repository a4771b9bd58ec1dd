package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved scan A/B: our DSv2 columnar source vs Spark's built-in
  * parquet reader over the same files (the bench's scan section, isolated
  * for fast iteration). Run: Test/runMain graft.sources.ScanAB */
object ScanAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scan-ab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = 1000000
    val path = s"/dev/shm/scanab-$rows"
    if (!new java.io.File(s"$path/_done").exists()) {
      val df = CodeTableGen.generate(spark, rows, 32).toDF()
        .withColumn("content_len", octet_length(col("content")).cast("long"))
        .withColumn("line_count",
          (size(split(col("content"), "\n", -1)) - 1).cast("long"))
      ParquetSink.write(df.repartition(32), path).count()
      new java.io.File(s"$path/_done").createNewFile()
    }
    def agg(d: org.apache.spark.sql.DataFrame): Unit =
      d.agg(sum(octet_length(col("content"))), sum(octet_length(col("path"))),
        sum(col("content_len")), sum(col("line_count")),
        count(col("repo")), count(col("commit")), count(col("lang")))
        .collect()
    val ours = spark.read.format(GraftParquetFormat.Name).load(path)
    val native = spark.read.parquet(path)
    agg(ours); agg(native) // warm
    var a = Double.MaxValue
    var b = Double.MaxValue
    (0 until 3).foreach { _ =>
      val t0 = System.nanoTime(); agg(ours)
      val t1 = System.nanoTime(); agg(native)
      val t2 = System.nanoTime()
      a = math.min(a, (t1 - t0) / 1e9)
      b = math.min(b, (t2 - t1) / 1e9)
    }
    println(f"SCANAB ours=$a%.3fs native=$b%.3fs ratio=${b / a}%.2f")
    spark.stop()
  }
}
