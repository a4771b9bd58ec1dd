package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EncodeJob
import graft.sources.CodeTableGen

/** Scratch encode-pipeline decomposition (not a ScalaTest suite; run via
  * `sbt "Test/runMain graft.core.PipelineBench [cores] [rows]"`). Times the
  * cumulative stages of the encode job on the same input the Bench main
  * uses, so "where does the wall time go" is measured, not guessed:
  *   scan            - parquet scan + count only
  *   shuffle+sort    - scan + salted repartition + sortWithinPartitions,
  *                     consumed by a row-size sum (forces full rows)
  *   buffer+hash     - the above + ColBuilder buffering, sha256 manifests,
  *                     min/max stats, PLAIN encode (forcedCodecs)
  *   full            - the real auto-selecting encode
  */
object PipelineBench {
  private def time(label: String, reps: Int = 2)(f: => Unit): Unit = {
    var best = Double.MaxValue
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"$label%-14s $best%8.2fs")
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 1
    val rows = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      // shuffle compression measured both ways (see Bench.session): off is
      // faster single-thread, ~20% slower at local[32]; keep the default
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
    val allCols = df.schema.fieldNames.toSeq
    val plainAll = allCols.map(_ -> CodecId.Plain).toMap

    // warm JIT/codegen on a slice, excluded from timing
    EncodeJob.encode(df.limit(2000), 8, Seq("repo", "lang"),
      Seq("repo", "path", "commit")).toDF().count()

    time("scan")(df.agg(sum(octet_length(col("content")))).collect())
    time("shuffle+sort") {
      df.repartition(256, col("repo"), col("lang"),
          pmod(xxhash64(allCols.map(col): _*), lit(16)))
        .sortWithinPartitions(col("repo"), col("path"), col("commit"))
        .agg(sum(octet_length(col("content")))).collect()
    }
    time("buffer+hash") {
      EncodeJob.encode(df, 256, Seq("repo", "lang"),
          Seq("repo", "path", "commit"), forcedCodecs = plainAll)
        .toDF().agg(sum("encodedBytes")).collect()
    }
    time("full") {
      EncodeJob.encode(df, 256, Seq("repo", "lang"),
          Seq("repo", "path", "commit"))
        .toDF().agg(sum("encodedBytes")).collect()
    }
    spark.stop()
  }
}
