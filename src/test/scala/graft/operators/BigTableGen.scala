package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.CodeTableGen

/** Scratch: write the N-row synthetic source-code table as snappy parquet
  * (the 21 GB EncodeMain measurement input). Not a ScalaTest.
  * `spark-submit --class graft.operators.BigTableGen tests.jar 10000000 /dev/shm/big-input` */
object BigTableGen {
  def main(args: Array[String]): Unit = {
    val rows = args(0).toLong
    val path = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CodeTableGen.generate(spark, rows, 256).toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count",
        graft.functions.TextOps.lineCount(col("content")).cast("int"))
      .write.mode("overwrite").parquet(path)
    spark.stop()
  }
}
