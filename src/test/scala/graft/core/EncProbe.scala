package graft.core
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EncodeJob
import graft.sources.CodeTableGen
object EncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/dev/shm/encprobe-input"
    CodeTableGen.generate(spark, 500000L, 256).toDF()
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      val agg = EncodeJob.encode(df, 256, Seq("repo","lang"), Seq("repo","path","commit"))
        .toDF().agg(sum("rawBytes")).collect()(0)
      val secs = (System.nanoTime()-t0)/1e9
      println(f"rep$rep: ${agg.getLong(0)/secs/1e9}%.4f GB/s ($secs%.2f s)")
      rep += 1
    }
    spark.stop()
  }
}
