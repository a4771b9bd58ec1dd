package graft.core
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EncodeJob
import graft.sources.CodeTableGen
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = CodeTableGen.generate(spark, 100000L, 16).toDF()
    val t0 = System.nanoTime()
    val chunks = EncodeJob.encode(df, 32, Seq("repo","lang"), Seq("repo","path","commit"))
    val lin = EncodeJob.lineage(chunks).toDF()
      .groupBy(col("column")).agg(
        concat_ws("+", array_sort(collect_set(col("codecs")))).as("codecs"),
        sum(col("inputBytes")).as("in"), sum(col("outputBytes")).as("out"))
      .orderBy("column").collect()
    val secs = (System.nanoTime()-t0)/1e9
    lin.foreach(r => println(f"${r.getString(0)}%-14s ${r.getString(1)}%-40s in=${r.getLong(2)} out=${r.getLong(3)}"))
    println(f"encode secs: $secs%.2f")
    spark.stop()
  }
}
