package graft.core

import org.apache.spark.sql.SparkSession
import graft.operators.EncodeJob

/** Scratch: write a small chunk table for ChunkTool smoke testing. */
object ToolSmoke {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/tool_chunks")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    EncodeJob.encode(docs, 4, Seq("lang"), Seq("doc_id"))
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
