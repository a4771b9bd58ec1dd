package graft.core

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Scratch: dump the ngram-jaccard physical plan (AQE off, broadcast off). */
object PlanDumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val plan = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), n = 3, threshold = 0.4)
      .queryExecution.executedPlan.toString
    println(plan)
    spark.stop()
  }
}
