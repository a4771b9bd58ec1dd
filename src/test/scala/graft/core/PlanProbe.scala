package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.TextOps

/** Scratch: dump formatted plans of key operators for plan-quality review. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    println("=== scan pruning: token count reads only (lang, text)")
    docs.groupBy("lang").agg(sum(TextOps.wsTokenCount(col("text"))))
      .explain("formatted")

    println("=== filter pushdown: quality filter reaches the scan")
    docs.where(col("n_chars") > 500).select("doc_id", "lang")
      .explain("formatted")

    println("=== minhash lsh: join shape")
    Dedup.minhashLsh(docs, "doc_id", "text", 16, 4, 0.5).explain("formatted")

    println("=== decodeWhere: broadcast semi-join on chunk metadata")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
      .repartitionByRange(4, col("l_orderkey"))
    val chunks = EncodeJob.encode(li, 0, Seq.empty, Seq("l_orderkey"))
    DecodeJob.decodeWhere(chunks, li.schema, "l_orderkey", 100L, 500L)
      .explain("formatted")
    spark.stop()
  }
}
