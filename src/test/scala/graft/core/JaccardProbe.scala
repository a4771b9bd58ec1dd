package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Scratch probe (not a ScalaTest suite): sizes the stages of the exact
  * n-gram Jaccard join at a given sf dir — documents, shingles, exploded
  * prefix rows, candidate pairs before/after dedup, verified pairs — so
  * "is the candidate join or the verify join the cost" is measured.
  * Run: `sbt "Test/runMain graft.core.JaccardProbe /root/testdata/sf0.1"` */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def lap(l: String): Unit =
      println(f"[+${(System.nanoTime() - t0) / 1e9}%6.1fs] $l")

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val threshold = 0.4
    val withSh = d.select(col("lang"), col("doc_id").as("__key"),
        array_sort(transform(TextOps.wordShingles(col("text"), 3),
          x => xxhash64(x))).as("__sh"))
      .withColumn("__n", size(col("__sh")))
      .withColumn("__plen",
        (col("__n") - ceil(col("__n") * threshold) + 1).cast("int"))
      .cache()
    val nDocs = withSh.count()
    val shingleStats = withSh.agg(sum("__n"), avg("__n"), sum("__plen")).collect()(0)
    lap(s"docs=$nDocs shingles=${shingleStats.get(0)} avg=${shingleStats.get(1)} prefixRows=${shingleStats.get(2)}")

    val a = withSh.select(col("lang"), col("__key").as("keyA"),
      col("__n").as("nA"),
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p"))
    val b = withSh.select(col("lang"), col("__key").as("keyB"),
      col("__n").as("nB"),
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p"))
    val rawCand = a.join(b, Seq("lang", "__p"))
      .where(col("keyA") < col("keyB") &&
        col("nA") >= col("nB") * threshold && col("nB") >= col("nA") * threshold)
      .count()
    lap(s"raw candidate matches=$rawCand")
    val dedupCand = a.join(b, Seq("lang", "__p"))
      .where(col("keyA") < col("keyB") &&
        col("nA") >= col("nB") * threshold && col("nB") >= col("nA") * threshold)
      .select("lang", "keyA", "keyB").dropDuplicates("lang", "keyA", "keyB")
      .cache()
    val nCand = dedupCand.count()
    lap(s"deduped candidate pairs=$nCand")
    val verified = dedupCand
      .join(withSh.select(col("lang"), col("__key").as("keyA"),
        col("__sh").as("shA"), col("__n").as("nA")), Seq("lang", "keyA"))
      .join(withSh.select(col("lang"), col("__key").as("keyB"),
        col("__sh").as("shB"), col("__n").as("nB")), Seq("lang", "keyB"))
      .withColumn("__i", size(array_intersect(col("shA"), col("shB"))))
      .where(col("__i").cast("double") /
        (col("nA") + col("nB") - col("__i")).cast("double") >= threshold)
      .count()
    lap(s"verified pairs=$verified")
    // frequency skew of prefix tokens: how hot are the hottest join keys?
    val hot = a.groupBy("lang", "__p").count()
      .orderBy(desc("count")).limit(10).collect()
    hot.foreach(r => println(s"  hot prefix token: lang=${r.get(0)} count=${r.get(2)}"))
    spark.stop()
  }
}
