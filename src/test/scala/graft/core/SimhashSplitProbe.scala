package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not a ScalaTest suite): splits q_simhash's wall time into
  * its three phases — simhash computation, blocked pairs, brute-force twin —
  * so blocking-scheme changes are measured against the part they can move.
  * Run: `sbt "Test/runMain graft.core.SimhashSplitProbe /root/testdata/sf0.1"` */
object SimhashSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue; var n = 0L
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-24s $best%7.2fs  n=$n")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val withSim = graft.operators.Dedup.simhash(d, "text")
      .select(col("doc_id").as("__key"), col("simhash")).cache()
    println(s"docs = ${withSim.count()}")
    time("simhash (uncached)") {
      graft.operators.Dedup.simhash(d, "text")
        .agg(sum(bit_count(col("simhash")))).collect()
      0L
    }
    time("blocked pairs d=8") {
      graft.operators.Dedup.simhashPairs(withSim, maxDist = 8, maxBucket = 0)
        .count()
    }
    time("brute force twin") {
      val a = withSim.select(col("__key").as("keyA"), col("simhash").as("sa"))
      val b = withSim.select(col("__key").as("keyB"), col("simhash").as("sb"))
      a.crossJoin(b).where(col("keyA") < col("keyB"))
        .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 8).count()
    }
    spark.stop()
  }
}

/** Candidate/bucket statistics for the same frame. */
object SimhashBucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val withSim = graft.operators.Dedup.simhash(d, "text")
      .select(col("doc_id").as("__key"), col("simhash")).cache()
    withSim.count()
    val bands = graft.operators.Dedup.simhashBands(withSim, 8).cache()
    val sizes = bands.groupBy("tbl", "seg").agg(count(lit(1)).as("n")).cache()
    sizes.agg(sum(col("n") * (col("n") - 1) / 2).as("cand"),
      max("n").as("maxBucket"), count(lit(1)).as("buckets")).show()
    sizes.orderBy(desc("n")).show(10)
    spark.stop()
  }
}
