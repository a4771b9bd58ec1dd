package graft.core

import org.apache.spark.sql.SparkSession

/** Scratch probe (not a ScalaTest suite): times named SparkEntry queries
  * in one warm session — best-of-2 per query, mirroring Bench's loop.
  * Run: `sbt "Test/runMain graft.core.QueryProbe /root/testdata/sf0.1 q_ngram_jaccard q_minhash_lsh"` */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      var best = Double.MaxValue
      (0 until 2).foreach { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$n%-20s $best%7.2fs")
    }
    spark.stop()
  }
}
