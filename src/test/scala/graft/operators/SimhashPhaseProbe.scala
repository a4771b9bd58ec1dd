package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SimhashPhaseProbe {
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
        val t0 = System.nanoTime(); n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s $best%7.2fs  n=$n")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val withSim = Dedup.simhash(d, "text")
      .select(col("doc_id").as("__key"), col("simhash")).cache()
    withSim.count()
    val bands = Dedup.simhashBands(withSim, 8)
    time("bands count")(bands.count())
    val cachedBands = bands.cache(); cachedBands.count()
    time("exact x all join (raw)") {
      val a = cachedBands.where(col("ex")).select(col("tbl"), col("seg"), col("__key").as("keyA"))
      val b = cachedBands.select(col("tbl"), col("seg"), col("__key").as("keyB"))
      a.join(b, Seq("tbl", "seg")).where(col("keyA") =!= col("keyB")).count()
    }
    time("full simhashPairs") {
      Dedup.simhashPairs(withSim, 8, 0).count()
    }
    spark.stop()
  }
}
