package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Scratch probe: q_minhash_lsh phase decomposition (not a ScalaTest). */
object MinhashPhaseProbe {
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
      println(f"$label%-26s $best%7.2fs  n=$n")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    time("signatures")(Dedup.minhashSignature(d, "text", 32)
      .select(col("doc_id"), element_at(col("minhash"), 1)).count())
    val sig = Dedup.minhashSignature(d, "text", 32)
      .select(col("doc_id").as("__key"), col("minhash")).cache()
    sig.count()
    time("lsh operator (cached sig)")(Dedup.minhashLshFromSig(sig,
      numHashes = 32, bands = 8, threshold = 0.5).count())
    val sh = d.select(col("doc_id").as("__key"),
      array_sort(transform(TextOps.wordShingles(col("text"), 5),
        x => xxhash64(x))).as("__sh")).cache()
    time("shingle frame")(sh.count())
    time("ground truth jaccard 0.9")(
      Dedup.ngramJaccardFromSets(sh, blockCols = Seq.empty, threshold = 0.9).count())
    spark.stop()
  }
}
