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
    val sig = Dedup.minhashSignature(d, "text", 32)
      .select(col("doc_id").as("__key"), col("minhash")).cache()
    time("sig cache")(sig.count())
    val found = Dedup.minhashLshFromSig(sig,
      numHashes = 32, bands = 8, threshold = 0.5).cache()
    time("found cache")(found.count())
    val sh = d.select(col("doc_id").as("__key"),
      array_sort(transform(TextOps.wordShingles(col("text"), 5),
        x => xxhash64(x))).as("__sh")).cache()
    time("sh cache")(sh.count())
    val exact = found
      .join(sh.select(col("__key").as("keyA"), col("__sh").as("shA")), "keyA")
      .join(sh.select(col("__key").as("keyB"), col("__sh").as("shB")), "keyB")
      .withColumn("__i", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("exact", col("__i").cast("double") /
        (size(col("shA")) + size(col("shB")) - col("__i")).cast("double"))
    time("falsePos")(exact.where(col("exact") < 0.2).count())
    val truth = Dedup.ngramJaccardFromSets(sh, blockCols = Seq.empty,
      threshold = 0.9)
    time("truth+missed (one join)") {
      val tm = truth.join(found.select(col("keyA"), col("keyB"),
          lit(1).as("__hit")), Seq("keyA", "keyB"), "left_outer")
        .agg(count(lit(1)).as("t"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("m")).collect()(0)
      tm.getLong(0)
    }
    time("capped")(Dedup.cappedBucketCount(
      Dedup.minhashBands(sig, bands = 8, rowsPerBand = 4),
      Seq("band", "bucket"), Dedup.DefaultMaxBucket))
    time("nDocs")(d.count())
    spark.stop()
  }
}
