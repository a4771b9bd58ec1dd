package graft.core

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Ad-hoc probe: prints lsh/ivf recall@3 per SF so the q_ann_recall floors
  * are set from measurements, not guesses. Not part of the test suite. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
        .select("query", "neighbor").cache()
      bf.count()
      Seq(0, 1, 2, 3).foreach { probes =>
        val r = Similarity.recall(bf,
          Similarity.lshTopK(emb, "vec_id", "embedding", k = 3, planes = 6,
            probes = probes).select("query", "neighbor"))
        println(f"$sf: lsh planes=6 probes=$probes recall=$r%.4f")
      }
      Seq(2, 3, 4).foreach { nProbe =>
        val r = Similarity.recall(bf,
          Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3, nLists = 8,
            nProbe = nProbe).select("query", "neighbor"))
        println(f"$sf: ivf nLists=8 nProbe=$nProbe recall=$r%.4f")
      }
      bf.unpersist()
    }
    spark.stop()
  }
}
