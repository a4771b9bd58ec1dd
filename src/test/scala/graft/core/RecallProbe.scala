package graft.core

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Ad-hoc probe: prints lsh/ivf recall@3 AND wall time per configuration so
  * the q_ann_recall floors and the (tables, planes, probes) operating point
  * are set from measurements, not guesses. Not part of the test suite.
  *
  * Usage: Test/runMain graft.core.RecallProbe [sfDir ...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq else Seq("sf0.01", "sf0.1")
    // (tables, planes, probes): current operating point first, then
    // candidates trading tables for probes (multi-probe's whole point) and
    // planes for bucket size
    val configs = Seq(
      (8, 6, 2), // round-4 operating point
      (4, 6, 3),
      (4, 6, 4),
      (4, 5, 3),
      (3, 5, 3),
      (3, 6, 4),
      (2, 5, 4),
      (4, 8, 3),
      (4, 7, 3))
    dirs.foreach { sf =>
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
        .select("query", "neighbor").cache()
      bf.count()
      configs.foreach { case (t, p, pr) =>
        // warm once for recall, then time best-of-2 count() actions
        val ann = () => Similarity.lshTopK(emb, "vec_id", "embedding",
          k = 3, planes = p, tables = t, probes = pr)
        val r = Similarity.recall(bf, ann().select("query", "neighbor"))
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          ann().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$sf: lsh tables=$t planes=$p probes=$pr " +
          f"recall=$r%.4f secs=${times.min}%.2f")
      }
      Seq((8, 3)).foreach { case (nl, np) =>
        val ann = () => Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
          nLists = nl, nProbe = np)
        val r = Similarity.recall(bf, ann().select("query", "neighbor"))
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          ann().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$sf: ivf nLists=$nl nProbe=$np recall=$r%.4f " +
          f"secs=${times.min}%.2f")
      }
      bf.unpersist()
    }
    spark.stop()
  }
}
