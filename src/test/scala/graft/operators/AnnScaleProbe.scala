package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the ANN operators: corpora orders of magnitude past the
  * 2k-vector bench table, recall measured against [[Similarity.exactTopK]]
  * (the distributed exact search — no driver-side corpus) on a sampled
  * probe set. Establishes the planes-sizing rule for lshTopK (buckets must
  * track corpus size: planes ~ log2(n / targetBucket)) the way the
  * saltBuckets rule was established for encode skew. Not a ScalaTest.
  *
  * Usage: Test/runMain graft.operators.AnnScaleProbe [n] [dims]
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dims = if (args.length > 1) args(1).toInt else 64
    val mode = if (args.length > 2) args(2) else "all" // lsh | ivf | all
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic corpus with planted cluster structure: 1024 cluster
    // centroids (hash of id % 1024), each vector = centroid + small
    // hash-noise, so nearest neighbors are meaningful (same-cluster), not
    // the degenerate near-orthogonal random case
    val dimCols = (0 until dims).map { d =>
      val centroid = (pmod(xxhash64(pmod(col("vec_id"), lit(1024L)), lit(d)),
        lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
      val noise = (pmod(xxhash64(col("vec_id"), lit(d + 10000)),
        lit(2000001L)).cast("double") - 1000000.0) / 4000000.0
      (centroid + noise).cast("float")
    }
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        array(dimCols: _*).as("embedding"))
      .repartition(32).localCheckpoint(true)

    // exact ground truth on a 200-probe sample, via the distributed exact
    // search (probe set broadcast, corpus streamed in place)
    val stride = math.max(1L, n / 200)
    val probes = vecs.where(pmod(col("vec_id"), lit(stride)) === 0)
    var t0 = System.nanoTime()
    val exact = Similarity.exactTopK(vecs, probes, "vec_id", "embedding",
      k = 3).select("query", "neighbor").localCheckpoint(true)
    val tExact = (System.nanoTime() - t0) / 1e9
    val nProbes = exact.select("query").distinct().count()
    println(f"n=$n dims=$dims probes=$nProbes exactTopK=${tExact}%.1f s")

    (if (mode == "ivf") Seq.empty[Int] else Seq(10, 12, 14)).foreach { planes =>
      t0 = System.nanoTime()
      val ann = Similarity.lshTopK(vecs, "vec_id", "embedding", k = 3,
        planes = planes, tables = 4, probes = 3)
        .select("query", "neighbor").localCheckpoint(true)
      val tAll = (System.nanoTime() - t0) / 1e9
      val hits = exact.join(ann, Seq("query", "neighbor"), "left_semi").count()
      val total = exact.count()
      println(f"lsh tables=4 planes=$planes probes=3: ${tAll}%.1f s " +
        f"recall@3=${hits.toDouble / total}%.3f " +
        f"(expected bucket ~ ${n / math.pow(2, planes)}%.0f)")
    }
    // nLists must track corpus size like LSH planes do: candidate volume
    // per query is nProbe x (n / nLists), so cells of ~100-200 keep the
    // join linear-ish (nLists=64 at 200k means 3k-vector cells — a
    // 2.5B-pair join; measured as the failing direction)
    (if (mode == "lsh") Seq.empty[(Int, Int)]
     else Seq((1024, 4), (2048, 8))).foreach { case (nl, np) =>
      t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(vecs, "vec_id", "embedding", k = 3,
        nLists = nl, nProbe = np, nPartitions = 32)
        .select("query", "neighbor").localCheckpoint(true)
      val tAll = (System.nanoTime() - t0) / 1e9
      val hits = exact.join(ann, Seq("query", "neighbor"), "left_semi").count()
      val total = exact.count()
      println(f"ivf nLists=$nl nProbe=$np: ${tAll}%.1f s " +
        f"recall@3=${hits.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
