package graft.operators

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc skew-evidence probe (BENCH.md, VERDICT r3 #8): runs the salted
  * encode and the capped-bucket LSH dedup joins on DELIBERATELY skewed
  * corpora with AQE (incl. skew-join) on, and reports per-stage task-time
  * distributions from a SparkListener — the "no task > 4x median" gate.
  * Not part of the test suite; `sbt "Test/runMain graft.operators.SkewEvidenceProbe"`.
  */
object SkewEvidenceProbe {

  /** Collects task wall durations per stage. */
  final class TaskStats extends SparkListener {
    val byStage = TrieMap.empty[Int, ArrayBuffer[Long]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null && t.taskInfo.successful)
        byStage.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
          .synchronized { byStage(t.stageId) += t.taskInfo.duration }
    }
    /** Report stages worth looking at; the RATIO gate applies to stages
      * with >= 4 tasks and max >= 1s (tiny stages have meaningless
      * ratios), but any stage whose total or max is large prints too —
      * a single-task straggler stage must not hide below the ratio
      * filter. Returns worst gated max/median ratio. */
    def report(label: String): Double = {
      var worst = 0.0
      byStage.toSeq.sortBy(_._1).foreach { case (sid, dsRaw) =>
        val ds = dsRaw.sorted
        val total = ds.sum
        val med = if (ds.isEmpty) 0.0 else ds(ds.length / 2).toDouble
        val gated = ds.length >= 4 && ds.last >= 1000
        if (gated || total >= 5000 || (ds.nonEmpty && ds.last >= 5000)) {
          val ratio =
            if (med > 0) ds.last / med else Double.PositiveInfinity
          if (gated) worst = math.max(worst, ratio)
          println(f"$label stage=$sid n=${ds.length} total=${total / 1000.0}%.1fs " +
            f"median=${med / 1000}%.2fs max=${ds.last / 1000.0}%.2fs " +
            f"ratio=$ratio%.2f${if (gated) "" else " (ungated)"}")
        }
      }
      byStage.clear()
      worst
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    import spark.implicits._
    val lshOnly = args.contains("lsh-only")

    // ---- leg 0 (opt-in): soak-scale salted encode under forced skew ----
    // `soak <parquetDir>` reads a pre-generated table (the 100 GB soak
    // input), forces 90% of ALL rows into one repo, and requires the
    // SALTED encode to hold the <=4x task-time gate at that scale. The
    // unsalted failure baseline is not repeated here — leg 1 demonstrates
    // it at 2M rows and unsalted at 100 GB would push ~90 GB through a
    // handful of tasks (tens of minutes of single-thread wall for a
    // known-bad configuration). saltBuckets = numPartitions per the
    // BENCH.md rule — a key holding share s of the rows needs
    // saltBuckets >= s x numPartitions (0.9 x 1024 here); a first run at
    // saltBuckets=64 measured ratio 4.65 (the 64 mega-slices are ~14x a
    // median partition), confirming the rule's arithmetic at 100 GB.
    val soakIdx = args.indexOf("soak")
    if (soakIdx >= 0) {
      require(soakIdx + 1 < args.length,
        "usage: SkewEvidenceProbe soak <parquetDir>")
      val src = spark.read.parquet(args(soakIdx + 1))
        .withColumn("repo",
          when(pmod(xxhash64(col("path"), col("commit")), lit(10)) < 9,
            lit("mega/repo")).otherwise(col("repo")))
      val t0 = System.nanoTime()
      // per-PARTITION byte totals, not just the grand total: bytes are the
      // noise-free skew measure (task times at sub-second medians carry
      // 1-2 s GC/host-stall outliers that read as fake 4x+ ratios)
      val parts = EncodeJob.encode(src, 1024, Seq("repo", "lang"),
          Seq("repo", "path", "commit"), saltBuckets = 1024)
        .toDF().groupBy("partId")
        .agg(sum("rawBytes").as("raw"), sum("encodedBytes").as("enc"))
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      require(parts.nonEmpty, "soak input produced zero encoded partitions")
      val raws = parts.map(_.getLong(1)).sorted
      val rawTot = raws.sum
      val encTot = parts.map(_.getLong(2)).sum
      val med = raws(raws.length / 2).toDouble
      println(f"soak-skew salted=1024 raw=$rawTot encoded=$encTot " +
        f"wall=$wall%.1fs (${rawTot / wall / 1e9}%.3f GB/s)")
      println(f"soak-skew per-partition rawBytes: n=${raws.length} " +
        f"median=${med / 1e6}%.1fMB max=${raws.last / 1e6}%.1fMB " +
        f"byteRatio=${raws.last / med}%.2f gate4x=${raws.last / med <= 4.0}")
      val worst = stats.report("soak-salted")
      println(f"soak-skew worst task-TIME max/median ratio=$worst%.2f " +
        "(informational: sub-second medians make this noise-dominated)")
      spark.stop()
      return
    }

    // ---- leg 1: mega-repo encode, unsalted vs salted ----
    if (!lshOnly) {
    // 2M rows, 90% forced into one repo — the worst case the salt exists
    // for. Unsalted (saltBuckets=1) is the deliberate FAILURE baseline;
    // the salted run must hold the 4x gate.
    val src = graft.sources.CodeTableGen.generate(spark, 2000000L, 64).toDF()
      .withColumn("repo",
        when(pmod(xxhash64(col("path")), lit(10)) < 9, lit("mega/repo"))
          .otherwise(col("repo")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"rows=${src.count()}")
    stats.byStage.clear()
    Seq(1, 64).foreach { saltB =>
      val t0 = System.nanoTime()
      val n = EncodeJob.encode(src, 64, Seq("repo"), Seq("path"),
        saltBuckets = saltB).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"encode saltBuckets=$saltB chunks=$n wall=$wall%.1fs")
      val worst = stats.report(s"encode-salt$saltB")
      println(f"encode saltBuckets=$saltB worst max/median ratio=$worst%.2f " +
        s"gate4x=${if (saltB == 1) "n/a (unsalted baseline)" else (worst <= 4.0).toString}")
    }
    src.unpersist()
    }

    // ---- leg 2: capped-bucket LSH joins on a duplicate-flooded corpus --
    // sf0.1 documents x10 replicas (near-dup clusters of 10) PLUS 20% of
    // docs collapsed onto ONE boilerplate text — a degenerate hot bucket
    // in every banding scheme. AQE skew-join on; caps + anchor legs keep
    // the candidate joins linear.
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val mx = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val docs = base.crossJoin(spark.range(10).toDF("rep"))
      .withColumn("doc_id", col("doc_id") + col("rep") * mx)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("standard header boilerplate all rights reserved " * 40))
          .otherwise(concat(col("text"), lit(" r"), col("rep"))))
      .drop("rep")
      // a realistic input layout: the single-file parquet source would
      // otherwise make every map-side stage a one-task stage
      .repartition(32, col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    println(s"docs=${docs.count()}")
    stats.byStage.clear()

    var t0 = System.nanoTime()
    val mh = Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5).count()
    println(f"minhashLsh pairs=$mh wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    val w1 = stats.report("minhash-lsh")
    println(f"minhashLsh worst max/median ratio=$w1%.2f gate4x=${w1 <= 4.0}")

    t0 = System.nanoTime()
    val sh = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 3).count()
    println(f"simhashNearDups pairs=$sh wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    val w2 = stats.report("simhash")
    println(f"simhashNearDups worst max/median ratio=$w2%.2f gate4x=${w2 <= 4.0}")

    spark.stop()
  }
}
