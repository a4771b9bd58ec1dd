package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{DecodeJob, EncodeJob}
import graft.sources.CodeTableGen

/** Benchmark main. Prints ONE JSON line:
  *   - end-to-end encode throughput (GB/s) on the synthesized code table at
  *     TWO parallelism levels (local[N/4] vs local[N] — the in-sandbox proxy
  *     for N vs 4N executors, BASELINE.md) + scaling efficiency,
  *   - compression ratio vs raw and vs the reference policy ceiling,
  *   - decode throughput,
  *   - per-query wall seconds on SPARK_GRAFT_SF_DIR (headline queries).
  *
  * Methodology: the input Dataset is generated deterministically, cached and
  * materialized before any timing, so the timed span covers exactly the
  * engine's work (salted repartition shuffle + per-partition chunked
  * encode). Each parallelism level is timed `reps` times in alternation
  * (lo, hi, lo, hi, ...) and the BEST run per level is kept — the sandbox
  * host has multi-second noise windows that best-of-N with interleaving
  * averages out. Chunk contents are a pure function of (input, encParts),
  * so both levels do byte-identical work.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val start = System.nanoTime()
  private def progress(msg: String): Unit =
    System.err.println(f"[bench +${(System.nanoTime() - start) / 1e9}%.1fs] $msg")

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def codeDf(spark: SparkSession, rows: Long, parts: Int): DataFrame =
    CodeTableGen.generate(spark, rows, parts).toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count", TextOps.lineCount(col("content")).cast("int"))

  /** One timed encode over a pre-cached input; returns
    * (rawBytes, encodedBytes, refBytes, secs). */
  private def encodeRun(df: DataFrame, encParts: Int): (Long, Long, Long, Double) = {
    val (agg, secs) = time {
      EncodeJob.encode(df, numPartitions = encParts,
          partitionKeys = Seq("repo", "lang"), sortKeys = Seq("repo", "path", "commit"))
        .toDF()
        .agg(sum("rawBytes"), sum("encodedBytes"), sum("refPolicyBytes"))
        .collect()(0)
    }
    (agg.getLong(0), agg.getLong(1), agg.getLong(2), secs)
  }

  /** Best-of-reps encode timing at one parallelism level; a fresh session
    * per call so `local[cores]` really bounds the thread pool. */
  private def levelRun(cores: Int, rows: Long, encParts: Int, reps: Int):
      (Long, Long, Long, Double) = {
    val s = session(cores)
    try {
      val df = codeDf(s, rows, encParts).cache()
      df.count() // materialize outside timing
      encodeRun(df.limit(2000), 8) // warm JIT/codegen, excluded
      var best: (Long, Long, Long, Double) = null
      var r = 0
      while (r < reps) {
        val run = encodeRun(df, encParts)
        progress(s"encode local[$cores] rep$r: ${run._4}s")
        if (best == null || run._4 < best._4) best = run
        r += 1
      }
      df.unpersist()
      best
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val smallCpus = math.max(1, cpus / 4)
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "600000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    val encParts = 128 // fixed: chunk contents identical at every parallelism

    // --- scaling law: same job, same input, N vs 4N cores, interleaved ----
    var bestLo: (Long, Long, Long, Double) = null
    var bestHi: (Long, Long, Long, Double) = null
    var round = 0
    while (round < rounds) {
      progress(s"round $round: local[$smallCpus]")
      val lo = levelRun(smallCpus, benchRows, encParts, reps)
      if (bestLo == null || lo._4 < bestLo._4) bestLo = lo
      progress(s"round $round: local[$cpus]")
      val hi = levelRun(cpus, benchRows, encParts, reps)
      if (bestHi == null || hi._4 < bestHi._4) bestHi = hi
      round += 1
    }
    val (rawLo, _, refLo, secsLo) = bestLo
    val (rawHi, encHi, _, secsHi) = bestHi
    val gbpsLo = rawLo / secsLo / 1e9
    val gbpsHi = rawHi / secsHi / 1e9
    val scalingEff = gbpsHi / ((cpus.toDouble / smallCpus) * gbpsLo)

    // --- decode throughput + headline queries on one local[cpus] session --
    val sHi = session(cpus)
    val df = codeDf(sHi, benchRows / 2, encParts)
    val chunks = EncodeJob.encode(df, encParts,
      Seq("repo", "lang"), Seq("repo", "path", "commit")).cache()
    val decRaw = chunks.toDF().agg(sum("rawBytes")).collect()(0).getLong(0)
    chunks.count() // materialize cache so decode timing excludes encode
    progress("decode bench")
    val (_, decSecs) = time {
      DecodeJob.decode(chunks, df.schema).count()
    }
    val decGbps = decRaw / decSecs / 1e9
    chunks.unpersist()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      progress(s"query $name")
      val (_, secs) = time {
        try { fn(sHi, sfDir).count() } catch { case _: Throwable => -1.0 }
      }
      name -> secs
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val totalQ = results.map(_._2).sum
    sHi.stop()

    println(
      f"""{"metric":"encode_throughput_gbps","value":$gbpsHi%.4f,"unit":"GB/s","queries":$qJson,"sf":"$sfDir","total_query_sec":$totalQ%.2f,"bench_rows":$benchRows,"raw_gb":${rawHi / 1e9}%.3f,"encode_gbps_p$smallCpus":$gbpsLo%.4f,"encode_gbps_p$cpus":$gbpsHi%.4f,"encode_sec_p$smallCpus":$secsLo%.2f,"encode_sec_p$cpus":$secsHi%.2f,"scaling_efficiency":$scalingEff%.3f,"compression_ratio":${encHi.toDouble / rawHi}%.4f,"ref_policy_ratio":${refLo.toDouble / rawLo}%.4f,"decode_gbps":$decGbps%.4f}""")
  }
}
