package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{DecodeJob, EncodeJob}
import graft.sources.CodeTableGen

/** Benchmark main. Prints ONE JSON line:
  *   - per-query wall seconds on SPARK_GRAFT_SF_DIR (headline queries),
  *   - end-to-end encode throughput (GB/s) on the synthesized code table at
  *     TWO parallelism levels (local[N/4] vs local[N] — the in-sandbox proxy
  *     for N vs 4N executors, BASELINE.md) + scaling efficiency,
  *   - compression ratio vs raw and vs the reference policy ceiling,
  *   - decode throughput.
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
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def codeDf(spark: SparkSession, rows: Long, parts: Int): DataFrame =
    CodeTableGen.generate(spark, rows, parts).toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count", TextOps.lineCount(col("content")).cast("int"))

  /** One full encode run; returns (rawBytes, encodedBytes, refBytes, secs). */
  private def encodeRun(spark: SparkSession, rows: Long, encParts: Int): (Long, Long, Long, Double) = {
    val df = codeDf(spark, rows, encParts)
    val (agg, secs) = time {
      EncodeJob.encode(df, numPartitions = encParts,
          partitionKeys = Seq("repo", "lang"), sortKeys = Seq("repo", "path", "commit"))
        .toDF()
        .agg(sum("rawBytes"), sum("encodedBytes"), sum("refPolicyBytes"))
        .collect()(0)
    }
    (agg.getLong(0), agg.getLong(1), agg.getLong(2), secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val smallCpus = math.max(1, cpus / 4)
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "150000").toLong
    val encParts = 64 // fixed: chunk contents identical at every parallelism

    // --- scaling law: same job, same input, N vs 4N cores ----------------
    val sLow = session(smallCpus)
    // warm-up (JIT + codegen) at tiny scale, excluded from timing
    encodeRun(sLow, 2000L, 8)
    val (rawLo, encLo, refLo, secsLo) = encodeRun(sLow, benchRows, encParts)
    sLow.stop()

    val sHi = session(cpus)
    encodeRun(sHi, 2000L, 8)
    val (rawHi, encHi, _, secsHi) = encodeRun(sHi, benchRows, encParts)
    val gbpsLo = rawLo / secsLo / 1e9
    val gbpsHi = rawHi / secsHi / 1e9
    val scalingEff = gbpsHi / ((cpus.toDouble / smallCpus) * gbpsLo)

    // --- decode throughput on the high session ---------------------------
    val df = codeDf(sHi, benchRows / 4, encParts)
    val chunks = EncodeJob.encode(df, encParts,
      Seq("repo", "lang"), Seq("repo", "path", "commit")).cache()
    val decRaw = chunks.toDF().agg(sum("rawBytes")).collect()(0).getLong(0)
    chunks.count() // materialize cache so decode timing excludes encode
    val (_, decSecs) = time {
      DecodeJob.decode(chunks, df.schema).count()
    }
    val decGbps = decRaw / decSecs / 1e9
    chunks.unpersist()

    // --- headline queries on the sf dir ----------------------------------
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
