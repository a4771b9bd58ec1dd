package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** The flatMapGroupsWithState streaming dedup: cross-batch key memory,
  * deterministic representative, and idempotent batch output. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("cross-batch dedup emits one deterministic representative per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    // batch 1: "aa" arrives twice (ids 7 and 3 — min wins), "bb" once
    mem.addData(Seq((7L, "aa"), (3L, "aa"), (9L, "bb")))
    val q = StreamingDedup.start(
      mem.toDF().toDF("id", "text"), xxhash64(col("text")), "id", out,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      // batch 2: "aa" again (dropped — state remembers across batches),
      // "cc" new (emitted)
      mem.addData(Seq((20L, "aa"), (21L, "cc")))
      q.processAllAvailable()
      // batch 3: everything a duplicate -> nothing emitted
      mem.addData(Seq((30L, "aa"), (31L, "bb"), (32L, "cc")))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.read.parquet(out)
      .select("id", "text").as[(Long, String)].collect().toSet
    assert(got == Set((3L, "aa"), (9L, "bb"), (21L, "cc")))
  }

  test("restart from checkpoint: recovered state drops dups, new keys still emit") {
    // AvailableNow run -> stop -> fresh start from the same checkpoint:
    // the recovered flatMapGroupsWithState store must remember every key.
    val s = spark
    import s.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-sdrs-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sdrs").toString
    def addFile(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdrs-f").toString
      rows.toDF("id", "text").repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    val schema = Seq((0L, "")).toDF("id", "text").schema
    def run(): Unit = {
      val q = StreamingDedup.start(
        s.readStream.schema(schema).parquet(src),
        xxhash64(col("text")), "id", out)
      q.awaitTermination()
    }
    addFile(Seq((1L, "aa"), (2L, "bb")), "f1.parquet")
    run()
    // second QUERY (fresh start, same checkpoint): "aa" duplicate dropped
    // by recovered state, "cc" new -> emitted
    addFile(Seq((10L, "aa"), (11L, "cc")), "f2.parquet")
    run()
    val got = s.read.parquet(out)
      .select("id", "text").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "aa"), (2L, "bb"), (11L, "cc")))
  }

  test("batch-mode dedupByKey: same semantics without a stream") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, "x"), (2L, "x"), (8L, "y")).toDF("id", "text")
    val got = StreamingDedup.dedupByKey(df, xxhash64(col("text")), "id")
      .select("id", "text").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "x"), (8L, "y")))
  }

  test("orderCol must be a long — fail loud, not a runtime cast surprise") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "x")).toDF("id", "text") // id is INT here
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.dedupByKey(df, xxhash64(col("text")), "id")
    }
    assert(e.getMessage.contains("LongType"))
  }
}
