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
