package graft.core

import org.apache.spark.sql.{SparkSession, Row, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.EncodeJob
import graft.sources.CodeTableGen
import graft.functions.TextOps

/** Scratch probe: which stage limits scaling from local[8] to local[32]? */
object ScalingProbe {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def bestOf[A](n: Int)(f: => A): Double = {
    var best = Double.MaxValue
    (0 until n).foreach { _ =>
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[rep] $dt%.2fs gc=${(gcMillis - g0) / 1000.0}%.2fs")
      best = math.min(best, dt)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val rows = 600000L
    val encParts = 128
    Seq(8, 32, 8, 32).foreach { cores =>
      val spark = SparkSession.builder().master(s"local[$cores]")
        .appName(s"scaling-$cores")
        .config("spark.sql.shuffle.partitions", math.max(cores, 8))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val df = CodeTableGen.generate(spark, rows, encParts).toDF()
        .withColumn("content_len", octet_length(col("content")))
        .withColumn("line_count", TextOps.lineCount(col("content")).cast("int"))
        .cache()
      df.count()
      val schema = df.schema
      import spark.implicits._

      val tShuffle = bestOf(2) {
        df.repartition(encParts, col("repo"), col("lang"))
          .sortWithinPartitions("repo", "path", "commit").write.format("noop")
          .mode("overwrite").save()
      }
      val tExtract = bestOf(2) {
        df.repartition(encParts, col("repo"), col("lang"))
          .sortWithinPartitions("repo", "path", "commit")
          .mapPartitions { it =>
            var n = 0L
            var b = 0L
            it.foreach { r =>
              var c = 0
              while (c < schema.length) {
                schema(c).dataType match {
                  case org.apache.spark.sql.types.StringType =>
                    b += r.getString(c).length
                  case _ => b += 8
                }
                c += 1
              }
              n += 1
            }
            Iterator.single(n -> b)
          }.collect()
      }
      val tEncode = bestOf(2) {
        EncodeJob.encode(df, encParts, Seq("repo", "lang"),
            Seq("repo", "path", "commit")).toDF()
          .agg(sum("rawBytes")).collect()
      }
      val tEncodeNoShuffle = bestOf(2) {
        // pre-partitioned input, no repartition/sort: pure mapPartitions
        EncodeJob.encode(df, encParts, Seq.empty, Seq.empty).toDF()
          .agg(sum("rawBytes")).collect()
      }
      println(f"[scale] cores=$cores shuffleSort=$tShuffle%.2f extract=$tExtract%.2f encode=$tEncode%.2f encodeSaltOnly=$tEncodeNoShuffle%.2f")
      spark.stop()
    }
  }
}
