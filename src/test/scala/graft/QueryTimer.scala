package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc A/B harness: time named SparkEntry queries against whatever main
  * jar is on the classpath (the API `queries(name)(spark, sfDir)` is stable
  * across rounds, so the same tests jar drives an old jar for regression
  * bisection). Prints per-run seconds; take the min per query.
  *
  * Usage: spark-submit --class graft.QueryTimer <testsJar+mainJar>
  *   <sfDir> <runs> <query> [query ...]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().appName("graft-querytimer")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QT $n min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
