package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline; the
  * scale path buckets by random-hyperplane signs (LSH) so the self-join is
  * linear in bucket size, and a broadcast path serves small query sets. */
object Similarity {

  /** Codegen'd cosine similarity between two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    when(na * nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** Exact brute-force top-k neighbors for every row (self-join). The small
    * side is broadcast when it fits; for N large use [[lshTopK]]. */
  def bruteForceTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5): DataFrame = {
    val a = df.select(col(keyCol).as("query"), col(vecCol).as("vecA"))
    val b = df.select(col(keyCol).as("neighbor"), col(vecCol).as("vecB"))
    val scored = a.join(broadcast(b), col("query") =!= col("neighbor"))
      .withColumn("cosine", cosine(col("vecA"), col("vecB")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query", "neighbor", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1] — seeded, identical on every executor
    * with zero driver state. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), lit(p), i), lit(2000001L)).cast("double")
      - 1000000.0) / 1000000.0

  /** Random-hyperplane LSH: `planes` sign bits -> one integer bucket id.
    * Cosine-similar vectors collide with high probability. */
  def cosineLshBuckets(df: DataFrame, vecCol: String, planes: Int = 12): DataFrame = {
    val v = col(vecCol)
    val idx = sequence(lit(0), size(v) - 1)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(zip_with(v, idx, (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    df.withColumn("lshBucket", bits.reduce(_.bitwiseOR(_)))
  }

  /** Scale-path ANN: join only within LSH buckets, then top-k per query.
    * Recall trades off with `planes`; at 100 TB this is the shape that
    * avoids the quadratic cross join entirely. */
  def lshTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, planes: Int = 8): DataFrame = {
    val bucketed = cosineLshBuckets(df, vecCol, planes)
      .select(col("lshBucket"), col(keyCol).as("__key"), col(vecCol).as("__vec"))
    val a = bucketed.select(col("lshBucket"), col("__key").as("query"), col("__vec").as("vecA"))
    val b = bucketed.select(col("lshBucket"), col("__key").as("neighbor"), col("__vec").as("vecB"))
    val scored = a.join(b, Seq("lshBucket")).where(col("query") =!= col("neighbor"))
      .withColumn("cosine", cosine(col("vecA"), col("vecB")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query", "neighbor", "cosine", "rank")
  }
}
