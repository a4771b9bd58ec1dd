package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline; the
  * scale path buckets by random-hyperplane signs (LSH) so the self-join is
  * linear in bucket size.
  *
  * Scale notes (100 TB): [[bruteForceTopK]] broadcasts the corpus side —
  * correct whenever the *indexed* side fits in executor memory (the classic
  * brute-force-with-broadcast baseline); queries stream through
  * mapPartitions with a primitive-float kernel, no shuffle at all.
  * [[lshTopK]] avoids the quadratic join entirely: one shuffle on bucket
  * id, pairs only within buckets.
  */
object Similarity {

  /** Codegen'd cosine similarity between two array<float/double> columns.
    * For join hot paths prefer normalizing each side once and using
    * [[dot]] — this recomputes both norms per pair. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    when(na * nb > 0, d / (na * nb)).otherwise(lit(0.0))
  }

  /** Codegen'd dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Exact brute-force cosine top-k for every row: the corpus is collected
    * (normalized, primitive floats) and broadcast; each partition scans its
    * queries against the broadcast matrix with a JIT-friendly fused loop and
    * a bounded selection — zero shuffle, linear scaling in queries. */
  def bruteForceTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(keyCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // corpus side: raw doubles + precomputed L2 norms
    val corpus: Array[(Long, Array[Double], Double)] = src.collect().map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (id, v, math.sqrt(s))
    }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)

    val outSchema = StructType(Seq(
      StructField("query", LongType, nullable = false),
      StructField("neighbor", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false),
      StructField("rank", IntegerType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)

    src.mapPartitions { it =>
      val cor = bc.value
      val n = cor.length
      it.flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1).toArray
        var s = 0.0
        var i = 0
        while (i < q.length) { s += q(i) * q(i); i += 1 }
        val qn = math.sqrt(s)
        // top-k by (cosine desc, neighbor asc): bounded insertion sort
        val topIds = new Array[Long](k)
        val topCos = new Array[Double](k)
        var filled = 0
        var ci = 0
        while (ci < n) {
          val (cid, cv, cn) = cor(ci)
          if (cid != qid) {
            var d = 0.0
            var j = 0
            while (j < cv.length) { d += q(j) * cv(j); j += 1 }
            val c = if (qn * cn > 0) d / (qn * cn) else 0.0
            val better = filled < k || c > topCos(k - 1) ||
              (c == topCos(k - 1) && cid < topIds(k - 1))
            if (better) {
              var pos = if (filled < k) filled else k - 1
              topIds(pos) = cid
              topCos(pos) = c
              while (pos > 0 && (topCos(pos) > topCos(pos - 1) ||
                  (topCos(pos) == topCos(pos - 1) && topIds(pos) < topIds(pos - 1)))) {
                val ti = topIds(pos); topIds(pos) = topIds(pos - 1); topIds(pos - 1) = ti
                val tc = topCos(pos); topCos(pos) = topCos(pos - 1); topCos(pos - 1) = tc
                pos -= 1
              }
              if (filled < k) filled += 1
            }
          }
          ci += 1
        }
        (0 until filled).iterator.map(rk =>
          Row(qid, topIds(rk), topCos(rk), rk + 1))
      }
    }.toDF("query", "neighbor", "cosine", "rank")
  }

  /** Fraction of the exact top-k (query, neighbor) pairs an ANN result
    * recovered — the value-checkable quality gate for the scale-path ANN
    * operators (one semi-join + two counts, fully distributed). */
  def recall(exact: DataFrame, ann: DataFrame): Double = {
    val total = exact.count()
    if (total == 0) 1.0
    else exact.join(ann, Seq("query", "neighbor"), "left_semi")
      .count().toDouble / total
  }

  /** IVF (inverted-file) ANN: `nLists` coarse centroids are seeded from a
    * deterministic sample and refined with `iters` distributed Lloyd
    * steps (a groupBy-mean per step — map-side combinable); every vector
    * is assigned to its nearest centroid (broadcast, tiny); queries probe
    * their `nProbe` nearest cells, so the candidate join is
    * |cell| * nProbe per query instead of the full corpus. The 100 TB
    * shape: centroids stay driver-side KBs, assignment is a map, the only
    * shuffle is the cell-keyed candidate join. */
  def ivfTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, nLists: Int = 16, nProbe: Int = 2, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(keyCol).as("__key"),
      col(vecCol).cast("array<double>").as("__vec"))

    // deterministic seed sample: smallest nLists keys by hash
    var centroids: Array[Array[Double]] = src
      .orderBy(xxhash64(col("__key")))
      .limit(nLists)
      .collect()
      .map(_.getSeq[Double](1).toArray)

    def assignUdf(cents: Array[Array[Double]]) =
      udf((v: Seq[Double]) => nearestCell(cents, v.toArray))

    // Lloyd refinement: assign -> mean per cell (distributed, 1 shuffle/step)
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = src.withColumn("__cell", assignUdf(bc.value)(col("__vec")))
      val means = assigned.groupBy("__cell")
        .agg(count(lit(1)).as("n"),
          array((0 until centroids(0).length).map(d =>
            avg(col("__vec").getItem(d))): _*).as("mean"))
        .collect()
      val next = centroids.clone()
      means.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](2).toArray
      }
      centroids = next
    }

    val bc = spark.sparkContext.broadcast(centroids)
    val probeUdf = udf((v: Seq[Double]) => nearestCells(bc.value, v.toArray, nProbe))
    val assigned = src
      .withColumn("__cell", assignUdf(bc.value)(col("__vec")))
      .withColumn("__norm", norm(col("__vec")))
      .withColumn("__unit", transform(col("__vec"), x =>
        when(col("__norm") > 0, x / col("__norm")).otherwise(lit(0.0))))
    val corpus = assigned.select(col("__cell"), col("__key").as("neighbor"),
      col("__unit").as("unitB"))
    val queries = assigned.select(col("__key").as("query"),
      col("__unit").as("unitA"),
      explode(probeUdf(col("__vec"))).as("__cell"))
    val scored = queries.join(corpus, Seq("__cell"))
      .where(col("query") =!= col("neighbor"))
      .withColumn("cosine", dot(col("unitA"), col("unitB")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .dropDuplicates("query", "neighbor") // a pair can meet in 2 probed cells
      .select("query", "neighbor", "cosine", "rank")
  }

  private def nearestCell(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cv = cents(c)
      while (i < cv.length) { val x = cv(i) - v(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestCells(cents: Array[Array[Double]], v: Array[Double],
      nProbe: Int): Array[Int] = {
    val ds = cents.indices.map { c =>
      var d = 0.0
      var i = 0
      val cv = cents(c)
      while (i < cv.length) { val x = cv(i) - v(i); d += x * x; i += 1 }
      (d, c)
    }
    ds.sortBy(x => (x._1, x._2)).take(math.max(1, nProbe)).map(_._2).toArray
  }

  /** Deterministic pseudo-random hyperplane component for (table t, plane
    * p, dim i): a fixed hash mapped to [-1, 1] — seeded, identical on every
    * executor with zero driver state. */
  private def planeComponent(t: Int, p: Int, i: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), lit(t * 1000 + p), i), lit(2000001L))
      .cast("double") - 1000000.0) / 1000000.0

  /** Random-hyperplane LSH for table `t`: `planes` sign bits -> one integer
    * bucket id. Cosine-similar vectors collide with high probability. */
  def cosineLshBuckets(df: DataFrame, vecCol: String, planes: Int = 12,
      table: Int = 0): DataFrame = {
    val v = col(vecCol)
    val idx = sequence(lit(0), size(v) - 1)
    val bits = (0 until planes).map { p =>
      val d = aggregate(zip_with(v, idx, (x, i) => x * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    df.withColumn("lshBucket", bits.reduce(_.bitwiseOR(_)))
  }

  /** Scale-path ANN: MULTI-TABLE hyperplane LSH — `tables` independent
    * plane sets, candidates unioned across tables, then exact top-k per
    * query over the candidate set. Single-table sign-LSH recall was ~5% on
    * near-uniform embeddings (round-1 measurement); multi-table is the
    * standard recall lever and keeps the same shape: one explode (x tables),
    * join only within (table, bucket), never quadratic. Vectors are
    * normalized once per side, so each candidate pair costs one dot. */
  def lshTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, planes: Int = 8, tables: Int = 8): DataFrame = {
    val v = col(vecCol)
    val idx = sequence(lit(0), size(v) - 1)
    val bucketStructs = (0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val d = aggregate(zip_with(v, idx, (x, i) => x * planeComponent(t, p, i)),
          lit(0.0), (acc, x) => acc + x)
        when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      struct(lit(t).as("tbl"), bits.reduce(_.bitwiseOR(_)).as("bucket"))
    }
    val bucketed = df
      .withColumn("__norm", norm(v))
      .select(col(keyCol).as("__key"),
        transform(v, x =>
          when(col("__norm") > 0, x / col("__norm")).otherwise(lit(0.0)))
          .as("__unit"),
        explode(array(bucketStructs: _*)).as("tb"))
      .select(col("__key"), col("__unit"), col("tb.tbl"), col("tb.bucket"))
    val a = bucketed.select(col("tbl"), col("bucket"),
      col("__key").as("query"), col("__unit").as("unitA"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col("__key").as("neighbor"), col("__unit").as("unitB"))
    val scored = a.join(b, Seq("tbl", "bucket"))
      .where(col("query") =!= col("neighbor"))
      .select(col("query"), col("neighbor"), col("unitA"), col("unitB"))
      .dropDuplicates("query", "neighbor") // union of candidate sets
      .withColumn("cosine", dot(col("unitA"), col("unitB")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query", "neighbor", "cosine", "rank")
  }
}
