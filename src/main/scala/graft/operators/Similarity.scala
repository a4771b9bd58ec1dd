package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline; the
  * scale paths bucket by random-hyperplane signs (LSH) or coarse centroids
  * (IVF) so the candidate join is linear in bucket/cell size.
  *
  * Scale notes (100 TB): [[bruteForceTopK]] broadcasts the corpus side —
  * correct whenever the *indexed* side fits in executor memory (the classic
  * brute-force-with-broadcast baseline); a guard rail rejects corpora above
  * `maxCorpusRows` with a pointer at the scale paths. [[lshTopK]] and
  * [[ivfTopK]] avoid the quadratic join entirely: one shuffle on bucket/cell
  * id, pairs only within buckets, candidate pairs deduplicated on keys
  * before any vector payload moves.
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

  /** Codegen'd dot product of two array columns. The cast makes every
    * product a DOUBLE multiply even on array<float> inputs — float*float
    * would round to 24 bits before accumulating (~1e-7 relative error,
    * enough to flip near-threshold comparisons). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array column (double math on float inputs, see [[dot]]). */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v))

  /** Hard ceiling for [[bruteForceTopK]]'s driver-side corpus collect.
    * 4M rows x (16 dims x 8B + overhead) ≈ 1 GB — the most a sane driver
    * should hold. Above this, use [[lshTopK]] / [[ivfTopK]]. */
  val MaxBruteForceCorpus: Long = 4L * 1000 * 1000

  /** Exact brute-force cosine top-k for every row: the corpus is collected
    * (normalized, primitive floats) and broadcast; each partition scans its
    * queries against the broadcast matrix with a JIT-friendly fused loop and
    * a bounded selection — zero shuffle, linear scaling in queries.
    *
    * This is the exact BASELINE / quality gate, not the scale path: it
    * `require`s the corpus under `maxCorpusRows` (default
    * [[MaxBruteForceCorpus]]) instead of OOMing the driver at 100 TB. */
  def bruteForceTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, maxCorpusRows: Long = MaxBruteForceCorpus): DataFrame = {
    // k <= 0 would index topCos(-1) inside the executor loop — fail fast
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val src = df.select(col(keyCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // one pass: collect at most maxCorpusRows+1 rows — an overflow row
    // proves the corpus is too big without ever scanning the plan twice
    // (a count() guard would re-evaluate the full upstream per call)
    val lim = math.min(maxCorpusRows, (Int.MaxValue - 1).toLong).toInt
    val rows = src.limit(lim + 1).collect()
    require(rows.length <= maxCorpusRows,
      s"bruteForceTopK collects the corpus to the driver: more than " +
        s"maxCorpusRows=$maxCorpusRows rows. Use Similarity.lshTopK or " +
        "Similarity.ivfTopK for corpora that don't fit one machine.")
    // corpus side: raw doubles + precomputed L2 norms
    val corpus: Array[(Long, Array[Double], Double)] = rows.map { r =>
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
      Encoders.row(outSchema)

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
        val top = new TopSel(k)
        var ci = 0
        while (ci < n) {
          val (cid, cv, cn) = cor(ci)
          if (cid != qid) {
            var d = 0.0
            var j = 0
            while (j < cv.length) { d += q(j) * cv(j); j += 1 }
            top.offer(cid, if (qn * cn > 0) d / (qn * cn) else 0.0)
          }
          ci += 1
        }
        (0 until top.filled).iterator.map(rk =>
          Row(qid, top.ids(rk), top.cos(rk), rk + 1))
      }
    }.toDF("query", "neighbor", "cosine", "rank")
  }

  /** Bounded top-k selection by (cosine desc, neighbor asc) — the ONE
    * insertion kernel [[bruteForceTopK]] and [[exactTopK]] both run, so
    * their documented row-for-row parity is structural rather than kept by
    * parallel edits. Deterministic regardless of offer order: an equal
    * cosine keeps the smaller neighbor id, both at the cut boundary and
    * inside the sorted prefix. */
  private final class TopSel(k: Int) {
    val ids = new Array[Long](k)
    val cos = new Array[Double](k)
    var filled = 0
    def offer(cid: Long, c: Double): Unit = {
      val better = filled < k || c > cos(k - 1) ||
        (c == cos(k - 1) && cid < ids(k - 1))
      if (better) {
        var pos = if (filled < k) filled else k - 1
        ids(pos) = cid
        cos(pos) = c
        while (pos > 0 && (cos(pos) > cos(pos - 1) ||
            (cos(pos) == cos(pos - 1) && ids(pos) < ids(pos - 1)))) {
          val ti = ids(pos); ids(pos) = ids(pos - 1); ids(pos - 1) = ti
          val tc = cos(pos); cos(pos) = cos(pos - 1); cos(pos - 1) = tc
          pos -= 1
        }
        if (filled < k) filled += 1
      }
    }
  }

  /** Exact cosine-threshold pair join — the brute-force ground truth for
    * [[Dedup.embeddingNearDups]]: the normalized corpus is collected and
    * broadcast (same guard rail as [[bruteForceTopK]]); each partition
    * scans its rows against the broadcast matrix with a fused primitive
    * loop, emitting (keyA, keyB, cosine) with keyA < keyB and
    * cosine ≥ threshold. The normalization/dot arithmetic is
    * operation-for-operation identical to the SQL path (float promoted to
    * double, left-fold accumulation), so set comparisons against the LSH
    * operator are exact, not tolerance-based. */
  def bruteForceNearDups(df: DataFrame, keyCol: String, vecCol: String,
      threshold: Double,
      maxCorpusRows: Long = MaxBruteForceCorpus): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(keyCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // same single-pass overflow guard as bruteForceTopK
    val lim = math.min(maxCorpusRows, (Int.MaxValue - 1).toLong).toInt
    val rows = src.limit(lim + 1).collect()
    require(rows.length <= maxCorpusRows,
      s"bruteForceNearDups collects the corpus to the driver: more than " +
        s"maxCorpusRows=$maxCorpusRows rows. Use Dedup.embeddingNearDups for " +
        "corpora that don't fit one machine.")
    val corpus: Array[(Long, Array[Double])] = rows.map { r =>
      val v = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val nrm = math.sqrt(s)
      val unit =
        if (nrm > 0) { var j = 0; while (j < v.length) { v(j) /= nrm; j += 1 }; v }
        else new Array[Double](v.length)
      (r.getLong(0), unit)
    }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val outSchema = StructType(Seq(
      StructField("keyA", LongType, nullable = false),
      StructField("keyB", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    src.mapPartitions { it =>
      val cor = bc.value
      val n = cor.length
      it.flatMap { r =>
        val qid = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(s)
        val q =
          if (nrm > 0) { var j = 0; while (j < v.length) { v(j) /= nrm; j += 1 }; v }
          else new Array[Double](v.length)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var ci = 0
        while (ci < n) {
          val (cid, cv) = cor(ci)
          if (cid > qid) {
            var d = 0.0
            var j = 0
            while (j < cv.length) { d += q(j) * cv(j); j += 1 }
            if (d >= threshold) out += Row(qid, cid, d)
          }
          ci += 1
        }
        out.iterator
      }
    }.toDF("keyA", "keyB", "cosine")
  }

  /** Hard ceiling for [[exactTopK]]'s broadcast probe set — the guard is on
    * the SMALL side (queries), unlike [[MaxBruteForceCorpus]]. Per-task
    * state is probes x k x 16 bytes; the broadcast is probes x dims x 8
    * bytes, so at wide embedding dims callers should pass a tighter
    * bound. */
  val MaxExactProbes: Long = 1L * 1000 * 1000

  /** Exact cosine top-k of a PROBE set against a distributed corpus — the
    * scale-path exact search. Where [[bruteForceTopK]] broadcasts the
    * corpus (right for self-kNN on a corpus that fits one machine), this
    * inverts the shape for the 100 TB case: the corpus never leaves its
    * partitions and is streamed ONCE; only the probe set is collected
    * (guarded) and broadcast. Each corpus partition keeps a bounded
    * per-probe top-k (probes x k entries) and emits that many rows; one
    * window over the probes x partitions x k partials merges the global
    * top-k. Total shuffle is O(probes * partitions * k) rows — independent
    * of corpus size.
    *
    * The dot/norm arithmetic is operation-for-operation identical to
    * [[bruteForceTopK]] (raw-value dot, double accumulation in index
    * order, ties broken by neighbor id), so results for a shared query
    * match it row-for-row. Probe rows are excluded from their own
    * neighbor lists by key. */
  def exactTopK(corpus: DataFrame, queries: DataFrame, keyCol: String,
      vecCol: String, k: Int = 5,
      maxQueryRows: Long = MaxExactProbes): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = corpus.sparkSession
    def slim(d: DataFrame): DataFrame = d.select(
      col(keyCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // single-pass overflow guard, like bruteForceTopK's
    val lim = math.min(maxQueryRows, (Int.MaxValue - 1).toLong).toInt
    val qRows = slim(queries).limit(lim + 1).collect()
    require(qRows.length <= maxQueryRows,
      s"exactTopK broadcasts the probe set: more than " +
        s"maxQueryRows=$maxQueryRows probe rows. Pass a smaller probe " +
        "frame, or use lshTopK/ivfTopK for all-pairs search.")
    val probes: Array[(Long, Array[Double], Double)] = qRows.map { r =>
      // a null key/vector would otherwise surface as an opaque NPE deep in
      // the kernel — refuse with the same explicitness as the guards above
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"exactTopK probe frame has a null $keyCol/$vecCol row; " +
          "filter nulls out of the probe frame first")
      val v = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (r.getLong(0), v, math.sqrt(s))
    }.sortBy(_._1)
    // duplicate probe keys would make the global window merge rank the
    // duplicated partials as ONE list (duplicate rows + a dropped true
    // neighbor) — unlike bruteForceTopK, which emits one correct list per
    // probe ROW. Refuse rather than silently diverge from that contract.
    var pi = 1
    while (pi < probes.length) {
      require(probes(pi)._1 != probes(pi - 1)._1,
        s"exactTopK probe keys must be distinct: ${probes(pi)._1} appears " +
          "more than once (dedup the probe frame on the key column first)")
      pi += 1
    }
    val bc = spark.sparkContext.broadcast(probes)
    val partialSchema = StructType(Seq(
      StructField("query", LongType, nullable = false),
      StructField("neighbor", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(partialSchema)
    val partials = slim(corpus).mapPartitions { it =>
      val qs = bc.value
      val nq = qs.length
      // per-probe bounded selection: the same TopSel kernel (and so the
      // same (cosine desc, neighbor asc) rule) as bruteForceTopK's
      val tops = Array.fill(nq)(new TopSel(k))
      it.foreach { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) throw new IllegalArgumentException(
          "exactTopK corpus has a null key/vector row; filter nulls first")
        val cid = r.getLong(0)
        val cv = r.getSeq[Double](1).toArray
        var s = 0.0
        var i = 0
        while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
        val cn = math.sqrt(s)
        var qi = 0
        while (qi < nq) {
          val (qid, q, qn) = qs(qi)
          if (cid != qid) {
            var d = 0.0
            var j = 0
            while (j < q.length) { d += q(j) * cv(j); j += 1 }
            tops(qi).offer(cid, if (qn * cn > 0) d / (qn * cn) else 0.0)
          }
          qi += 1
        }
      }
      (0 until nq).iterator.flatMap { qi =>
        val qid = qs(qi)._1
        val top = tops(qi)
        (0 until top.filled).iterator.map(rk =>
          Row(qid, top.ids(rk), top.cos(rk)))
      }
    }.toDF("query", "neighbor", "cosine")
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor"))
    partials.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query"), col("neighbor"), col("cosine"), col("rank"))
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
    * deterministic sample and refined with `iters` Lloyd steps whose
    * per-partition partial sums run in ONE `mapPartitions` kernel (primitive
    * double loops — no per-row UDF, no per-dimension aggregate expressions,
    * so a 768-dim embedding column compiles the same plan as a 16-dim one).
    * Every vector is assigned to its nearest centroid; queries probe their
    * `nProbe` nearest cells, so the candidate join is |cell| * nProbe per
    * query instead of the full corpus.
    *
    * The 100 TB shape: centroids stay driver-side KBs (nLists * dims * 8B
    * partials per partition — KBs — are the only driver traffic per Lloyd
    * step), assignment is a map, the only data shuffle is the cell-keyed
    * candidate join. The corpus is first hash-repartitioned to a FIXED
    * width (`nPartitions`) and key-sorted so float summation order — and
    * therefore every centroid, assignment, and result row — is identical
    * at any parallelism level. Determinism needs the width FIXED per job,
    * not small: size `nPartitions` to the cluster (it caps Lloyd/assignment
    * parallelism and each task holds corpus/nPartitions rows). */
  def ivfTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, nLists: Int = 16, nProbe: Int = 2, iters: Int = 2,
      nPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keyField = df.schema(keyCol)
    // persisted for the iterative phase: the seed sample, EVERY Lloyd pass,
    // and the final assignment are separate jobs over this frame — uncached,
    // each would re-run the scan + hash shuffle + per-partition sort
    // (iters + 2 full recomputes of the dominant exchange). Unpersisted
    // below once the assignment is materialized.
    val src = df.select(col(keyCol).as("__key"),
        col(vecCol).cast("array<double>").as("__vec"))
      .repartition(nPartitions, col("__key"))
      .sortWithinPartitions("__key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic seed sample: smallest nLists keys by hash
    var centroids: Array[Array[Double]] = src
      .orderBy(xxhash64(col("__key")))
      .limit(nLists)
      .collect()
      .map(_.getSeq[Double](1).toArray)

    // Lloyd refinement: one kernel pass emits (partition, cell, sumVec, n)
    // partials; the driver reduces them in (cell, partition) order — exact
    // same floating-point sequence every run.
    val partialSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("cell", IntegerType, nullable = false),
      StructField("vsum", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("n", LongType, nullable = false)))
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val partials = src.mapPartitions { it =>
        val cs = bc.value
        val dim = if (cs.nonEmpty) cs(0).length else 0
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val ns = new Array[Long](cs.length)
        it.foreach { r =>
          val v = r.getSeq[Double](1).toArray
          val c = nearestCell(cs, v)
          val s = sums(c)
          var i = 0
          while (i < dim) { s(i) += v(i); i += 1 }
          ns(c) += 1
        }
        val pid = TaskContext.getPartitionId()
        Iterator.range(0, cs.length).filter(ns(_) > 0)
          .map(c => Row(pid, c, sums(c).toSeq, ns(c)))
      }(Encoders.row(partialSchema)).collect()
      val next = centroids.map(_.clone())
      partials.groupBy(_.getInt(1)).foreach { case (cell, rows) =>
        val dim = centroids(0).length
        val acc = new Array[Double](dim)
        var n = 0L
        rows.sortBy(_.getInt(0)).foreach { r =>
          val s = r.getSeq[Double](2)
          var i = 0
          while (i < dim) { acc(i) += s(i); i += 1 }
          n += r.getLong(3)
        }
        if (n > 0) next(cell) = acc.map(_ / n)
      }
      centroids = next
    }

    // final pass: one kernel computes the assigned cell, the nProbe probe
    // cells, and the unit vector per row
    val bcF = spark.sparkContext.broadcast(centroids)
    val assignedSchema = StructType(Seq(
      keyField.copy(name = "__key"),
      StructField("__unit", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("__cell", IntegerType, nullable = false),
      StructField("__probes", ArrayType(IntegerType, containsNull = false), nullable = false)))
    // materialized ONCE, eagerly: the result plan references `assigned`
    // twice (corpus side + probe-exploded query side), and a lazy frame
    // would run the whole scan→shuffle→sort→assign chain once per
    // reference. localCheckpoint (not persist) so the blocks are cleaned
    // by the ContextCleaner when the frame is GC'd instead of lingering
    // in the cache manager after the caller is done.
    val assigned = src.mapPartitions { it =>
      val cs = bcF.value
      it.map { r =>
        val key = r.get(0)
        val v = r.getSeq[Double](1).toArray
        val cell = nearestCell(cs, v)
        val probes = nearestCells(cs, v, nProbe)
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(s)
        val unit = if (nrm > 0) v.map(_ / nrm) else new Array[Double](v.length)
        Row(key, unit.toSeq, cell, probes.toSeq)
      }
    }(Encoders.row(assignedSchema)).localCheckpoint(true)
    src.unpersist(false)
    val corpus = assigned.select(col("__cell"), col("__key").as("neighbor"),
      col("__unit").as("unitB"))
    val queries = assigned.select(col("__key").as("query"),
      col("__unit").as("unitA"), explode(col("__probes")).as("__cell"))
    val scored = queries.join(corpus, Seq("__cell"))
      .where(col("query") =!= col("neighbor"))
      .withColumn("cosine", dot(col("unitA"), col("unitB")))
      .select("query", "neighbor", "cosine")
      .dropDuplicates("query", "neighbor") // a pair can meet in 2 probed cells
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
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

  /** The measured planes-sizing rule for [[lshTopK]] (AnnScaleProbe,
    * BENCH.md round 5): per-table candidate volume is ~n²(1+probes)/2^planes,
    * so buckets must track corpus size — planes = log2(n / targetBucket)
    * with targetBucket ~10-50. At 200k vectors, planes 10 → 14 cut wall 9x
    * for 3.5 recall points. The bench-table operating point (planes=5 at
    * 2k rows) is an instance of this rule, not a constant to carry. */
  def lshPlanesFor(corpusRows: Long, targetBucket: Int = 32): Int = {
    require(corpusRows > 0 && targetBucket > 0,
      s"corpusRows=$corpusRows targetBucket=$targetBucket")
    math.max(4, math.ceil(
      math.log(corpusRows.toDouble / targetBucket) / math.log(2)).toInt)
  }

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

  /** Scale-path ANN: MULTI-TABLE, MULTI-PROBE hyperplane LSH — `tables`
    * independent plane sets, candidates unioned across tables, then exact
    * top-k per query over the candidate set. Single-table sign-LSH recall
    * was ~5% on near-uniform embeddings (round-1 measurement); multi-table
    * is the standard recall lever, and `probes` adds the second standard
    * lever (multi-probe LSH, Lv et al. 2007 — public algorithm): each
    * QUERY row additionally probes the `probes` 1-bit-neighbor buckets
    * whose sign margins |dot| are smallest — exactly the flips most likely
    * to separate a true neighbor — for (1+probes)x query-side rows instead
    * of the ~2^probes x cost of more tables at equal recall.
    *
    * Shape: one explode (x tables x (1+probes)), join only within
    * (table, bucket), never quadratic. The bucket join and candidate dedup
    * carry keys only; unit vectors are joined back once per surviving pair
    * (one dot per pair). Probe rows live on the QUERY side only (the
    * asymmetric-join trick of [[Dedup.simhashPairs]]): a true pair always
    * meets through (probeA-or-exactA, exactB), so the neighbor side stays
    * exact rows and probe x probe never joins. Only the NEIGHBOR side of
    * a bucket is bounded at `maxBucket` members (generous 4096 default): a
    * hot bucket of size N yields N x maxBucket candidate pairs instead of
    * N^2, but every key still rides the query side uncapped, so no query
    * can vanish from the output — capping trades neighbor recall only. */
  def lshTopK(df: DataFrame, keyCol: String, vecCol: String,
      k: Int = 5, planes: Int = 8, tables: Int = 8,
      maxBucket: Int = 4096, probes: Int = 2): DataFrame = {
    require(probes >= 0 && probes <= planes, s"probes $probes of $planes")
    val v = col(vecCol)
    val idx = sequence(lit(0), size(v) - 1)
    // The hyperplane dots feed the bucket, the probe margins, AND every
    // probe row's flipped bucket — 2 + 2*probes syntactic occurrences per
    // table. Catalyst's subexpression elimination skips lambda-bearing
    // expressions (aggregate/zip_with carry LambdaVariables), so inlining
    // the dot expression everywhere re-evaluates the full projection per
    // occurrence. Instead: materialize all tables' dots ONCE through an
    // intermediate projection and derive everything downstream from cheap
    // array lookups. CollapseProject will not inline a non-cheap alias
    // that is referenced more than once, so the two selects stay separate
    // and each dot is computed exactly once per input row.
    val dotsCol = array((0 until tables).map { t =>
      array((0 until planes).map { p =>
        aggregate(zip_with(v, idx, (x, i) => x * planeComponent(t, p, i)),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*)
    val bucketStructs = (0 until tables).flatMap { t =>
      val dots = (0 until planes).map(p =>
        col("__dots").getItem(t).getItem(p))
      val bucket = dots.zipWithIndex.map { case (d, p) =>
        when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      val exact = struct(lit(t).as("tbl"), bucket.as("bucket"),
        lit(true).as("ex"))
      val probeRows =
        if (probes == 0) Nil
        else {
          // margin-ordered single-bit flips: sort planes by |dot| asc
          // (ties by bit mask — array_sort's struct order, deterministic),
          // flip the `probes` narrowest margins. Masks are plan-time
          // literals (1L << p), so no runtime shift-by-column is needed.
          val margins = array(dots.zipWithIndex.map { case (d, p) =>
            struct(abs(d).as("m"), lit(1L << p).as("mask"))
          }: _*)
          val flips = slice(array_sort(margins), 1, probes)
          (0 until probes).map { j =>
            val mask = element_at(flips, j + 1).getField("mask")
            struct(lit(t).as("tbl"),
              bucket.bitwiseXOR(mask).as("bucket"),
              lit(false).as("ex"))
          }
        }
      exact +: probeRows
    }
    // materialize the banded frame's shuffle ONCE: the explicit repartition
    // on (tbl, bucket) gives both join sides a canonically identical
    // Exchange subtree, so the planner substitutes a ReusedExchange for the
    // second — the `tables`-way hyperplane projection is computed and
    // shuffled exactly once. (A shared Window frame does NOT achieve this:
    // the query side never references the rank, ColumnPruning deletes the
    // Window from that side, and the subtrees diverge again.) The join keys
    // equal the repartition keys, so neither side shuffles a second time;
    // only the neighbor side pays the cap's within-partition sort.
    val banded = df.select(col(keyCol).as("__key"), dotsCol.as("__dots"))
      .select(col("__key"), explode(array(bucketStructs: _*)).as("tb"))
      .select(col("__key"), col("tb.tbl"), col("tb.bucket"), col("tb.ex"))
      .repartition(col("tbl"), col("bucket"))
    val a = banded.select(col("tbl"), col("bucket"), col("__key").as("query"))
    val b = Dedup.capBuckets(banded.where(col("ex")),
        Seq("tbl", "bucket"), "__key", maxBucket)
      .select(col("tbl"), col("bucket"), col("__key").as("neighbor"))
    val cand = a.join(b, Seq("tbl", "bucket"))
      .where(col("query") =!= col("neighbor"))
      .select("query", "neighbor")
      .dropDuplicates("query", "neighbor") // union of candidate sets
    val unit = df.withColumn("__norm", norm(v))
      .select(col(keyCol).as("__key"),
        transform(v, x =>
          when(col("__norm") > 0, x / col("__norm")).otherwise(lit(0.0)))
          .as("__unit"))
    val scored = cand
      .join(unit.select(col("__key").as("query"), col("__unit").as("unitA")), "query")
      .join(unit.select(col("__key").as("neighbor"), col("__unit").as("unitB")), "neighbor")
      .withColumn("cosine", dot(col("unitA"), col("unitB")))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("cosine").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query", "neighbor", "cosine", "rank")
  }
}
