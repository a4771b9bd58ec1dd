package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for web-scale corpora. Every variant is a pure
  * DataFrame transformation: the heavy lifting is hash-shuffle groupBys and
  * band-bucket self-joins, which Spark distributes and AQE skew-handles.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on a 64-bit hash;
  * MinHash-LSH shuffles only (docId, bandHash) pairs — `bands * rows` small
  * rows, never full text; candidate verification joins only within buckets.
  */
object Dedup {

  /** Exact dedup on a content fingerprint: keeps the first row (smallest
    * key) per fingerprint. One shuffle on the 64-bit fingerprint. */
  def exact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol))).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature as `numHashes` min-values over shingles. The string
    * shingles are hashed ONCE (string xxhash64 is the expensive part); the
    * hash family is then derived by re-hashing that 8-byte value with the
    * seed — the standard one-base-hash MinHash construction. Shingles and
    * base hashes are materialized as real columns so the optimizer can
    * never re-derive the shingling per hash function.
    * Returns the input plus a `minhash` array<bigint> column. */
  def minhashSignature(df: DataFrame, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 5): DataFrame = {
    val baseHashes = transform(TextOps.wordShingles(col(textCol), shingleSize),
      s => xxhash64(s))
    val sig = array((0 until numHashes).map { i =>
      array_min(transform(col("__mh_base"), x => xxhash64(x, lit(i))))
    }: _*)
    df.withColumn("__mh_base", baseHashes)
      .withColumn("minhash", sig)
      .drop("__mh_base")
  }

  /** MinHash + LSH banding: documents sharing any band bucket become
    * candidate pairs; pairs are scored by signature agreement (an unbiased
    * Jaccard estimate) and filtered at `threshold`.
    *
    * Returns (keyA, keyB, estJaccard) with keyA < keyB.
    */
  def minhashLsh(df: DataFrame, keyCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = minhashSignature(df, textCol, numHashes)
      .select(col(keyCol).as("__key"), col("minhash"))
    val banded = withSig.select(col("__key"), col("minhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("__key"), col("minhash"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("__key").as("keyA"), col("minhash").as("sigA"))
    val b = banded.select(col("band"), col("bucket"),
      col("__key").as("keyB"), col("minhash").as("sigB"))
    a.join(b, Seq("band", "bucket"))
      .where(col("keyA") < col("keyB"))
      .select(col("keyA"), col("keyB"),
        (size(filter(zip_with(col("sigA"), col("sigB"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") /
          lit(numHashes.toDouble)).as("estJaccard"))
      .where(col("estJaccard") >= threshold)
      .dropDuplicates("keyA", "keyB")
  }

  /** 64-bit SimHash over word tokens: per-bit weighted majority vote,
    * expressed as 64 codegen'd aggregate-free array ops (no shuffle beyond
    * what the caller adds). Returns input + `simhash` bigint column. */
  def simhash(df: DataFrame, textCol: String): DataFrame = {
    val tokens = split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    // materialize token hashes once; the 64 per-bit votes then read the
    // array column instead of re-deriving split+hash per bit
    val bitCols = (0 until 64).map { bit =>
      val votes = aggregate(col("__sh_hashes"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    df.withColumn("__sh_hashes", transform(tokens, t => xxhash64(t)))
      .withColumn("simhash", bitCols.reduce(_.bitwiseOR(_)))
      .drop("__sh_hashes")
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, blocked with
    * FOUR tables — one per disjoint 16-bit segment of the hash. Pigeonhole:
    * a pair with hamming distance < 4 must agree EXACTLY on ≥ 1 of the 4
    * segments, so blocking has full recall at the default maxDist = 3
    * (round 1 blocked on the top 16 bits only, silently missing every pair
    * whose differing bits lived in bits 48-63). One extra explode (4 rows
    * per doc), still never quadratic: the self-join stays within (table,
    * segment) buckets. */
  def simhashNearDups(df: DataFrame, keyCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    simhashPairs(
      simhash(df, textCol).select(col(keyCol).as("__key"), col("simhash")),
      maxDist)

  /** Blocked pair join over a precomputed (__key, simhash) frame — split
    * out so tests can plant hash values (e.g. top-bit flips) directly. */
  private[graft] def simhashPairs(withSim: DataFrame, maxDist: Int): DataFrame = {
    val banded = withSim.select(col("__key"), col("simhash"),
      explode(array((0 until 4).map { t =>
        struct(lit(t).as("tbl"),
          shiftrightunsigned(col("simhash"), 16 * t)
            .bitwiseAND(lit(0xFFFFL)).as("seg"))
      }: _*)).as("b"))
      .select(col("__key"), col("simhash"), col("b.tbl"), col("b.seg"))
    val a = banded.select(col("tbl"), col("seg"),
      col("__key").as("keyA"), col("simhash").as("simA"))
    val b = banded.select(col("tbl"), col("seg"),
      col("__key").as("keyB"), col("simhash").as("simB"))
    a.join(b, Seq("tbl", "seg")).where(col("keyA") < col("keyB"))
      .withColumn("dist", bit_count(col("simA").bitwiseXOR(col("simB"))))
      .where(col("dist") <= maxDist)
      .select("keyA", "keyB", "dist")
      .dropDuplicates("keyA", "keyB")
  }

  /** EXACT n-gram Jaccard similarity join at threshold `threshold`, within
    * optional `blockCols` partitions (e.g. lang), via prefix filtering —
    * verified property: identical output to brute-force all-pairs. */
  def ngramJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // Exact prefix-filtered set-similarity join (the All-Pairs/PPJoin
    // candidate rule): order every document's shingle hashes globally
    // (ascending 64-bit hash); two sets with jaccard >= t MUST share at
    // least one element within each one's first (n - ceil(t*n) + 1)
    // elements. Exploding only those prefix hashes makes the candidate
    // join linear in "documents x prefix", never quadratic in block size;
    // the exact jaccard then verifies candidates only. Everything is one
    // hash-join shuffle + one aggregation — the shape that survives 100 TB.
    val withSh = df.select(
      (blockCols.map(col) :+ col(keyCol).as("__key") :+
        array_sort(transform(TextOps.wordShingles(col(textCol), n),
          s => xxhash64(s))).as("__sh")): _*)
      .withColumn("__n", size(col("__sh")))
      .withColumn("__plen",
        (col("__n") - ceil(col("__n") * threshold) + 1).cast("int"))
    val a = withSh.select((blockCols.map(col) :+ col("__key").as("keyA") :+
      col("__sh").as("shA") :+ col("__n").as("nA") :+
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p")): _*)
    val b = withSh.select((blockCols.map(col) :+ col("__key").as("keyB") :+
      col("__sh").as("shB") :+ col("__n").as("nB") :+
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p")): _*)
    a.join(b, blockCols :+ "__p")
      .where(col("keyA") < col("keyB") &&
        col("nA") >= col("nB") * threshold && col("nB") >= col("nA") * threshold)
      .select("keyA", "keyB", "shA", "shB", "nA", "nB")
      .dropDuplicates("keyA", "keyB")
      // union size is |A|+|B|-|A∩B| (array_union never built)
      .withColumn("__inter", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("nA") + col("nB") - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("keyA", "keyB", "jaccard")
  }

  /** Embedding-cosine near-duplicates via the LSH bucketing in
    * [[Similarity.cosineLshBuckets]]: pairs in the same hyperplane-sign
    * bucket with cosine ≥ threshold. */
  def embeddingNearDups(df: DataFrame, keyCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12): DataFrame = {
    val bucketed = Similarity.cosineLshBuckets(df, vecCol, planes)
      .withColumn("__norm", Similarity.norm(col(vecCol)))
      .select(col(keyCol).as("__key"), col("lshBucket"),
        transform(col(vecCol), x =>
          when(col("__norm") > 0, x / col("__norm")).otherwise(lit(0.0)))
          .as("__unit"))
    val a = bucketed.select(col("lshBucket"), col("__key").as("keyA"), col("__unit").as("unitA"))
    val b = bucketed.select(col("lshBucket"), col("__key").as("keyB"), col("__unit").as("unitB"))
    a.join(b, Seq("lshBucket")).where(col("keyA") < col("keyB"))
      .withColumn("cosine", Similarity.dot(col("unitA"), col("unitB")))
      .where(col("cosine") >= threshold)
      .select("keyA", "keyB", "cosine")
      .dropDuplicates("keyA", "keyB")
  }
}
