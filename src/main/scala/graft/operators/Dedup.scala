package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for web-scale corpora. Every variant is a pure
  * DataFrame transformation: the heavy lifting is hash-shuffle groupBys and
  * band-bucket self-joins, which Spark distributes and AQE skew-handles.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on a 64-bit hash;
  * MinHash-LSH shuffles only (docId, bandHash) pairs — `bands * rows` small
  * rows, never full text. Candidate pairs are deduplicated on the KEY PAIR
  * alone before any signature/shingle/vector payload is joined back, so the
  * candidate-dedup exchange moves O(pairs * 16 bytes), not
  * O(pairs * payload). Every bucket join is bounded by [[DefaultMaxBucket]]:
  * a degenerate bucket (millions of empty/boilerplate docs sharing a
  * signature) self-joins only among its `maxBucket` smallest keys, and all
  * further members pair against the bucket's anchor (linear, not quadratic —
  * see [[candidatePairs]]); [[cappedBucketCount]] surfaces how many buckets
  * exceeded the bound.
  */
object Dedup {

  /** Default per-bucket membership bound for LSH-style blocking joins.
    * A bucket of b members emits b^2 candidate pairs; 1024 caps any single
    * bucket at ~1M pairs — one task's worth — while normal buckets (a few
    * members) are untouched. */
  val DefaultMaxBucket: Int = 1024

  /** Keeps the `maxBucket` smallest keys per bucket (deterministic at any
    * parallelism). The window shuffles on the bucket columns — the same
    * partitioning the candidate self-join needs next, so the exchange is
    * reused, not added. `maxBucket <= 0` disables the cap. */
  private[operators] def capBuckets(banded: DataFrame, bucketCols: Seq[String],
      keyCol: String, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      val w = Window.partitionBy(bucketCols.map(col): _*).orderBy(col(keyCol))
      banded.withColumn("__bn", row_number().over(w))
        .where(col("__bn") <= maxBucket).drop("__bn")
    }

  /** Number of buckets whose membership exceeds `maxBucket` — the count of
    * buckets [[capBuckets]] truncated. Surfaced so pipelines can alert on
    * lost recall instead of silently dropping pairs. */
  def cappedBucketCount(banded: DataFrame, bucketCols: Seq[String],
      maxBucket: Int): Long =
    banded.groupBy(bucketCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket).count()

  /** Deduplicated candidate key pairs (keyA < keyB) from a bucket self-join,
    * bounded per bucket: the `maxBucket` smallest keys self-join in full
    * (≤ maxBucket² pairs — one task's worth), and every member PAST the cap
    * still pairs with the bucket's smallest key (the anchor) at linear cost.
    * Without the anchor leg, a degenerate bucket (thousands of identical
    * boilerplate docs — exactly where duplicates concentrate) would have its
    * overflow members silently dropped from ALL candidates; with it, every
    * overflow member reaches the downstream exact verify against a doc that
    * shares its bucket, so keep-first dedup still collapses identical
    * floods. Pairs between two overflow members are still skipped (that is
    * the quadratic part) — [[cappedBucketCount]] on the same banded frame
    * reports how many buckets took that recall haircut.
    *
    * Plan shape: all four references (head a/b, anchor, overflow) filter on
    * the rank column of one identical Window-over-Exchange subtree, so the
    * bucket shuffle is planned once and reused (pinned in PlanSpec); the
    * joins' equi-keys equal the window partition keys, adding no exchange.
    * Only the slim (keyA, keyB) union re-shuffles for the dedup.
    *
    * KEEP IN SYNC: [[simhashPairs]]' capped branch runs the same
    * window/cap/anchor pattern with two extra ingredients this helper
    * cannot host without giving every caller payload columns it must not
    * shuffle — per-row simhash values for map-side verification and the
    * exact-side asymmetry. A change to cap semantics here (ordering,
    * anchor leg, rank filter) almost certainly applies there too. */
  private[operators] def candidatePairs(banded: DataFrame,
      bucketCols: Seq[String], keyCol: String, maxBucket: Int): DataFrame = {
    val bc = bucketCols.map(col)
    val pairs =
      if (maxBucket <= 0) {
        val a = banded.select((bc :+ col(keyCol).as("keyA")): _*)
        val b = banded.select((bc :+ col(keyCol).as("keyB")): _*)
        a.join(b, bucketCols).where(col("keyA") < col("keyB"))
      } else {
        val w = Window.partitionBy(bc: _*).orderBy(col(keyCol))
        val ranked = banded.withColumn("__bn", row_number().over(w))
        val a = ranked.select((bc :+ col("__bn").as("__bnA") :+
          col(keyCol).as("keyA")): _*)
        val b = ranked.select((bc :+ col("__bn").as("__bnB") :+
          col(keyCol).as("keyB")): _*)
        val head = a.where(col("__bnA") <= maxBucket)
          .join(b.where(col("__bnB") <= maxBucket), bucketCols)
          .where(col("keyA") < col("keyB"))
        // anchor key is the bucket minimum, so keyA < keyB holds by rank
        val anchored = a.where(col("__bnA") === 1)
          .join(b.where(col("__bnB") > maxBucket), bucketCols)
        head.select("keyA", "keyB").unionByName(anchored.select("keyA", "keyB"))
      }
    pairs.select("keyA", "keyB").dropDuplicates("keyA", "keyB")
  }

  /** Exact dedup on a content fingerprint: keeps the first row (smallest
    * key) per fingerprint. One shuffle on the 64-bit fingerprint. */
  def exact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
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
    // one-pass custom Expression: bit-identical to
    //   array((0 until n).map(i => array_min(transform(base, xxhash64(_, i)))))
    // but without the n short-lived arrays per row that form allocates
    // (~100 KB/row at n=64 on a 200-shingle doc) — see MinHashSig's scaladoc
    df.withColumn("__mh_base", baseHashes)
      .withColumn("minhash",
        graft.functions.MinHashSig(col("__mh_base"), numHashes))
      .drop("__mh_base")
  }

  /** MinHash + LSH banding: documents sharing any band bucket become
    * candidate pairs; pairs are scored by signature agreement (an unbiased
    * Jaccard estimate) and filtered at `threshold`.
    *
    * Plan shape: the banded frame carries (key, band, bucket) ONLY — 64-long
    * signatures never ride the bucket join or the candidate dedup. Pairs are
    * deduplicated on (keyA, keyB) first; the two signatures are joined back
    * once per surviving pair for the estimate.
    *
    * Returns (keyA, keyB, estJaccard) with keyA < keyB.
    */
  def minhashLsh(df: DataFrame, keyCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    minhashLshFromSig(
      // materialized ONCE, eagerly (the ivfTopK localCheckpoint
      // precedent): the signature frame feeds three exchanges (banding +
      // both payload join-backs), and a lazy subtree would re-run the
      // scan + shingling + hashing — the dominant cost — once per
      // exchange (measured 3x wall on a single-partition 50k corpus).
      // localCheckpoint (not persist) so the blocks die with the RDD
      // instead of lingering in the cache manager. TWO consequences the
      // caller must know: (1) calling minhashLsh launches the
      // scan+shingle+hash job NOW, not at first action; (2) localCheckpoint
      // truncates lineage, so on a multi-executor cluster a lost executor
      // fails the job instead of recomputing its blocks. Callers on real
      // clusters who need recompute-on-loss (or lazy construction) should
      // build the signature frame themselves, persist it with the storage
      // level and replication their fault model wants, and call
      // minhashLshFromSig.
      minhashSignature(df, textCol, numHashes)
        .select(col(keyCol).as("__key"), col("minhash"))
        .localCheckpoint(true),
      numHashes, bands, threshold, maxBucket)

  /** [[minhashLsh]] over a precomputed (__key, minhash) frame. The
    * signature frame is referenced three times (banding + both payload
    * join-backs); callers that persist it pay the shingle+hash cost once
    * instead of three times. */
  def minhashLshFromSig(withSig: DataFrame,
      numHashes: Int, bands: Int, threshold: Double,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // bands must tile the signature exactly: bands > numHashes degenerates
    // every band to ONE corpus-wide bucket (empty slice), a non-dividing
    // count silently drops trailing hashes from banding — both are recall
    // bugs the caller can't see, so reject loudly
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val pairs = candidatePairs(minhashBands(withSig, bands, numHashes / bands),
      Seq("band", "bucket"), "__key", maxBucket)
    pairs
      .join(withSig.select(col("__key").as("keyA"), col("minhash").as("sigA")), "keyA")
      .join(withSig.select(col("__key").as("keyB"), col("minhash").as("sigB")), "keyB")
      .select(col("keyA"), col("keyB"),
        (size(filter(zip_with(col("sigA"), col("sigB"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") /
          lit(numHashes.toDouble)).as("estJaccard"))
      .where(col("estJaccard") >= threshold)
  }

  /** LSH band buckets for a (__key, minhash) frame: one (band, bucket) row
    * per band. Exposed so callers can inspect bucket-size distributions
    * (e.g. [[cappedBucketCount]]) on the exact frame the join uses. */
  private[graft] def minhashBands(withSig: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    withSig.select(col("__key"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("__key"), col("bb.band"), col("bb.bucket"))

  /** 64-bit SimHash over word tokens: per-bit weighted majority vote in ONE
    * pass over the token hashes via the codegen'd
    * [[graft.functions.SimHashSig]] expression (the composed-builtin form —
    * 64 separate `aggregate` bit votes — re-walked the hash array once per
    * bit; bit-identical parity is pinned in the suite). The `coalesce`
    * preserves the composed form's null-text semantics (simhash 0, not
    * null). No shuffle beyond what the caller adds. Returns input +
    * `simhash` bigint column. */
  def simhash(df: DataFrame, textCol: String): DataFrame = {
    val tokens = split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    df.withColumn("simhash",
      coalesce(graft.functions.SimHashSig(transform(tokens, t => xxhash64(t))),
        lit(0L)))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, blocked with
    * [[simhashSegments]] disjoint bit segments — exact-match segments for
    * maxDist <= 3, the HmSearch 1-bit-variant scheme for maxDist >= 4
    * (round 2 hard-coded 4 exact segments, silently losing recall for
    * maxDist > 3; round 3's maxDist+1 exact segments were full-recall but
    * left segments only 64/(d+1) bits wide — at d=8, 7-bit segments put
    * 45% of the sf0.1 corpus in ONE bucket). Blocking has FULL recall at
    * the requested distance and is never quadratic: the join stays within
    * (segment-table, segment-value) buckets. */
  def simhashNearDups(df: DataFrame, keyCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame =
    simhashPairs(
      simhash(df, textCol).select(col(keyCol).as("__key"), col("simhash")),
      maxDist, maxBucket)

  /** Number of disjoint bit segments [[simhashBands]] blocks on for a given
    * distance. `maxDist <= 3` uses maxDist+1 segments with EXACT-match
    * blocking (a pair within distance d cannot differ in all d+1 segments —
    * and at d <= 3 the exact segments are still >= 16 bits wide, so they
    * keep their selectivity while emitting only d+1 banded rows per doc,
    * vs 64+m for the variant scheme); `maxDist >= 4` switches to the
    * HmSearch scheme — floor(d/2)+1 segments where the witness segment may
    * carry ONE differing bit, covered by enumerating 1-bit variants.
    * Pigeonhole both ways: with m = floor(d/2)+1 segments, all segments
    * carrying >= 2 errors would total 2m > d.
    *
    * Why variants: fewer, WIDER segments. At d=8 exact-match needs nine
    * 7-bit segments (128 distinct values — bucket sizes ~n/128, candidate
    * pairs ~n^2*(d+1)/2^7); HmSearch blocks on five ~13-bit segments
    * (8192 values), shrinking expected candidates by ~2^6 at the price of
    * 64+m banded rows per doc instead of d+1. Candidate verification is the
    * quadratic term at corpus scale, banded rows the linear one — the trade
    * is the right direction at any n; on the sf0.1 documents table (whose
    * templated texts skew segment values — one 7-bit bucket held 45% of
    * all docs) the scheme switch plus map-side verification cut the
    * blocked-pair phase 3x. */
  private[graft] def simhashSegments(maxDist: Int): Int =
    if (maxDist <= 3) maxDist + 1 else maxDist / 2 + 1

  /** Segment-blocking frame for [[simhashPairs]]: (__key, tbl, seg, ex)
    * rows — for every [[simhashSegments]] disjoint bit segment, one `ex =
    * true` row with the segment's value and (for maxDist >= 4, where a
    * witness segment may differ by one bit) `width` ex = false rows with
    * each single bit flipped. A doc contributes at most ONE row per
    * (tbl, seg) bucket: its exact row if the segment equals the bucket
    * value, else the unique 1-flip variant. Exposed so callers can measure
    * bucket-size distributions ([[cappedBucketCount]]) on the exact frame
    * the pair join uses. */
  private[graft] def simhashBands(withSim: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist must be in [0, 15] (got $maxDist): blocking needs " +
        "segments of >= 4 bits to have any selectivity")
    val segs = simhashSegments(maxDist)
    val withVariants = maxDist >= 4
    val segCols = (0 until segs).flatMap { t =>
      val lo = t * 64 / segs
      val width = (t + 1) * 64 / segs - lo
      val v = if (segs == 1) col("simhash")
        else shiftrightunsigned(col("simhash"), lo)
          .bitwiseAND(lit((1L << width) - 1))
      val exact = struct(lit(t).as("tbl"), v.as("seg"), lit(true).as("ex"))
      val variants =
        if (!withVariants) Nil
        else (0 until width).map { b =>
          struct(lit(t).as("tbl"), v.bitwiseXOR(lit(1L << b)).as("seg"),
            lit(false).as("ex"))
        }
      exact +: variants
    }
    // the simhash value itself rides along (8 bytes — unlike minhash
    // signatures or shingle sets, it IS the whole payload): the pair join
    // can then verify hamming distance MAP-SIDE, before any exchange
    withSim.select(col("__key"), col("simhash"),
        explode(array(segCols: _*)).as("b"))
      .select(col("__key"), col("simhash"), col("b.tbl"), col("b.seg"),
        col("b.ex"))
  }

  /** Blocked pair join over a precomputed (__key, simhash) frame — split
    * out so tests can plant hash values (e.g. top-bit flips) directly.
    * [[simhashSegments]] segments (1-bit variants enumerated for
    * maxDist >= 4 — the HmSearch scheme), so by pigeonhole recall is FULL
    * at the requested distance AS LONG AS no segment bucket exceeds the
    * cap: past it, overflow members still pair with the bucket anchor (so
    * identical floods dedup) but overflow↔overflow pairs can be missed —
    * check [[cappedBucketCount]] on [[simhashBands]] (the q_simhash oracle
    * pins it at zero) or pass maxBucket <= 0 for unconditional exactness.
    *
    * Unlike the minhash/jaccard/embedding candidate joins (whose payloads
    * are KB-sized and therefore join back only after a key-only dedup),
    * the 8-byte simhash rides the bucket join itself, and the hamming
    * verification runs MAP-SIDE inside the join stage: over-distance
    * candidates die before any row reaches the pair-dedup exchange, which
    * then carries only true pairs (each at most once per witness bucket —
    * ≤ 2·segments occurrences) instead of every bucket collision. On the
    * sf0.1 documents table (dense near-dup structure: 4.5M distinct
    * candidate pairs, 92k true) this cut the pair phase 6.2s -> 2.0s.
    *
    * For maxDist >= 4 the join is ASYMMETRIC (HmSearch): the a-side keeps
    * only `ex = true` rows (a doc's own segment values), the b-side all
    * rows. A true pair's witness segment always yields an (exactA, exactB)
    * or (exactA, variantB) match, so the variant x variant cross product
    * (0- or 2-bit in-segment differences — either exact-witnessed anyway
    * or over-distance) is skipped. Exact rows rank FIRST in the capped
    * window, so a bucket's rank-1 anchor is exact whenever the bucket
    * holds any exact row; variant-only buckets emit nothing. */
  private[graft] def simhashPairs(withSim: DataFrame, maxDist: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val banded = simhashBands(withSim, maxDist)
    val asym = maxDist >= 4
    def legA(d: DataFrame): DataFrame = if (asym) d.where(col("ex")) else d
    // canonical ordering: free with the symmetric self-join; least/greatest
    // with the asymmetric one (an (exactA, variantB) witness carries no
    // key-order guarantee)
    def verify(joined: DataFrame): DataFrame = {
      val dist = bit_count(col("simA").bitwiseXOR(col("simB")))
      val base = joined.withColumn("dist", dist).where(col("dist") <= maxDist)
      (if (asym)
        base.where(col("keyA") =!= col("keyB"))
          .select(least(col("keyA"), col("keyB")).as("keyA"),
            greatest(col("keyA"), col("keyB")).as("keyB"), col("dist"))
      else base.where(col("keyA") < col("keyB")))
        .select("keyA", "keyB", "dist")
    }
    val pairs =
      if (maxBucket <= 0) {
        val a = legA(banded).select(col("tbl"), col("seg"),
          col("__key").as("keyA"), col("simhash").as("simA"))
        val b = banded.select(col("tbl"), col("seg"),
          col("__key").as("keyB"), col("simhash").as("simB"))
        verify(a.join(b, Seq("tbl", "seg")))
      } else {
        val ord = (if (asym) Seq(col("ex").desc) else Nil) :+ col("__key")
        val w = Window.partitionBy(col("tbl"), col("seg")).orderBy(ord: _*)
        val ranked = banded.withColumn("__bn", row_number().over(w))
        val a = legA(ranked).select(col("tbl"), col("seg"),
          col("__bn").as("__bnA"), col("__key").as("keyA"),
          col("simhash").as("simA"))
        val b = ranked.select(col("tbl"), col("seg"),
          col("__bn").as("__bnB"), col("__key").as("keyB"),
          col("simhash").as("simB"))
        val head = verify(a.where(col("__bnA") <= maxBucket)
          .join(b.where(col("__bnB") <= maxBucket), Seq("tbl", "seg")))
        val anchored = verify(a.where(col("__bnA") === 1)
          .join(b.where(col("__bnB") > maxBucket), Seq("tbl", "seg")))
        head.unionByName(anchored)
      }
    // dist is a pure function of the pair, so which duplicate survives is
    // immaterial — the dedup carries 16-byte keys + 4-byte dist only
    pairs.dropDuplicates("keyA", "keyB")
  }

  /** EXACT n-gram Jaccard similarity join at threshold `threshold`, within
    * optional `blockCols` partitions (e.g. lang), via prefix filtering —
    * verified property: identical output to brute-force all-pairs. */
  def ngramJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3, threshold: Double = 0.5): DataFrame =
    ngramJaccardFromSets(
      df.select((blockCols.map(col) :+ col(keyCol).as("__key") :+
        array_sort(transform(TextOps.wordShingles(col(textCol), n),
          s => xxhash64(s))).as("__sh")): _*),
      blockCols, threshold)

  /** [[ngramJaccardPairs]] over a precomputed (blockCols..., __key,
    * __sh sorted-hash-set) frame. The set frame is referenced four times
    * (both prefix explodes + both payload join-backs); callers that
    * persist it pay the shingle+hash+sort cost once instead of four
    * times. */
  def ngramJaccardFromSets(withSets: DataFrame, blockCols: Seq[String],
      threshold: Double): DataFrame = {
    // Exact prefix-filtered set-similarity join (the All-Pairs/PPJoin
    // candidate rule): order every document's shingle hashes globally
    // (ascending 64-bit hash); two sets with jaccard >= t MUST share at
    // least one element within each one's first (n - ceil(t*n) + 1)
    // elements. Exploding only those prefix hashes makes the candidate
    // join linear in "documents x prefix", never quadratic in block size.
    // The candidate join and pair-dedup carry keys and set SIZES only; the
    // two shingle arrays are joined back once per surviving pair for the
    // exact-jaccard verification.
    // One explicit exchange on (block, key) that every consumer shares:
    // the shingle frame is referenced FOUR times (both exploded candidate
    // sides + both payload join-backs), and without a common shuffle
    // boundary Spark recomputes the full shingle projection (read +
    // shingle + hash + sort) once per reference. Renames happen ABOVE the
    // exchange, so all four subtrees canonicalize to the same Exchange and
    // reuse it (same pattern as lshTopK's banded frame). As a bonus the
    // payload joins' withSh side arrives already partitioned on its join
    // keys (blockCols, key), so only the slim pairs side re-shuffles.
    // __n/__plen are derived ABOVE the exchange so every consumer prunes to
    // the identical (blockCols, __key, __sh) set below it — a consumer that
    // pruned differently would make the subtrees non-identical and kill the
    // reuse (pinned in PlanSpec)
    val withSh = withSets
      .repartition((blockCols.map(col) :+ col("__key")): _*)
      .withColumn("__n", size(col("__sh")))
      .withColumn("__plen",
        (col("__n") - ceil(col("__n") * threshold) + 1).cast("int"))
    val a = withSh.select((blockCols.map(col) :+ col("__key").as("keyA") :+
      col("__n").as("nA") :+
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p")): _*)
    val b = withSh.select((blockCols.map(col) :+ col("__key").as("keyB") :+
      col("__n").as("nB") :+
      explode(slice(col("__sh"), lit(1), col("__plen"))).as("__p")): _*)
    // blockCols stay on the pair through dedup and the payload join-backs:
    // keys need only be unique WITHIN a block (that is blockCols' contract),
    // so a bare-key join-back could pick up the same key's row from another
    // block and verify against the wrong shingle set
    val pairs = a.join(b, blockCols :+ "__p")
      .where(col("keyA") < col("keyB") &&
        col("nA") >= col("nB") * threshold && col("nB") >= col("nA") * threshold)
      .select((blockCols.map(col) :+ col("keyA") :+ col("keyB")): _*)
      .dropDuplicates(blockCols :+ "keyA" :+ "keyB")
    pairs
      .join(withSh.select((blockCols.map(col) :+ col("__key").as("keyA") :+
        col("__sh").as("shA") :+ col("__n").as("nA")): _*),
        blockCols :+ "keyA")
      .join(withSh.select((blockCols.map(col) :+ col("__key").as("keyB") :+
        col("__sh").as("shB") :+ col("__n").as("nB")): _*),
        blockCols :+ "keyB")
      // union size is |A|+|B|-|A∩B| (array_union never built)
      .withColumn("__inter", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("nA") + col("nB") - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("keyA", "keyB", "jaccard")
  }

  /** Embedding-cosine near-duplicates via the LSH bucketing in
    * [[Similarity.cosineLshBuckets]]: pairs in the same hyperplane-sign
    * bucket with cosine ≥ threshold. Bucket join carries keys only; unit
    * vectors are joined back once per deduplicated candidate pair. */
  def embeddingNearDups(df: DataFrame, keyCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val pairs = candidatePairs(
      Similarity.cosineLshBuckets(df, vecCol, planes)
        .select(col(keyCol).as("__key"), col("lshBucket")),
      Seq("lshBucket"), "__key", maxBucket)
    val unit = df.withColumn("__norm", Similarity.norm(col(vecCol)))
      .select(col(keyCol).as("__key"),
        transform(col(vecCol), x =>
          when(col("__norm") > 0, x / col("__norm")).otherwise(lit(0.0)))
          .as("__unit"))
    pairs
      .join(unit.select(col("__key").as("keyA"), col("__unit").as("unitA")), "keyA")
      .join(unit.select(col("__key").as("keyB"), col("__unit").as("unitB")), "keyB")
      .withColumn("cosine", Similarity.dot(col("unitA"), col("unitB")))
      .where(col("cosine") >= threshold)
      .select("keyA", "keyB", "cosine")
  }
}
