package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.core.CodecId
import graft.functions.TextOps
import graft.operators._
import graft.sources.CodeTableGen

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  *
  * Every `queries` entry runs the named operator end-to-end at `sfDir`
  * scale; entries with an `oracleSql` twin are value-checked against DuckDB
  * on the same parquet tables. The codec roundtrip queries push the data
  * through the full encode -> decode pipeline first, so the oracle equality
  * IS the bit-identity gate.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Verification-universe ceilings for the brute-force oracle TWINS
    * (crossJoin hamming scan, exact all-pairs jaccard/cosine): above the
    * ceiling the twin runs on a deterministic [[Sampling.bucketOf]] sample
    * of ~ceiling rows instead of the full corpus — the O(n²) ground truth
    * stays bounded at ANY sf while the production operator under test
    * still runs on the full (sampled) universe it is compared on. Both
    * ceilings exceed the sf0.1 table sizes (docs 5000, embeddings 2000),
    * so every result at the driver's correctness scales is byte-identical
    * to the ungated round-3 queries; at sf1.0+ the gate activates and the
    * DuckDB oracles replay the IDENTICAL membership arithmetic (below). */
  private val DocTruthCeiling = 20000L
  private val EmbTruthCeiling = 5000L
  /** q_token_bpe_learned's rescan-twin universe: the reference BPE loop is
    * O(len^2) per document, so its differential runs on ~this many docs at
    * any sf (identity at sf0.01's 500 docs; a 10% sample at sf0.1). */
  private val BpeTwinCeiling = 500L

  /** Deterministic sample-gate predicate: keep rows whose sampling bucket
    * falls under floor(min(1, ceiling/n) * 2^31). At n <= ceiling the
    * threshold is exactly 2^31 — every bucket passes and the gate is the
    * identity. */
  private def sampleGate(key: Column, n: Long, ceiling: Long,
      salt: Long): Column =
    Sampling.bucketOf(key, salt) <
      lit(Sampling.thresholdOf(math.min(1.0, ceiling.toDouble / n)))

  /** The same gate in DuckDB SQL (q_sample's pmod-safe Knuth-hash idiom);
    * `n` is recomputed by the engine so the threshold arithmetic —
    * floor(least(1.0, ceiling/n) * 2^31) in IEEE doubles — is replayed
    * bit-identically. */
  private def sampleGateSql(keyExpr: String, table: String, ceiling: Long,
      salt: Long): String =
    s"((($keyExpr % 2147483648 + 2147483648) % 2147483648 + $salt) " +
      s"% 2147483648 * 2654435761) % 2147483648 < " +
      s"CAST(floor(least(1.0, $ceiling.0 / (SELECT count(*) FROM $table)) " +
      s"* 2147483648.0) AS BIGINT)"

  /** Shared value-check for the scale-path ANN operators: runs `ann` over
    * the embeddings table and verifies (a) every query is covered, (b) per
    * query the ranks are a dense 1..n with non-increasing cosine, and
    * (c) each reported cosine equals the exact cosine recomputed from the
    * source embeddings (1e-9 — the pipeline normalizes-then-dots, the check
    * dots-then-divides). The oracle pins the violation counts at zero. */
  private def annInvariants(s: SparkSession, dir: String,
      ann: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // the verification universe rides the same deterministic sample gate
    // as q_ann_recall (identity at driver correctness scales): the
    // invariants join candidates back to the corpus per (query, neighbor),
    // and an UNGATED run at replica scale is the unbounded candidate join
    // that OOM'd the 20x corpus (BENCH.md) — at extreme duplicate density
    // every bucket/cell pairs quadratically. The production operator's
    // scale story is its bucketed shape + caps, not this quality gate.
    val embFull = embeddings(s, dir)
    val nAll = embFull.count()
    val emb = embFull.where(
      sampleGate(col("vec_id"), nAll, EmbTruthCeiling, salt = 19))
    val nq = emb.count()
    // ONE aggregation job for all three invariants (was cache + three
    // separate counts, each a full job): the window flags ride the same
    // rows through the two embedding joins, and coverage / bad-rank /
    // bad-cosine fall out of a single agg. The joins are inner but
    // row-preserving — every res query/neighbor is an emb vec_id.
    val w = Window.partitionBy(col("query")).orderBy(col("rank"))
    val ev = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val r = ann(emb)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__pc", lag(col("cosine"), 1).over(w))
      .join(ev.select(col("vec_id").as("query"), col("v").as("va")), "query")
      .join(ev.select(col("vec_id").as("neighbor"), col("v").as("vb")), "neighbor")
      .agg(
        countDistinct(col("query")).as("covered"),
        sum(when(col("__rn") =!= col("rank") ||
            (col("__pc").isNotNull && col("__pc") < col("cosine") - lit(1e-12)),
          1L).otherwise(0L)).as("bad_rank"),
        sum(when(abs(col("cosine") -
            Similarity.cosine(col("va"), col("vb"))) > 1e-9, 1L)
          .otherwise(0L)).as("bad_cos"))
      .head()
    val covered = if (r.isNullAt(0)) 0L else r.getLong(0)
    val badRank = if (r.isNullAt(1)) 0L else r.getLong(1)
    val badCos = if (r.isNullAt(2)) 0L else r.getLong(2)
    Seq((nq, covered, badRank, badCos))
      .toDF("n_queries", "queries_covered", "bad_rank", "bad_cosine")
  }

  /** Flagship: synthesize the north-rule code table, encode every column
    * with the auto-selector, return the per-partition lineage. */
  def entry(spark: SparkSession): DataFrame = {
    val code = CodeTableGen.generate(spark, numRows = 2000L, numPartitions = 4)
      .toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count", TextOps.lineCount(col("content")).cast("int"))
    val chunks = EncodeJob.encode(code, numPartitions = 8,
      partitionKeys = Seq("repo", "lang"), sortKeys = Seq("repo", "path", "commit"))
    EncodeJob.lineage(chunks).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- codec roundtrips (encode -> decode -> aggregate; oracle-checked)
    "q_rt_dict_lang" -> ((s, dir) => {
      val in = docs(s, dir).select("doc_id", "lang")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          forced = Map("lang" -> CodecId.Dict))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")
    }),
    "q_rt_map_meta" -> ((s, dir) => {
      // MAP roundtrip: map<string,string> through the version-4 chunk
      // (shared rep/def streams + two nested blobs), read back by key
      val in = docs(s, dir).select(col("doc_id"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      Roundtrip.through(in, sortKeys = Seq("doc_id"))
        .select(col("doc_id"), element_at(col("meta"), "lang").as("lang"),
          element_at(col("meta"), "source").as("source"))
        .orderBy("doc_id")
    }),
    "q_rt_plain_text" -> ((s, dir) => {
      val in = docs(s, dir).select("doc_id", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          forced = Map("text" -> CodecId.Plain))
        .select(col("doc_id"), length(col("text")).cast("long").as("n"))
        .orderBy("doc_id")
    }),
    "q_rt_fsst_text" -> ((s, dir) => {
      val in = docs(s, dir).select("doc_id", "lang", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          forced = Map("text" -> CodecId.Fsst))
        .groupBy("lang").agg(sum(length(col("text"))).as("total_chars"))
        .orderBy("lang")
    }),
    "q_rt_delta_orderkey" -> ((s, dir) => {
      val in = lineitem(s, dir).select("l_orderkey", "l_linenumber")
      Roundtrip.through(in, sortKeys = Seq("l_orderkey", "l_linenumber"),
          forced = Map("l_orderkey" -> CodecId.DeltaBinaryPacked,
            "l_linenumber" -> CodecId.DeltaBinaryPacked))
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("mn"),
          max(col("l_orderkey")).as("mx"), sum(col("l_orderkey")).as("s"),
          sum(col("l_linenumber").cast("long")).as("sl"))
    }),
    "q_rt_deltabyte_source" -> ((s, dir) => {
      val in = docs(s, dir).select("doc_id", "source")
      Roundtrip.through(in, sortKeys = Seq("source", "doc_id"),
          forced = Map("source" -> CodecId.DeltaByteArray))
        .groupBy("source").agg(count(lit(1)).as("cnt"))
        .orderBy("source")
    }),
    "q_rt_deltalen_text" -> ((s, dir) => {
      val in = docs(s, dir).select("doc_id", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          forced = Map("text" -> CodecId.DeltaLengthByteArray))
        .agg(sum(octet_length(col("text"))).as("total_bytes"),
          count(lit(1)).as("n"))
    }),
    "q_rt_rle_flag" -> ((s, dir) => {
      val in = lineitem(s, dir)
        .select(col("l_orderkey"), (col("l_quantity") >= 25).as("flag"))
      Roundtrip.through(in, sortKeys = Seq("flag", "l_orderkey"),
          forced = Map("flag" -> CodecId.RleBool))
        .groupBy("flag").agg(count(lit(1)).as("cnt"))
        .orderBy("flag")
    }),
    "q_rt_auto_docs" -> ((s, dir) => {
      Roundtrip.through(docs(s, dir), sortKeys = Seq("doc_id"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"),
          sum(col("n_chars")).as("sum_chars"))
    }),
    "q_rt_events_ts" -> ((s, dir) => {
      val in = events(s, dir).select("event_id", "ts", "event_type", "user_id")
      Roundtrip.through(in, sortKeys = Seq("event_id"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("mn_ts"),
          max(col("ts")).as("mx_ts"),
          countDistinct(col("event_type")).as("ntypes"))
    }),
    "q_rt_zstd_text" -> ((s, dir) => {
      // chunk encoding + general-purpose block compression on top
      // (reference compression.rs); decode unwraps transparently
      val in = docs(s, dir).select("doc_id", "lang", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          blockCodec = graft.core.BlockCodec.Zstd)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(octet_length(col("text"))).as("bytes"))
        .orderBy("lang")
    }),
    "q_rt_gzip_text" -> ((s, dir) => {
      // same shape as q_rt_zstd_text but through the JDK-Deflater GZIP
      // block codec (reference compression.rs:119-172)
      val in = docs(s, dir).select("doc_id", "lang", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          blockCodec = graft.core.BlockCodec.Gzip)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(octet_length(col("text"))).as("bytes"))
        .orderBy("lang")
    }),
    "q_rt_brotli_text" -> ((s, dir) => {
      // same shape again through the from-scratch RFC 7932 BROTLI codec
      // (reference compression.rs:141-172) — externally anchored against
      // google/brotli streams in BrotliSpec
      val in = docs(s, dir).select("doc_id", "lang", "text")
      Roundtrip.through(in, sortKeys = Seq("doc_id"),
          blockCodec = graft.core.BlockCodec.Brotli)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(octet_length(col("text"))).as("bytes"))
        .orderBy("lang")
    }),
    "q_rt_nulls" -> ((s, dir) => {
      // nullable columns: def-level (validity) streams through the chunk
      // container, values null-suppressed like Parquet data pages
      val in = docs(s, dir).select(col("doc_id"),
        when(col("n_chars") % 7 === 0, lit(null)).otherwise(col("source"))
          .as("source_n"),
        when(col("n_chars") % 5 === 0, lit(null)).otherwise(col("n_chars"))
          .as("chars_n"))
      Roundtrip.through(in, sortKeys = Seq("doc_id"))
        .agg(count(lit(1)).as("n"),
          count(col("source_n")).as("nn_source"),
          count(col("chars_n")).as("nn_chars"),
          sum(col("chars_n")).as("sum_chars"),
          countDistinct(col("source_n")).as("nd_source"))
    }),
    "q_rt_decimal" -> ((s, dir) => {
      // DECIMAL(p<=18) as unscaled INT64 through the chunk engine; decimal
      // aggregation is exact, so the oracle equality is exact (the final
      // cast to double is one deterministic conversion on both engines)
      val in = lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        col("l_discount").cast("decimal(12,2)").as("disc"))
      Roundtrip.through(in, sortKeys = Seq("l_orderkey", "l_linenumber"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("sum_price"),
          min(col("disc")).cast("double").as("min_disc"),
          max(col("price")).cast("double").as("max_price"))
    }),
    "q_rt_array_embed" -> ((s, dir) => {
      // LIST roundtrip on a real array<float> column: encode + decode the
      // embeddings table, exact-compare every array against the source
      // (elementwise equality in Spark), report the mismatch count — the
      // oracle pins it at zero plus row/element totals.
      val src = embeddings(s, dir).select("vec_id", "embedding")
      val dec = Roundtrip.through(src, sortKeys = Seq("vec_id"))
        .withColumnRenamed("embedding", "dec_embedding")
      src.join(dec, Seq("vec_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(size(col("embedding"))).as("sum_len"),
          sum(when(col("embedding").isNull || col("dec_embedding").isNull ||
            col("embedding") =!= col("dec_embedding"), 1L).otherwise(0L))
            .as("mismatches"))
    }),
    "q_rt_array_tokens" -> ((s, dir) => {
      // LIST roundtrip on array<string>: token arrays survive the chunk
      // container bit-exactly
      val src = docs(s, dir).select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
          .as("toks"))
      val dec = Roundtrip.through(src, sortKeys = Seq("doc_id"))
        .withColumnRenamed("toks", "dec_toks")
      src.join(dec, Seq("doc_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(size(col("toks"))).as("sum_toks"),
          sum(when(col("toks").isNull || col("dec_toks").isNull ||
            col("toks") =!= col("dec_toks"), 1L).otherwise(0L))
            .as("mismatches"))
    }),
    "q_prune_decode" -> ((s, dir) => {
      // chunk min/max statistics prune row ranges BEFORE any decode work:
      // range-cluster on the predicate column, encode, then decodeWhere
      // filters on chunk metadata only (the broadcast semi-join shape that
      // works at any scale)
      val in = lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .repartitionByRange(16, col("l_orderkey"))
      val chunks = EncodeJob.encode(in, numPartitions = 0,
        partitionKeys = Seq.empty, sortKeys = Seq("l_orderkey", "l_linenumber"),
        chunkRows = 4096)
      DecodeJob.decodeWhere(chunks, in.schema, "l_orderkey", 1000L, 3000L)
        .where(col("l_orderkey").between(1000, 3000))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("s"),
          round(sum(col("l_quantity")), 2).as("sq"))
    }),
    "q_rt_struct" -> ((s, dir) => {
      // STRUCT columns through the full file loop: named_struct rows are
      // shredded into per-subfield leaf chunks (optional group, maxDef 2)
      // by OUR writer, read back by OUR DSv2 reader, and re-aggregated.
      // Struct-level nulls (n_chars%9) and field-level nulls (n_chars%7)
      // exercise both def levels.
      val in = docs(s, dir).select(col("doc_id"),
        when(col("n_chars") % 9 === 0, lit(null)).otherwise(
          struct(col("lang").as("lang"), col("n_chars").as("nc"),
            when(col("n_chars") % 7 === 0, lit(null).cast("string"))
              .otherwise(col("source")).as("src"))).as("s"))
      val out = java.nio.file.Files.createTempDirectory("graft-pqst").toString
      graft.sources.ParquetSink.write(in.repartition(4), out).count()
      s.read.format("graft.sources.GraftParquetFormat").load(out)
        .agg(count(lit(1)).as("n"), count(col("s")).as("n_struct"),
          count(col("s.src")).as("n_src"),
          sum(col("s.nc")).as("sum_nc"),
          countDistinct(col("s.lang")).as("nd_lang"))
    }),
    "q_parquet_file_rt" -> ((s, dir) => {
      // REAL parquet-file interop: write documents through OUR PAR1 writer
      // (own thrift footer, dict/plain pages, snappy), read back through
      // SPARK'S built-in parquet reader, aggregate. Oracle equality proves
      // the container is externally consumable end to end.
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-pqrt").toString
      graft.sources.ParquetSink.write(in.repartition(4), out).count()
      s.read.parquet(out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_file_v2" -> ((s, dir) => {
      // same interop loop but with DATA_PAGE_V2 pages (prefix-free
      // uncompressed level streams, value-only compression): written by OUR
      // writer, consumed by SPARK'S reader — external proof the v2 page
      // grammar is standard.
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-pqv2").toString
      graft.sources.ParquetSink.write(in.repartition(4), out,
        pageVersion = 2).count()
      s.read.parquet(out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_brotli" -> ((s, dir) => {
      // real .parquet files with BROTLI-compressed pages, written and read
      // by OUR codec end to end (Spark/DuckDB don't ship a brotli parquet
      // codec; the external anchor is pyarrow reading these same pages in
      // ParquetInteropSpec/BrotliSpec)
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-pqbr").toString
      graft.sources.ParquetSink.write(in.repartition(4), out,
        codec = graft.sources.PqCodec.Brotli).count()
      graft.sources.ParquetSource.read(s, out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_dist_read" -> ((s, dir) => {
      // full our-writer -> our-reader loop, DISTRIBUTED both ways: sink
      // writes per-partition files (sorted, small row groups), source
      // parallelizes the file list and prunes row groups via footer stats
      // inside each task before decoding; exact filter on top. The
      // directory is addressed as a file:// URI so the whole loop runs
      // through the pluggable Hadoop FileSystem I/O seam (the in-sandbox
      // stand-in for hdfs:// / s3a:// paths).
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = "file://" +
        java.nio.file.Files.createTempDirectory("graft-pqsrc").toString
      graft.sources.ParquetSink.write(
        in.repartition(4).sortWithinPartitions("doc_id"), out,
        rowGroupRows = 1 << 10).count()
      graft.sources.ParquetSource.read(s, out,
          range = Some(("doc_id", 100L, 2000L)))
        .filter(col("doc_id").between(100, 2000))
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_hive_part" -> ((s, dir) => {
      // Hive-partitioned layout: lang moves into directory names
      // (lang=en/...), the scan restores it as a partition column, and a
      // lang predicate prunes whole directories at planning time.
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-hive").toString
      graft.sources.ParquetSink.writePartitioned(in, out, Seq("lang")).count()
      import org.apache.spark.sql.functions._
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .where(col("lang") === "en")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("text_chars"),
          sum(col("doc_id")).cast("long").as("sum_id"))
    }),
    "q_parquet_dpp_join" -> ((s, dir) => {
      // Runtime join-key filtering: fact = documents through OUR sink+scan
      // (small sorted row groups), dim = a file-backed key table with its
      // own predicate. Spark broadcasts the dim, hands its surviving keys
      // to the scan via SupportsRuntimeV2Filtering, and the scan re-prunes
      // row groups before any task is scheduled — the 100 TB dim-fact
      // shape where the fact side reads only the joined keys' groups.
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-dppq").toString
      graft.sources.ParquetSink.write(
        in.repartition(2).sortWithinPartitions("doc_id"), out,
        rowGroupRows = 1 << 10).count()
      val dimDir = java.nio.file.Files.createTempDirectory("graft-dppd").toString
      // distinct: the oracle's WHERE-filter semantics require unique dim keys
      in.select("doc_id").distinct().write.mode("overwrite").parquet(dimDir)
      val fact = s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
      val dim = s.read.parquet(dimDir).where(col("doc_id") % 97 === 0)
        .withColumnRenamed("doc_id", "k")
      fact.join(dim, fact("doc_id") === dim("k"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_resumable" -> ((s, dir) => {
      // Resumable file sink: first run writes all partitions and commits a
      // per-column lineage table under _lineage (encodings, bytes, sha256);
      // the second run reads that lineage, finds every partition done, and
      // writes NOTHING — oracle equality on the read-back plus the rerun
      // proves checkpoint-resume idempotence on the real-file path.
      val in = docs(s, dir).select("doc_id", "lang", "text")
        .repartition(4, col("doc_id")).sortWithinPartitions("doc_id")
      val out = java.nio.file.Files.createTempDirectory("graft-pqres").toString
      graft.sources.ParquetSink.writeResumable(in, out).count()
      graft.sources.ParquetSink.writeResumable(in, out).count() // no-op rerun
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_streaming_encode" -> ((s, dir) => {
      // Structured Streaming encode sink, driver-proven: a documents slice
      // becomes a file-stream source, runs through readStream ->
      // foreachBatch -> EncodeJob (Trigger.AvailableNow), is then STARTED
      // AGAIN from the same checkpoint (exactly-once: the second run must
      // add no batches), and the decoded chunks aggregate to numbers the
      // oracle recomputes from the raw table. Equality proves the
      // streaming path loses/duplicates nothing across a restart.
      import s.implicits._
      val slice = docs(s, dir).where(col("doc_id") % 7 === 0)
        .select("doc_id", "lang", "source", "text")
      val srcDir = java.nio.file.Files.createTempDirectory("graft-stsrc").toString
      slice.repartition(2).write.mode("overwrite").parquet(srcDir)
      val out = java.nio.file.Files.createTempDirectory("graft-stenc").toString
      def run(): Unit = {
        val q = graft.streaming.StreamingEncode.start(
          s.readStream.schema(slice.schema).parquet(srcDir), out,
          numPartitions = 4, partitionKeys = Seq("lang"),
          sortKeys = Seq("doc_id"))
        q.awaitTermination()
      }
      run(); run() // second start replays the checkpoint: no new batches
      val chunks = s.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow]
      DecodeJob.decode(chunks, slice.schema)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
    }),
    "q_streaming_pqsink" -> ((s, dir) => {
      // Streaming parquet-FILE sink, driver-proven: the same file-stream
      // source lands as standard .parquet files (our writer) under
      // batch=<id>/ dirs; SPARK'S OWN reader consumes the whole output
      // (batch= parsed as a partition column) and the aggregate must match
      // the oracle's recomputation from the raw table.
      val slice = docs(s, dir).where(col("doc_id") % 7 === 0)
        .select("doc_id", "lang", "text")
      val srcDir = java.nio.file.Files.createTempDirectory("graft-spsrc").toString
      slice.repartition(2).write.mode("overwrite").parquet(srcDir)
      val out = java.nio.file.Files.createTempDirectory("graft-stpq").toString
      val q = graft.streaming.StreamingEncode.startParquetSink(
        s.readStream.schema(slice.schema).parquet(srcDir), out)
      q.awaitTermination()
      s.read.parquet(out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_streaming_dedup" -> ((s, dir) => {
      // Stateful streaming dedup (flatMapGroupsWithState — custom state
      // the built-ins can't express), driver-proven across THREE
      // micro-batches and a QUERY RESTART: batch1 = the slice plus a full
      // duplicate copy (same texts, offset ids — within- and cross-row
      // dedup), batch2 = another full duplicate (cross-BATCH state),
      // then the query STOPS and a fresh start from the same checkpoint
      // processes batch3 = a third duplicate copy plus one genuinely new
      // text — the recovered state must drop every duplicate yet still
      // emit the new key. Output = one deterministic representative (min
      // doc_id) per distinct text; DuckDB recomputes the representative
      // set from the raw table.
      import s.implicits._
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val off = docs(s, dir).agg(max(col("doc_id"))).head().getLong(0) + 1L
      val slice = base.where(col("doc_id") % 5 === 0)
      val srcDir = java.nio.file.Files.createTempDirectory("graft-sdsrc").toString
      val out = java.nio.file.Files.createTempDirectory("graft-sdout").toString
      // one parquet FILE per micro-batch, mtime-staggered: the file stream
      // source orders by modification time, so batch order is pinned
      def addFile(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft-sdf").toString
        df.repartition(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(srcDir, name)
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis() - 600000L
      addFile(slice.unionByName(
        slice.withColumn("doc_id", col("doc_id") + lit(off))), "f1.parquet", t0)
      addFile(slice.withColumn("doc_id", col("doc_id") + lit(2 * off)),
        "f2.parquet", t0 + 60000L)
      def run(): Unit = {
        val q = graft.streaming.StreamingDedup.start(
          s.readStream.schema(slice.schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir),
          xxhash64(col("text")), "doc_id", out)
        q.awaitTermination()
      }
      run()
      addFile(slice.withColumn("doc_id", col("doc_id") + lit(3 * off))
        .unionByName(Seq((4 * off, "planted unique streaming doc"))
          .toDF("doc_id", "text")), "f3.parquet", t0 + 120000L)
      run() // restart: recovered state drops the dups, emits the new key
      s.read.parquet(out)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_id"),
          sum(length(col("text"))).as("chars"))
    }),
    "q_cli_encode" -> ((s, dir) => {
      // the spark-submit encode job driver end to end: EncodeMain encodes
      // the documents table (lineage checkpoint + --verify per-row sha256
      // equality of every non-key column — a mismatch hard-fails the run),
      // reruns to prove the checkpoint resume rewrites nothing, and the
      // lineage's per-column input bytes are recomputed by DuckDB from the
      // raw table.
      val in = java.nio.file.Files.createTempDirectory("graft-cliein").toString
      val out = java.nio.file.Files.createTempDirectory("graft-clieout").toString
      docs(s, dir).select("doc_id", "lang", "source", "text")
        .write.mode("overwrite").parquet(in)
      EncodeMain.main(Array(in, out, "--partitions", "8",
        "--partition-keys", "lang", "--sort-keys", "doc_id",
        "--verify", "doc_id"))
      val c1 = s.read.parquet(s"$out/chunks").count()
      EncodeMain.main(Array(in, out, "--partitions", "8",
        "--partition-keys", "lang", "--sort-keys", "doc_id"))
      val c2 = s.read.parquet(s"$out/chunks").count()
      s.read.parquet(s"$out/lineage")
        .groupBy(col("column").as("col_name"))
        .agg(sum(col("inputBytes")).as("input_bytes"))
        .withColumn("resume_stable", lit(if (c1 == c2) 1 else 0))
        .orderBy("col_name")
    }),
    "q_cli_resume_refusal" -> ((s, dir) => {
      // pins the resume-safety CONTRACT end to end through the job driver:
      // a checkpoint resumed under a projection (1), after input schema
      // evolution (2), or with its routing marker deleted (3) must REFUSE
      // (in-process the refusal is the require's IllegalArgumentException;
      // under spark-submit the uncaught throw is the nonzero exit), and
      // re-asserting the original config per the error message's own
      // instructions must make the next resume a clean no-op that rewrites
      // nothing. Each refusal's code is emitted and pinned.
      import s.implicits._
      val in = java.nio.file.Files.createTempDirectory("graft-rrin").toString
      val out = java.nio.file.Files.createTempDirectory("graft-rrout").toString
      val slice = docs(s, dir).select("doc_id", "lang", "text")
      val nDocs = slice.count()
      slice.write.mode("overwrite").parquet(in)
      val baseArgs = Array(in, out, "--partitions", "4",
        "--partition-keys", "lang", "--sort-keys", "doc_id")
      EncodeMain.main(baseArgs)
      val c1 = s.read.parquet(s"$out/chunks").count()
      // 1 = config-mismatch refusal, 2 = missing-marker refusal, 0 = ran
      def refusal(args: Array[String]): Int =
        try { EncodeMain.main(args); 0 }
        catch {
          case e: IllegalArgumentException
              if String.valueOf(e.getMessage).contains("resume config mismatch") => 1
          case e: IllegalArgumentException
              if String.valueOf(e.getMessage).contains("routing marker") => 2
        }
      val refProjection = refusal(baseArgs ++ Array("--columns", "doc_id,lang"))
      slice.withColumn("quality", lit(1.0)).write.mode("overwrite").parquet(in)
      val refEvolution = refusal(baseArgs)
      slice.write.mode("overwrite").parquet(in)
      graft.sources.GraftIO.forPath(out).delete(s"$out/_encode_meta")
      val refNoMarker = refusal(baseArgs)
      graft.operators.EncodeJob.writeRoutingMarker(out,
        graft.operators.EncodeJob.routingMeta(4, Seq("lang"), Seq("doc_id"),
          graft.core.BlockCodec.None, Seq("doc_id", "lang", "text")))
      EncodeMain.main(baseArgs)
      val c2 = s.read.parquet(s"$out/chunks").count()
      Seq((nDocs, refProjection, refEvolution, refNoMarker,
          if (c1 == c2 && c1 > 0) 1 else 0))
        .toDF("n_docs", "refused_projection", "refused_schema_evolution",
          "refused_no_marker", "resume_stable")
    }),
    "q_cli_read" -> ((s, dir) => {
      // the parquet-read CLI end to end (reference parquet-read.rs:48-90):
      // a documents slice written as ONE real .parquet file by our writer,
      // dumped by ChunkTool's text interface, re-parsed from the captured
      // stdout, and aggregated — the oracle recomputes the same numbers
      // from the raw table, so the CLI's row assembly and rendering are
      // value-checked, not smoke-tested. Columns are atomic (no free text)
      // so the tab-separated format parses unambiguously.
      import s.implicits._
      val slice = docs(s, dir).where(col("doc_id") % 11 === 0)
        .select("doc_id", "lang", "n_chars")
      val rows = slice.collect()
      val tmp = java.nio.file.Files.createTempDirectory("graft-cli").toString
      val path = s"$tmp/docs.parquet"
      graft.sources.ParquetFileWriter.writeFile(path, slice.schema,
        rows.iterator)
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos, true, "UTF-8")) {
        ChunkTool.main(Array("parquet-read", path, (rows.length + 10).toString))
      }
      val lines = baos.toString("UTF-8").split("\n").filter(_.nonEmpty)
      val hdr = lines.head.split("\t")
      val (idI, lgI, ncI) = (hdr.indexOf("doc_id"), hdr.indexOf("lang"),
        hdr.indexOf("n_chars"))
      val parsed = lines.tail.map(_.split("\t", -1))
      Seq((parsed.length.toLong,
          parsed.map(_(idI).toLong).sum,
          parsed.map(_(ncI).toLong).sum,
          parsed.map(_(lgI)).distinct.length.toLong))
        .toDF("n_rows", "sum_id", "sum_nc", "nd_lang")
    }),
    "q_parquet_page_prune" -> ((s, dir) => {
      // Page-granular pruning surface: a single-file, single-row-group
      // table whose chunks span many ~1 MiB pages with per-page header
      // statistics; the pushed doc_id range decodes only overlapping
      // pages (and, via ranged I/O, reads only the needed chunks).
      val in = docs(s, dir).select("doc_id", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-pgpq").toString
      graft.sources.ParquetSink.write(
        in.coalesce(1).sortWithinPartitions("doc_id"), out,
        rowGroupRows = 1 << 20).count()
      import org.apache.spark.sql.functions._
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .where(col("doc_id") >= 500L && col("doc_id") <= 1499L)
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("text_chars"),
          sum(col("doc_id")).cast("long").as("sum_id"))
    }),
    "q_parquet_sql_read" -> ((s, dir) => {
      // DataSource V2 surface: our reader mounted via spark.read.format(),
      // queried through spark.sql — Catalyst pushes the projection and the
      // doc_id range into the scan (row-group stats pruning + column-pruned
      // decode inside each task).
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-dsv2q").toString
      graft.sources.ParquetSink.write(
        in.repartition(4).sortWithinPartitions("doc_id"), out,
        rowGroupRows = 1 << 10).count()
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .createOrReplaceTempView("graft_docs_v2")
      s.sql("""SELECT lang, count(*) AS cnt,
                      sum(length(text)) AS chars, sum(doc_id) AS sum_id
               FROM graft_docs_v2 WHERE doc_id BETWEEN 100 AND 2000
               GROUP BY lang ORDER BY lang""")
    }),
    "q_parquet_agg_pushdown" -> ((s, dir) => {
      // DSv2 aggregate pushdown: count(*)/min/max answered from footer
      // metadata alone (no page decode). The plan assertion pins that the
      // footer path — not the row path — produced the values the oracle
      // checks.
      val in = docs(s, dir).select("doc_id", "lang", "n_chars")
      val out = java.nio.file.Files.createTempDirectory("graft-dsv2agg").toString
      graft.sources.ParquetSink.write(
        in.repartition(4).sortWithinPartitions("doc_id"), out,
        rowGroupRows = 1 << 10).count()
      val df = s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
      val q = df.agg(
        count(lit(1)).as("cnt"),
        min("doc_id").as("mn_id"), max("doc_id").as("mx_id"),
        min("n_chars").as("mn_chars"), max("n_chars").as("mx_chars"))
      require(q.queryExecution.executedPlan.toString
        .contains("GraftParquetAggScan"), "aggregate was not pushed to footers")
      q
    }),
    "q_parquet_enc_auto" -> ((s, dir) => {
      // north-star codec auto-selection over REAL parquet files: the writer
      // picks each chunk's fallback encoding from measured/sampled stats
      // (DELTA_BINARY_PACKED for the sorted ids, delta byte-array family
      // for text, RLE where it wins), and our DSv2 columnar reader decodes
      // the result. Oracle equality proves the auto-encoded file is a
      // faithful copy of the source table.
      val in = docs(s, dir).select("doc_id", "lang", "text")
      val out = java.nio.file.Files.createTempDirectory("graft-encq").toString
      graft.sources.ParquetSink.write(
        in.repartition(4).sortWithinPartitions("doc_id"), out,
        pageVersion = 2, encPolicy = graft.sources.EncPolicy.Auto).count()
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .groupBy("lang").agg(count(lit(1)).as("cnt"),
          sum(length(col("text"))).as("chars"),
          sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    }),
    "q_parquet_col_props" -> ((s, dir) => {
      // per-column writer property overrides (the reference's
      // WriterProperties surface, properties.rs:101-210) on a REAL file:
      // DELTA pinned on the sorted id with its dictionary disabled,
      // DELTA_LENGTH_BYTE_ARRAY + gzip on text (dict off), statistics
      // dropped on n_chars — while lang keeps its dictionary and the
      // file-level snappy. The FOOTER pins every choice (pins_ok, audited
      // across all files and row groups Scala-side, a constant the oracle
      // replays); SPARK'S OWN reader then proves the mixed-codec,
      // mixed-encoding file is a faithful copy of the source table.
      import graft.sources.{ParquetFileReader, PqCodec, PqEncoding, WriterProps}
      val in = docs(s, dir).select("doc_id", "lang", "text", "n_chars")
      val out = java.nio.file.Files.createTempDirectory("graft-colpq").toString
      val props = WriterProps.empty
        .withColumnEncoding("doc_id", PqEncoding.DeltaBinaryPacked)
        .withColumnDictionaryEnabled("doc_id", on = false)
        .withColumnEncoding("text", PqEncoding.DeltaLengthByteArray)
        .withColumnDictionaryEnabled("text", on = false)
        .withColumnCodec("text", PqCodec.Gzip)
        .withColumnStatisticsEnabled("n_chars", on = false)
      graft.sources.ParquetSink.write(
        in.repartition(2).sortWithinPartitions("doc_id"), out,
        codec = PqCodec.Snappy, props = props).count()
      val pinsOk = new java.io.File(out)
        .listFiles((_, nm) => nm.endsWith(".parquet")).forall { f =>
          ParquetFileReader.readFooterOnly(f.getPath).rowGroups.forall { rg =>
            val cols = rg.columns
              .map(c => c.pathInSchema.mkString(".") -> c).toMap
            cols("doc_id").encodings.contains(PqEncoding.DeltaBinaryPacked) &&
              cols("doc_id").dictionaryPageOffset < 0 &&
              cols("doc_id").stats.nonEmpty &&
              cols("text").codec == PqCodec.Gzip &&
              cols("text").dictionaryPageOffset < 0 &&
              cols("text").encodings.contains(
                PqEncoding.DeltaLengthByteArray) &&
              cols("lang").codec == PqCodec.Snappy &&
              cols("lang").dictionaryPageOffset >= 0 &&
              cols("n_chars").stats.isEmpty
          }
        }
      s.read.parquet(out).agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sum_id"),
        sum(length(col("text"))).as("chars"),
        countDistinct(col("lang")).as("n_lang"),
        sum(col("n_chars")).as("sum_nc"))
        .withColumn("pins_ok", lit(pinsOk))
    }),
    "q_parquet_int96" -> ((s, dir) => {
      // legacy INT96 timestamp writes (reference writer.rs:51-100's eighth
      // physical type, opt-in): our writer emits physical INT96 leaves
      // (LE nanos-of-day + LE Julian day); SPARK'S OWN reader — with
      // int96RebaseMode defaults — decodes them for the aggregate the
      // oracle checks, the external proof the layout is standard.
      val in = events(s, dir).select("event_id", "ts", "event_type")
      val out = java.nio.file.Files.createTempDirectory("graft-i96").toString
      graft.sources.ParquetSink.write(in.repartition(2), out,
        int96Timestamps = true).count()
      val back = s.read.parquet(out)
      require(back.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, "ts must read as timestamp")
      // INT96 reads back session-TZ; the source (and DuckDB's oracle view
      // of it) is NTZ — under the UTC session the wall clocks coincide, so
      // compare as NTZ
      back.agg(count(lit(1)).as("n"),
        min(col("ts")).cast("timestamp_ntz").as("mn_ts"),
        max(col("ts")).cast("timestamp_ntz").as("mx_ts"),
        countDistinct(col("event_type")).as("ntypes"))
    }),
    "q_parquet_flba" -> ((s, dir) => {
      // FIXED_LEN_BYTE_ARRAY writes (the writer's seventh physical type):
      // p>18 decimals become FLBA leaves (two's-complement BE, fixed
      // width) in OUR file, decoded by SPARK'S OWN reader for the
      // aggregate. Decimal aggregation is exact; the final double cast is
      // one deterministic conversion on both engines (q_rt_decimal idiom).
      val in = lineitem(s, dir).select(col("l_orderkey"),
        col("l_extendedprice").cast("decimal(25,4)").as("price"))
      val out = java.nio.file.Files.createTempDirectory("graft-flbaq").toString
      graft.sources.ParquetSink.write(in.repartition(4), out).count()
      val back = s.read.parquet(out)
      require(back.schema("price").dataType ==
        org.apache.spark.sql.types.DecimalType(25, 4), "price must stay decimal(25,4)")
      back.agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("sum_price"),
        max(col("price")).cast("double").as("max_price"),
        sum(col("l_orderkey")).as("sum_k"))
    }),
    "q_parquet_bloom_prune" -> ((s, dir) => {
      // Split-block bloom filters: the writer stamps an SBBF per row group
      // on doc_id; rows arrive UNSORTED so min/max stats can't prune, and
      // the pushed IN-list is answered by bloom probes (one small ranged
      // read per group) before any chunk I/O.
      val in = docs(s, dir).select("doc_id", "lang", "n_chars")
      val out = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      graft.sources.ParquetSink.write(in.repartition(4), out,
        rowGroupRows = 1 << 10, bloomCols = Seq("doc_id")).count()
      s.read.format(graft.sources.GraftParquetFormat.Name).load(out)
        .where(col("doc_id").isin(3L, 777L, 1500L))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(col("doc_id")).cast("long").as("sum_id"))
    }),
    // ---- encoder lineage + selector (oracle checks the byte accounting)
    "q_enc_lineage_bytes" -> ((s, dir) => {
      val chunks = EncodeJob.encode(docs(s, dir), numPartitions = 8,
        partitionKeys = Seq("lang"), sortKeys = Seq("doc_id"))
      EncodeJob.lineage(chunks).toDF()
        .groupBy(col("column").as("col_name"))
        .agg(sum(col("inputBytes")).as("input_bytes"))
        .orderBy("col_name")
    }),
    "q_enc_ratio" -> ((s, dir) => {
      // selector byte accounting, restated in oracle-checkable form: exact
      // per-column input bytes (DuckDB recomputes them from the data), the
      // never-exceeds-reference-ceiling invariant, and compression booleans
      // at per-column pinned levels (robust to small selector shifts,
      // unlike raw output bytes). The chosen codec STRINGS are deliberately
      // NOT emitted here: per-chunk choices are a function of chunk
      // contents, so the set of codecs seen per column shifts with scale
      // (sf0.01 split `source` across DELTA_BYTE_ARRAY+DICT chunks; sf0.1's
      // bigger chunks all chose DICT) — pinning them made the oracle
      // sf-specific. Codec lineage stays value-checked per chunk in
      // q_enc_lineage_bytes, which holds at every sf.
      val chunks = EncodeJob.encode(docs(s, dir), numPartitions = 8,
        partitionKeys = Seq("lang"), sortKeys = Seq("doc_id"))
      EncodeJob.lineage(chunks).toDF()
        .groupBy(col("column").as("col_name"))
        .agg(
          sum(col("inputBytes")).as("input_bytes"),
          max((col("outputBytes") > col("refPolicyBytes")).cast("int"))
            .as("exceeds_ceiling"),
          (sum(col("outputBytes")) < sum(col("inputBytes"))).cast("int")
            .as("compresses"),
          // ratio < 0.75, NOT < 0.5: the measured text ratio sits at ~0.47
          // across four orders of magnitude (scale-invariant selector), so
          // a 0.5 threshold left a 0.03 margin and flipped on sum-order ulp
          // at the 10x corpus. 0.75 keeps >=0.28 margin for every column
          // (text ~0.47; dict/delta columns are all <0.1) at any sf.
          (sum(col("outputBytes")) * 4 < sum(col("inputBytes")) * 3).cast("int")
            .as("under_three_quarters"))
        .orderBy("col_name")
    }),
    "q_verify_roundtrip" -> ((s, dir) => {
      val source = docs(s, dir)
      val decoded = Roundtrip.through(source, sortKeys = Seq("doc_id"))
      val (nSrc, nDec, bad) = Verifier.verify(source, decoded,
        keyCols = Seq("doc_id"), contentCol = "text")
      import s.implicits._
      Seq((nSrc, nDec, bad)).toDF("rows_source", "rows_decoded", "mismatches")
    }),
    // ---- training-data pipeline operators
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(docs(s, dir), "text", "doc_id")
        .groupBy("lang").agg(count(lit(1)).as("distinct_texts"))
        .orderBy("lang")
    }),
    "q_token_count" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("lang")
        .agg(sum(TextOps.wsTokenCount(col("text"))).as("tokens"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),
    "q_text_quality" -> ((s, dir) => {
      val q = TextOps.qualitySignals(col("text"))
      docs(s, dir)
        .groupBy("source")
        .agg(sum(q(0)).as("chars"), sum(q(2)).as("spaces"),
          sum(q(3)).as("alphas"), sum(q(4)).as("digits"))
        .orderBy("source")
    }),
    "q_token_bpe" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("lang")
        .agg(sum(TextOps.tokenCount(col("text"))).as("bpe_tokens"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),
    "q_token_bpe_merge" -> ((s, dir) => {
      // REAL merge-table BPE (priority pair merging, per-partition kernel
      // — Bpe.scala) over normalized [a-z ] text. The oracle replays the
      // SAME creation-ordered merge table as rank-ordered replace() passes
      // (single-char symbol names make token count == length of the
      // rewritten string) — see Bpe's oracle-equivalence scaladoc. The SQL
      // is BUILT from Bpe.SyntheticTable.merges, so the engines can't
      // drift.
      val norm = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z ]", ""), " +", " ")
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        norm.as("norm"))
      graft.functions.Bpe.tokenCount(d, "norm",
          graft.functions.Bpe.SyntheticTable, "bpe_tokens")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("bpe_tokens")).as("total_tokens"))
        .orderBy("lang")
    }),
    "q_token_bpe_learned" -> ((s, dir) => {
      // REAL learned vocabulary at 10k merges: word frequencies come from
      // ONE distributed aggregation over the corpus (plus the deterministic
      // filler vocab — the synthetic corpus has only ~31 distinct words,
      // nowhere near enough pair diversity for 10k merges); Bpe.learn runs
      // the standard incremental pair-count trainer driver-side over that
      // bounded list. Verification is differential: learned tables have
      // multi-char symbols, so the replace() replay of q_token_bpe_merge
      // cannot apply — instead the indexed heap encoder (production path)
      // is pinned against the independent full-rescan twin on a
      // deterministically gated subset (the twin is O(len^2) per doc), and
      // DuckDB replays the gate membership + document counts.
      import s.implicits._
      val norm = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z ]", ""), " +", " ")
      val d = docs(s, dir).select(col("doc_id"), norm.as("norm"))
      val nDocs = d.count()
      val table = graft.functions.Bpe.learn(
        graft.functions.Bpe.wordFrequencies(d, "norm", 1 << 16) ++
          graft.functions.Bpe.syntheticVocab(4000), 10000)
      val fast = graft.functions.Bpe.tokenCount(d, "norm", table, "t_fast")
      // the filter CANNOT push below the opaque mapPartitions kernel, so
      // the indexed encoder really runs over the whole corpus before the
      // rescan twin sees the gated survivors
      val gated = fast.where(
        sampleGate(col("doc_id"), nDocs, BpeTwinCeiling, salt = 23))
      val r = graft.functions.Bpe.tokenCount(gated, "norm", table, "t_ref",
          reference = true)
        .agg(count(lit(1)).as("g"),
          sum(when(col("t_fast") =!= col("t_ref"), 1L).otherwise(0L)).as("m"),
          sum(when((col("t_fast") < 1 && length(col("norm")) > 0) ||
              col("t_fast") > greatest(length(col("norm")), lit(1)), 1L)
            .otherwise(0L)).as("b"))
        .head()
      val nGated = if (r.isNullAt(0)) 0L else r.getLong(0)
      val mism = if (r.isNullAt(1)) 0L else r.getLong(1)
      val bound = if (r.isNullAt(2)) 0L else r.getLong(2)
      Seq((nDocs, table.merges.size, nGated, mism, bound))
        .toDF("n_docs", "n_merges", "n_gated", "mismatches",
          "bound_violations")
    }),
    "q_quality_score" -> ((s, dir) => {
      // per-row score -> scaled LONG before the sum: qualityScore is already
      // round(x, 4), so score*10000 is an integer up to one double ulp, and
      // summing longs is exact and order-independent. The old
      // round(sum(double), 3) flipped its last digit at the 10x corpus when
      // the non-deterministic reduce order moved the sum one ulp across a
      // rounding boundary — integer aggregation removes that failure mode.
      docs(s, dir)
        .groupBy("source")
        .agg(sum(round(TextOps.qualityScore(col("text")) * 10000)
            .cast("long")).as("sum_quality_e4"),
          count(lit(1)).as("n"))
        .orderBy("source")
    }),
    "q_sample" -> ((s, dir) => {
      // deterministic corpus-mixing sample: membership is a pure function
      // of the key (Knuth multiplicative hash into 2^31 buckets), so the
      // oracle recomputes the EXACT same membership with plain BIGINT
      // arithmetic — unlike DataFrame.sample, whose RNG is partition-order
      // dependent and could never be value-checked cross-engine
      import s.implicits._
      val d = docs(s, dir)
      val nAll = d.count()
      val nBern = Sampling.bernoulli(d, "doc_id", 0.25, salt = 7).count()
      val nStrat = Sampling.stratified(d, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.1), default = 0.02, salt = 3).count()
      Seq((nAll, nBern, nStrat)).toDF("n_docs", "n_bern", "n_strat")
    }),
    "q_pii_redact" -> ((s, dir) => {
      // PII scrub cross-engine: plant one email, one IPv4, one card-shaped
      // digit run, and one 32-hex token per doc (id-derived), run the
      // redaction chain, and count each marker — DuckDB re-runs the SAME
      // regex chain on the SAME planted text, so any Java-vs-RE2 semantic
      // drift in the patterns fails the hash compare. The corpus text
      // itself rides along, so organically-occurring matches are covered
      // identically on both sides.
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10.2."),
        (col("doc_id") % 200).cast("string"),
        lit(".33 card 4111-1111-1111 token deadbeefdeadbeefdeadbeefdeadbeef."))
      def markers(r: org.apache.spark.sql.Column, m: String): org.apache.spark.sql.Column =
        ((length(r) - length(regexp_replace(r, m, ""))) / m.length).cast("long")
      docs(s, dir)
        .select(planted.as("p"), TextOps.redactPii(planted).as("r"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p") =!= col("r"), 1L).otherwise(0L)).as("docs_changed"),
          sum(markers(col("r"), "<EMAIL>")).as("emails"),
          sum(markers(col("r"), "<IP>")).as("ips"),
          sum(markers(col("r"), "<KEY>")).as("hexkeys"),
          sum(markers(col("r"), "<NUM>")).as("nums"))
    }),
    "q_rep_lines" -> ((s, dir) => {
      // repetition signal cross-engine: plant three duplicate lines per doc
      // and aggregate integer line counts (exact — no float summation
      // order to disagree on) plus a high-repetition doc count whose
      // per-doc fraction is an IEEE-exact integer division both engines
      // compute identically
      val planted = concat(col("text"), lit("\nEND\nfoo\nEND\nEND"))
      val lines = split(planted, "\n")
      val nL = size(lines)
      val nDup = nL - size(array_distinct(lines))
      docs(s, dir)
        .select(nL.as("nl"), nDup.as("nd"),
          TextOps.dupLineFraction(planted).as("f"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nl").cast("long")).as("sum_lines"),
          sum(col("nd").cast("long")).as("sum_dup_lines"),
          sum(when(col("f") >= 0.3, 1L).otherwise(0L)).as("high_rep_docs"))
    }),
    "q_lang_id" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"), TextOps.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    }),
    "q_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("source")
        .agg(countDistinct(TextOps.fingerprint(col("text"))).as("distinct_fp"))
        .orderBy("source")
    }),
    "q_minhash_lsh" -> ((s, dir) => {
      // value-checked MinHash-LSH: ground truth is the EXACT 5-gram jaccard
      // join (itself brute-force-equality-proven); the oracle recomputes the
      // >=0.9 true-pair count in DuckDB and pins the invariants — no
      // high-similarity pair missed, no emitted pair below a floor the
      // estimator can't plausibly cross, no bucket capped.
      import s.implicits._
      val d = docs(s, dir)
      val nDocs = d.count()
      // the WHOLE comparison — LSH under test, exact ground truth, and
      // every pinned invariant — runs on the same deterministic sample
      // universe (identity at driver correctness scales): the exact-
      // jaccard twin is quadratic, and comparing full-corpus LSH to
      // sampled truth would be vacuous for the sampled pairs anyway
      // (banding is per-doc, so sampled-universe bucket collisions are
      // exactly the full run's collisions restricted to the sample).
      val dS = d.where(
        sampleGate(col("doc_id"), nDocs, DocTruthCeiling, salt = 13))
      // signatures cached once — the operator references them three times
      // (banding + both join-backs) and the capped-bucket stat reuses them
      val sig = Dedup.minhashSignature(dS, "text", 32)
        .select(col("doc_id").as("__key"), col("minhash")).cache()
      // 16 bands x 2 rows, NOT 8 x 4: the lsh_missed_09=0 pin is only as
      // strong as the banding's miss probability, and (1-0.9^4)^8 = 2e-4
      // per pair actually fired at a 31892-true-pair corpus (2 misses in
      // the 10x replica run). (1-0.9^2)^16 = 3e-12 per pair keeps the
      // zero pin exact for any conceivable corpus (1e9 true pairs ->
      // 0.003 expected misses). maxBucket = 0 (uncapped) so the pin is
      // unconditional — the q_simhash convention; the sample gate bounds
      // the uncapped join's worst case, and capped_buckets still reports
      // the DefaultMaxBucket census the production (capped) run would see.
      val found = Dedup.minhashLshFromSig(sig,
        numHashes = 32, bands = 16, threshold = 0.5, maxBucket = 0)
      // one cached 5-shingle set frame serves the exact-verify join AND the
      // prefix-filtered ground-truth join (four internal references)
      val sh = dS.select(col("doc_id").as("__key"),
        array_sort(transform(TextOps.wordShingles(col("text"), 5),
          x => xxhash64(x))).as("__sh")).cache()
      // every emitted invariant comes from ONE full-outer aggregation of
      // (found pairs scored with their exact jaccard) against (exact >=0.9
      // ground truth): true-pair count, missed (truth rows no found pair
      // matched), and false positives (found pairs whose exact jaccard is
      // below the 0.2 floor) — round 4 ran the false-positive count as its
      // own job over the same join subtree
      val scored = found
        .join(sh.select(col("__key").as("keyA"), col("__sh").as("shA")), "keyA")
        .join(sh.select(col("__key").as("keyB"), col("__sh").as("shB")), "keyB")
        .withColumn("__i", size(array_intersect(col("shA"), col("shB"))))
        .withColumn("exact", col("__i").cast("double") /
          (size(col("shA")) + size(col("shB")) - col("__i")).cast("double"))
        .select(col("keyA"), col("keyB"), col("exact"), lit(1).as("__f"))
      val truth = Dedup.ngramJaccardFromSets(sh, blockCols = Seq.empty,
        threshold = 0.9)
      val tm = truth.select(col("keyA"), col("keyB"), lit(1).as("__t"))
        .join(scored, Seq("keyA", "keyB"), "full_outer")
        .agg(sum(when(col("__t").isNotNull, 1L).otherwise(0L)).as("t"),
          sum(when(col("__t").isNotNull && col("__f").isNull, 1L)
            .otherwise(0L)).as("m"),
          sum(when(col("__f").isNotNull && col("exact") < 0.2, 1L)
            .otherwise(0L)).as("fp"))
        .collect()(0)
      val truePairs = if (tm.isNullAt(0)) 0L else tm.getLong(0)
      val missed = if (tm.isNullAt(1)) 0L else tm.getLong(1)
      val falsePos = if (tm.isNullAt(2)) 0L else tm.getLong(2)
      val capped = Dedup.cappedBucketCount(
        Dedup.minhashBands(sig, bands = 16, rowsPerBand = 2),
        Seq("band", "bucket"), Dedup.DefaultMaxBucket)
      sig.unpersist(); sh.unpersist()
      Seq((nDocs, truePairs, missed, falsePos, capped))
        .toDF("n_docs", "true_pairs_09", "lsh_missed_09", "false_pos",
          "capped_buckets")
    }),
    "q_simhash" -> ((s, dir) => {
      // blocked pairs at maxDist=8 (five ~13-bit segments with 1-bit
      // variant enumeration — HmSearch blocking, full recall by pigeonhole:
      // five segments all carrying >= 2 of the 8 differing bits would total
      // 10 > 8) compared against brute-force all-pairs hamming: the
      // driver-checked mismatch count is pinned at zero. The blocking runs
      // UNCAPPED (maxBucket = 0) so the pigeonhole exactness is
      // unconditional at ANY sf: a capped run is only exact while no
      // segment bucket truncates, and at sf0.1 four hot buckets already
      // crossed DefaultMaxBucket, silently dropping pairs (round-3
      // measurement). This is the right scale for a verification query —
      // its brute-force twin is quadratic anyway; the production operator
      // (simhashNearDups) keeps the cap and reports cappedBucketCount.
      import s.implicits._
      val d = docs(s, dir)
      val withSim = Dedup.simhash(d, "text")
        .select(col("doc_id").as("__key"), col("simhash")).cache()
      val nDocs = withSim.count()
      // the brute-force twin is O(n²): above DocTruthCeiling BOTH sides of
      // the comparison run on the same deterministic key-hash sample (the
      // gate is the identity at every driver correctness scale), so the
      // blocked==brute equivalence stays checkable at any sf without the
      // crossJoin dominating the verification set (VERDICT r3 #1)
      val uni = withSim.where(
        sampleGate(col("__key"), nDocs, DocTruthCeiling, salt = 11))
      val blocked = Dedup.simhashPairs(uni, maxDist = 8, maxBucket = 0)
        .select("keyA", "keyB")
      val a = uni.select(col("__key").as("keyA"), col("simhash").as("sa"))
      val b = uni.select(col("__key").as("keyB"), col("simhash").as("sb"))
      val brute = a.crossJoin(b).where(col("keyA") < col("keyB"))
        .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 8)
        .select("keyA", "keyB")
      // ONE full-outer-join aggregation replaces the two anti-join counts
      // (each of which recompiled its whole subtree): missed = brute rows
      // with no blocked match, extra = blocked rows with no brute match
      val mm = brute.withColumn("__t", lit(1))
        .join(blocked.withColumn("__f", lit(1)), Seq("keyA", "keyB"),
          "full_outer")
        .agg(sum(when(col("__f").isNull, 1L).otherwise(0L)).as("missed"),
          sum(when(col("__t").isNull, 1L).otherwise(0L)).as("extra"))
        .collect()(0)
      val mismatches = (if (mm.isNullAt(0)) 0L else mm.getLong(0)) +
        (if (mm.isNullAt(1)) 0L else mm.getLong(1))
      withSim.unpersist()
      Seq((nDocs, mismatches)).toDF("n_docs", "mismatches")
    }),
    "q_ngram_jaccard" -> ((s, dir) => {
      // exact jaccard join within lang via prefix filtering (PPJoin-style
      // candidates -> exact verify; no quadratic block anywhere)
      val pairs = Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        blockCols = Seq("lang"), n = 3, threshold = 0.4)
      pairs.agg(count(lit(1)).as("sim_pairs"),
        coalesce(round(max(col("jaccard")), 3), lit(0.0)).as("max_jaccard"))
    }),
    "q_ann_topk" -> ((s, dir) => {
      // exact brute-force baseline — quadratic by definition, so above
      // EmbTruthCeiling it runs on the deterministic sample universe the
      // oracle replays (identity at driver correctness scales); the scale
      // path for full corpora is exactTopK/lshTopK/ivfTopK
      val emb = embeddings(s, dir)
      val nE = emb.count()
      val uni = emb.where(
        sampleGate(col("vec_id"), nE, EmbTruthCeiling, salt = 19))
      Similarity.bruteForceTopK(uni, "vec_id", "embedding", k = 3)
        .select("query", "neighbor", "rank")
        .orderBy("query", "rank")
    }),
    "q_ann_exact_probe" -> ((s, dir) => {
      // the DISTRIBUTED exact search: probe set broadcast, corpus streamed
      // in place (shuffle independent of corpus size) — the shape that
      // replaces bruteForceTopK's corpus collect at 100 TB. DuckDB
      // recomputes the same exact top-3 independently.
      val emb = embeddings(s, dir)
      Similarity.exactTopK(emb, emb.where(col("vec_id") % 50 === 0),
          "vec_id", "embedding", k = 3)
        .select("query", "neighbor", "rank")
        .orderBy("query", "rank")
    }),
    "q_ann_ivf" -> ((s, dir) => {
      // value-checked IVF invariants: full query coverage, ranks are a
      // dense 1..n with non-increasing cosine, and every reported cosine
      // equals the exact cosine recomputed from the source embeddings
      annInvariants(s, dir,
        emb => Similarity.ivfTopK(emb, "vec_id", "embedding",
          k = 3, nLists = 8, nProbe = 2))
    }),
    "q_ann_lsh" -> ((s, dir) => {
      // same invariant gate over the multi-table LSH path. Operating point
      // (tables=4, planes=5, probes=3) from the round-5 RecallProbe sweep:
      // HIGHER recall than round 4's 8x6x2 (0.72/0.76 vs 0.68/0.76 at
      // sf0.01/sf0.1) at ~75% of the wall time — multi-probe's trade of
      // tables for probes (Lv et al. 2007), plus one plane fewer so each
      // table's buckets stay populated enough to probe well.
      annInvariants(s, dir,
        emb => Similarity.lshTopK(emb, "vec_id", "embedding",
          k = 3, planes = 5, tables = 4, probes = 3))
    }),
    "q_ann_recall" -> ((s, dir) => {
      // value-checks the SCALE-PATH ANN (lsh/ivf), not just the broadcast
      // brute force: recall@3 against the exact top-3 must clear fixed
      // floors. Deterministic (both ANN variants are seed-fixed), so the
      // oracle row is a constant the driver can verify.
      import s.implicits._
      val embFull = embeddings(s, dir)
      // recall is judged against the exact (quadratic) baseline, so the
      // WHOLE comparison universe — baseline and both ANN paths — rides
      // the deterministic sample gate (identity at driver correctness
      // scales); comparing full-corpus ANN to sampled truth would charge
      // out-of-sample neighbors against recall
      val nE = embFull.count()
      val emb = embFull.where(
        sampleGate(col("vec_id"), nE, EmbTruthCeiling, salt = 19))
      // ONE aggregation job scores both ANN paths against the exact
      // baseline (was: cached bf + two recall() calls + a distinct count =
      // five separate jobs): the union'd candidate pairs left-join the
      // exact pairs, and hits per algorithm, total, and query coverage all
      // fall out of a single agg. A bf pair matched by BOTH algorithms
      // contributes one row per algorithm, so `total` counts distinct bf
      // pairs, not join rows.
      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
        .select("query", "neighbor")
      val lshP = Similarity.lshTopK(emb, "vec_id", "embedding", k = 3,
          planes = 5, tables = 4, probes = 3)
        .select("query", "neighbor").withColumn("__alg", lit(1))
      val ivfP = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
          nLists = 8, nProbe = 3)
        .select("query", "neighbor").withColumn("__alg", lit(2))
      val r = bf.join(lshP.unionByName(ivfP), Seq("query", "neighbor"),
          "left_outer")
        .agg(countDistinct(col("query")).as("nq"),
          countDistinct(col("query"), col("neighbor")).as("total"),
          sum(when(col("__alg") === 1, 1L).otherwise(0L)).as("lsh_hits"),
          sum(when(col("__alg") === 2, 1L).otherwise(0L)).as("ivf_hits"))
        .head()
      val nQ = if (r.isNullAt(0)) 0L else r.getLong(0)
      val total = if (r.isNullAt(1)) 0L else r.getLong(1)
      val lshR = if (total == 0) 1.0
        else (if (r.isNullAt(2)) 0L else r.getLong(2)).toDouble / total
      val ivfR = if (total == 0) 1.0
        else (if (r.isNullAt(3)) 0L else r.getLong(3)).toDouble / total
      // floors set from measurements (RecallProbe across sf0.01/sf0.1:
      // lsh tables=4 planes=5 probes=3 recall 0.72/0.76; ivf nLists=8
      // nProbe=3 0.64-0.65) with regression headroom
      Seq((nQ, ivfR >= 0.6, lshR >= 0.6))
        .toDF("n_queries", "ivf_recall_ok", "lsh_recall_ok")
    }),
    "q_embed_neardup" -> ((s, dir) => {
      // value-checked near-dup: true pair count (exact cosine >= 0.9 over
      // all pairs) is recomputed by DuckDB's list_cosine_similarity; the
      // LSH result is compared against the Spark-side truth computed with
      // the IDENTICAL unit-vector arithmetic (float promoted to double,
      // index-order accumulation), so false_pos/missed are pure set
      // comparisons (bucketing decides, not float rounding).
      //
      // Round-5 shape (VERDICT r4 #7): the gated universe is BOUNDED
      // (<= ~EmbTruthCeiling rows) by construction, so it is collected
      // ONCE and the ground truth runs driver-side — three jobs total
      // (metadata, universe collect, operator + broadcast-join agg)
      // instead of round 4's cache-fill + corpus re-collect + full-outer
      // sort-merge join chain. The OPERATOR under test still runs fully
      // distributed over the same planted universe.
      import s.implicits._
      val base = embeddings(s, dir)
      // planted ids offset past max(vec_id), NOT a fixed constant: a fixed
      // +100000 collides with real ids once the table outgrows 100k rows
      val mc = base.agg(max(col("vec_id")).as("mx"), count(lit(1)).as("n"))
        .head()
      val off = mc.getLong(0) + 1L
      // quadratic-twin gate (identity at every driver correctness scale):
      // above EmbTruthCeiling the operator AND its brute-force truth run
      // on the same deterministic sample universe, which the DuckDB
      // oracle replays — the all-pairs cosine scan stays bounded at any sf
      val gated = base
        .where(sampleGate(col("vec_id"), mc.getLong(1), EmbTruthCeiling,
          salt = 17))
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // plant 5 exact duplicates of the smallest vec_ids (max natural
      // pairwise cosine in the synthetic table is ~0.51, far under any
      // near-dup threshold); the DuckDB oracle replays the same union
      val planted = gated ++ gated.take(5).map { case (id, v) => (id + off, v) }
      val nVecs = planted.length.toLong
      // driver-side exact truth, operation-for-operation the arithmetic of
      // the retired bruteForceNearDups kernel (normalize each vector once,
      // double dot in index order, keyA < keyB, >= threshold)
      val units = planted.map { case (id, v) =>
        var ss = 0.0
        var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(ss)
        val u = if (nrm > 0) v.map(_ / nrm) else new Array[Double](v.length)
        (id, u)
      }
      val truth = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var ai = 0
      while (ai < units.length) {
        var bi = ai + 1
        while (bi < units.length) {
          val (ida, ua) = units(ai)
          val (idb, ub) = units(bi)
          var d = 0.0
          var j = 0
          while (j < ua.length) { d += ua(j) * ub(j); j += 1 }
          if (d >= 0.9) truth +=
            ((math.min(ida, idb), math.max(ida, idb)))
          bi += 1
        }
        ai += 1
      }
      // the operator under test, distributed over the planted universe
      val schema = StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding",
          ArrayType(DoubleType, containsNull = false), nullable = false)))
      val emb = s.createDataFrame(
        s.sparkContext.parallelize(
          planted.toSeq.map(p => Row(p._1, p._2.toSeq)), 8), schema)
      val found = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
        threshold = 0.9, planes = 8).select("keyA", "keyB")
      // ONE broadcast-join aggregation: false positives are found-pairs
      // outside the truth set; hits fall out of the same counts and missed
      // is |truth| - hits (truth is already driver-side)
      val truthDf = broadcast(truth.toSeq.toDF("keyA", "keyB")
        .withColumn("__t", lit(1)))
      val fm = found.join(truthDf, Seq("keyA", "keyB"), "left_outer")
        .agg(count(lit(1)).as("nf"),
          sum(when(col("__t").isNull, 1L).otherwise(0L)).as("fp"))
        .head()
      val nFound = if (fm.isNullAt(0)) 0L else fm.getLong(0)
      val falsePos = if (fm.isNullAt(1)) 0L else fm.getLong(1)
      val missed = truth.length.toLong - (nFound - falsePos)
      Seq((nVecs, truth.length.toLong, falsePos, missed))
        .toDF("n_vecs", "true_pairs", "false_pos", "lsh_missed")
    }),
    "q_multimodal_image" -> ((s, dir) => {
      // REAL image decode (JDK ImageIO, zero new deps): one solid-color
      // PNG per doc with dimensions/color derived from doc_id; the decoder
      // must recover the true width/height and 4x4 block luminances from
      // actual pixels. The oracle recomputes the dimension arithmetic
      // independently; the luminance check is pinned at zero violations.
      import s.implicits._
      val png = docs(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 16 + (id % 48).toInt
          val h = 16 + (id % 31).toInt
          val r = ((id * 37) % 256).toInt
          val g = ((id * 101) % 256).toInt
          val b = ((id * 53) % 256).toInt
          (id, Multimodal.solidPng(w, h, (r << 16) | (g << 8) | b))
        }).toDF("doc_id", "payload")
      val feats = Multimodal.extractFeatures(png, "doc_id", "payload").toDF()
      val expLum = ((col("key") * 37 % 256) + (col("key") * 101 % 256) +
        (col("key") * 53 % 256)).cast("double") / lit(3.0 * 255.0)
      feats
        .withColumn("__bad",
          col("mediaType") =!= "image" ||
          col("width") =!= (lit(16) + col("key") % 48).cast("int") ||
          col("height") =!= (lit(16) + col("key") % 31).cast("int") ||
          size(filter(col("features"), f => abs(f - expLum) > 0.0005)) > 0)
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"),
          sum(col("__bad").cast("long")).as("bad"))
    }),
    "q_multimodal_video" -> ((s, dir) => {
      // REAL video container-metadata decode (MP4 box walk / AVI RIFF walk,
      // zero new deps; frame decode stays a declared stub — no JDK codec):
      // alternating tiny MP4s and AVIs with dimensions/duration derived
      // from doc_id; the decoder must recover the true presentation
      // width/height from tkhd/avih and the duration from mvhd
      // timescale/duration or avih frame timing. The oracle recomputes the
      // header arithmetic; duration/fps checks pinned at zero violations.
      import s.implicits._
      val vids = docs(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 160 + (id % 480).toInt
          val h = 120 + (id % 360).toInt
          val payload =
            if (id % 2 == 0) Multimodal.tinyMp4(w, h, timescale = 600,
              duration = 600 * (1 + (id % 9).toInt))
            else Multimodal.tinyAvi(w, h, usPerFrame = 40000,
              totalFrames = 25 * (1 + (id % 9).toInt))
          (id, payload)
        }).toDF("doc_id", "payload")
      val feats = Multimodal.extractFeatures(vids, "doc_id", "payload",
        mediaType = "video").toDF()
      val expDur = (lit(1) + col("key") % 9).cast("float")
      val expFps = when(col("key") % 2 === 0, lit(0.0f)).otherwise(lit(25.0f))
      feats
        .withColumn("__bad",
          col("mediaType") =!= "video" ||
          col("width") =!= (lit(160) + col("key") % 480).cast("int") ||
          col("height") =!= (lit(120) + col("key") % 360).cast("int") ||
          abs(element_at(col("features"), 1) - expDur) > 1e-6 ||
          abs(element_at(col("features"), 2) - expFps) > 1e-6)
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"),
          sum(col("__bad").cast("long")).as("bad"))
    }),
    "q_multimodal_audio" -> ((s, dir) => {
      // REAL audio decode (JDK javax.sound.sampled, zero new deps): one
      // mono square-wave WAV per doc with frames/amplitude derived from
      // doc_id; the decoder must recover the true sample rate and channel
      // count from the container header and the amplitude from the actual
      // PCM samples (|sample| == amp everywhere, so RMS == amp in every
      // window). The oracle recomputes the header arithmetic; the RMS
      // check is pinned at zero violations.
      import s.implicits._
      val wav = docs(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val frames = 320 + (id % 197).toInt
          val amp = 1000 + (id % 20000).toInt
          (id, Multimodal.squareWav(8000, frames, amp))
        }).toDF("doc_id", "payload")
      val feats = Multimodal.extractFeatures(wav, "doc_id", "payload",
        mediaType = "audio").toDF()
      val expRms = (lit(1000) + col("key") % 20000).cast("double") / lit(32768.0)
      feats
        .withColumn("__bad",
          col("mediaType") =!= "audio" ||
          col("width") =!= 8000 || col("height") =!= 1 ||
          size(filter(col("features"), f => abs(f - expRms) > 1e-4)) > 0)
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("sum_hz"),
          sum(col("height").cast("long")).as("sum_ch"),
          sum(col("__bad").cast("long")).as("bad"))
    }),
    "q_multimodal_stub" -> ((s, dir) => {
      val bin = docs(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(bin, "doc_id", "payload").toDF()
        .agg(count(lit(1)).as("n"), sum(col("numBytes")).as("total_bytes"),
          min(col("width")).as("min_w"), max(col("height")).as("max_h"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_rt_dict_lang" ->
      "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang ORDER BY lang",
    "q_rt_map_meta" ->
      "SELECT doc_id, lang, source FROM documents ORDER BY doc_id",
    "q_rt_plain_text" ->
      "SELECT doc_id, CAST(length(text) AS BIGINT) AS n FROM documents ORDER BY doc_id",
    "q_rt_fsst_text" ->
      "SELECT lang, CAST(sum(length(text)) AS BIGINT) AS total_chars FROM documents GROUP BY lang ORDER BY lang",
    "q_rt_delta_orderkey" ->
      "SELECT count(*) AS n, min(l_orderkey) AS mn, max(l_orderkey) AS mx, CAST(sum(l_orderkey) AS BIGINT) AS s, CAST(sum(l_linenumber) AS BIGINT) AS sl FROM lineitem",
    "q_rt_deltabyte_source" ->
      "SELECT source, count(*) AS cnt FROM documents GROUP BY source ORDER BY source",
    "q_rt_deltalen_text" ->
      "SELECT CAST(sum(strlen(text)) AS BIGINT) AS total_bytes, count(*) AS n FROM documents",
    "q_rt_rle_flag" ->
      "SELECT (l_quantity >= 25) AS flag, count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_rt_auto_docs" ->
      "SELECT count(*) AS n, count(DISTINCT doc_id) AS nd, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents",
    "q_rt_events_ts" ->
      "SELECT count(*) AS n, min(ts) AS mn_ts, max(ts) AS mx_ts, count(DISTINCT event_type) AS ntypes FROM events",
    "q_rt_zstd_text" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(strlen(text)) AS BIGINT) AS bytes FROM documents GROUP BY lang ORDER BY lang",
    "q_rt_gzip_text" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(strlen(text)) AS BIGINT) AS bytes FROM documents GROUP BY lang ORDER BY lang",
    "q_rt_brotli_text" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(strlen(text)) AS BIGINT) AS bytes FROM documents GROUP BY lang ORDER BY lang",
    "q_parquet_brotli" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents GROUP BY lang ORDER BY lang",
    "q_rt_struct" ->
      ("SELECT count(*) AS n, " +
        "count(CASE WHEN n_chars % 9 = 0 THEN NULL ELSE 1 END) AS n_struct, " +
        "count(CASE WHEN n_chars % 9 = 0 OR n_chars % 7 = 0 THEN NULL ELSE source END) AS n_src, " +
        "CAST(sum(CASE WHEN n_chars % 9 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS sum_nc, " +
        "count(DISTINCT CASE WHEN n_chars % 9 = 0 THEN NULL ELSE lang END) AS nd_lang " +
        "FROM documents"),
    "q_parquet_file_rt" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents GROUP BY lang ORDER BY lang",
    "q_parquet_file_v2" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents GROUP BY lang ORDER BY lang",
    "q_parquet_dist_read" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id BETWEEN 100 AND 2000 GROUP BY lang ORDER BY lang",
    "q_parquet_hive_part" ->
      "SELECT count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS text_chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE lang = 'en'",
    "q_parquet_dpp_join" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id % 97 = 0 GROUP BY lang ORDER BY lang",
    "q_parquet_resumable" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents GROUP BY lang ORDER BY lang",
    "q_streaming_encode" ->
      "SELECT count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id % 7 = 0",
    "q_streaming_dedup" ->
      // representative set = min doc_id per distinct text of the slice,
      // plus the planted new-key row emitted after the restart; every
      // duplicate copy (same texts at +off/+2off/+3off) must contribute
      // nothing
      ("WITH s AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0), " +
        "o AS (SELECT max(doc_id) + 1 AS off FROM documents), " +
        "m AS (SELECT text, min(doc_id) AS mid FROM s GROUP BY text) " +
        "SELECT CAST(count(*) + 1 AS BIGINT) AS n_rows, " +
        "CAST(sum(mid) + 4 * (SELECT off FROM o) AS BIGINT) AS sum_id, " +
        "CAST(sum(length(text)) + length('planted unique streaming doc') AS BIGINT) AS chars " +
        "FROM m"),
    "q_streaming_pqsink" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id % 7 = 0 GROUP BY lang ORDER BY lang",
    "q_cli_read" ->
      "SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_id, CAST(sum(n_chars) AS BIGINT) AS sum_nc, count(DISTINCT lang) AS nd_lang FROM documents WHERE doc_id % 11 = 0",
    "q_cli_encode" ->
      ("SELECT * FROM (" +
        "SELECT 'doc_id' AS col_name, CAST(8*count(*) AS BIGINT) AS input_bytes, 1 AS resume_stable FROM documents " +
        "UNION ALL SELECT 'lang', CAST(sum(4 + strlen(lang)) AS BIGINT), 1 FROM documents " +
        "UNION ALL SELECT 'source', CAST(sum(4 + strlen(source)) AS BIGINT), 1 FROM documents " +
        "UNION ALL SELECT 'text', CAST(sum(4 + strlen(text)) AS BIGINT), 1 FROM documents" +
        ") ORDER BY col_name"),
    "q_cli_resume_refusal" ->
      // the refusal outcomes are pinned constants (1 = config mismatch,
      // 2 = missing marker); n_docs ties the run to the real corpus
      "SELECT count(*) AS n_docs, 1 AS refused_projection, 1 AS refused_schema_evolution, 2 AS refused_no_marker, 1 AS resume_stable FROM documents",
    "q_parquet_page_prune" ->
      "SELECT count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS text_chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id BETWEEN 500 AND 1499",
    "q_parquet_sql_read" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id BETWEEN 100 AND 2000 GROUP BY lang ORDER BY lang",
    "q_parquet_agg_pushdown" ->
      "SELECT count(*) AS cnt, min(doc_id) AS mn_id, max(doc_id) AS mx_id, min(n_chars) AS mn_chars, max(n_chars) AS mx_chars FROM documents",
    "q_parquet_bloom_prune" ->
      "SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents WHERE doc_id IN (3, 777, 1500)",
    "q_parquet_int96" ->
      "SELECT count(*) AS n, min(ts) AS mn_ts, max(ts) AS mx_ts, count(DISTINCT event_type) AS ntypes FROM events",
    "q_parquet_flba" ->
      ("SELECT count(*) AS n, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_price, " +
        "CAST(max(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS max_price, " +
        "CAST(sum(l_orderkey) AS BIGINT) AS sum_k FROM lineitem"),
    "q_parquet_enc_auto" ->
      "SELECT lang, count(*) AS cnt, CAST(sum(length(text)) AS BIGINT) AS chars, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM documents GROUP BY lang ORDER BY lang",
    "q_parquet_col_props" ->
      // footer pin audit happens Spark-side (pins_ok constant); the
      // aggregates prove the mixed-codec mixed-encoding file reads back
      // as a faithful copy of the source table
      ("SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id, " +
        "CAST(sum(length(text)) AS BIGINT) AS chars, " +
        "count(DISTINCT lang) AS n_lang, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_nc, " +
        "CAST(1 AS BOOLEAN) AS pins_ok FROM documents"),
    "q_rt_nulls" ->
      ("SELECT count(*) AS n, " +
        "count(CASE WHEN n_chars % 7 = 0 THEN NULL ELSE source END) AS nn_source, " +
        "count(CASE WHEN n_chars % 5 = 0 THEN NULL ELSE n_chars END) AS nn_chars, " +
        "CAST(sum(CASE WHEN n_chars % 5 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS sum_chars, " +
        "count(DISTINCT CASE WHEN n_chars % 7 = 0 THEN NULL ELSE source END) AS nd_source " +
        "FROM documents"),
    "q_lang_id" -> {
      // same stopword table as TextOps.langId, replayed WITHOUT list
      // lambdas (round-1 flagged those as a DuckDB-portability risk): a
      // token equals a stopword iff the \b-anchored alternation matches, so
      // per-lang hits = len(regexp_extract_all(...)); the argmax with
      // greatest(struct(hits, lang)) tie-break (max hits, then max lang)
      // becomes row_number() ORDER BY hits DESC, cand DESC.
      val langs = TextOps.stopwords.toSeq.sortBy(_._1)
      val hitCols = langs.map { case (l, ws) =>
        s"len(regexp_extract_all(lower(text), '\\b(?:${ws.mkString("|")})\\b')) AS h_$l"
      }.mkString(", ")
      val unions = langs.map { case (l, _) =>
        s"SELECT doc_id, lang, '$l' AS cand, h_$l AS hits FROM h"
      }.mkString(" UNION ALL ")
      s"WITH h AS (SELECT doc_id, lang, $hitCols FROM documents), " +
        s"u AS ($unions), " +
        "b AS (SELECT lang, cand, hits, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY hits DESC, cand DESC) AS rn FROM u) " +
        "SELECT lang, CASE WHEN hits > 0 THEN cand ELSE 'und' END AS predicted, " +
        "count(*) AS cnt FROM b WHERE rn = 1 " +
        "GROUP BY lang, predicted ORDER BY lang, predicted"
    },
    "q_rt_decimal" ->
      ("SELECT count(*) AS n, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price, " +
        "CAST(min(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS min_disc, " +
        "CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price " +
        "FROM lineitem"),
    "q_rt_array_embed" ->
      "SELECT count(*) AS n, CAST(sum(len(embedding)) AS BIGINT) AS sum_len, CAST(0 AS BIGINT) AS mismatches FROM embeddings",
    "q_rt_array_tokens" ->
      "SELECT count(*) AS n, CAST(sum(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS BIGINT) AS sum_toks, CAST(0 AS BIGINT) AS mismatches FROM documents",
    "q_prune_decode" ->
      ("SELECT count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS s, " +
        "round(sum(l_quantity), 2) AS sq FROM lineitem " +
        "WHERE l_orderkey BETWEEN 1000 AND 3000"),
    "q_enc_lineage_bytes" ->
      ("SELECT 'doc_id' AS col_name, CAST(8*count(*) AS BIGINT) AS input_bytes FROM documents " +
        "UNION ALL SELECT 'lang', CAST(sum(4 + strlen(lang)) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'n_chars', CAST(8*count(*) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'source', CAST(sum(4 + strlen(source)) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'text', CAST(sum(4 + strlen(text)) AS BIGINT) FROM documents " +
        "ORDER BY col_name"),
    "q_verify_roundtrip" ->
      "SELECT count(*) AS rows_source, count(*) AS rows_decoded, CAST(0 AS BIGINT) AS mismatches FROM documents",
    "q_dedup_exact" ->
      // keep-first-by-doc_id per GLOBAL fingerprint, then count per lang —
      // exactly Dedup.exact's semantics (a text duplicated across langs
      // survives once, in the lang of its smallest doc_id)
      ("SELECT lang, count(*) AS distinct_texts FROM (" +
        "SELECT lang, row_number() OVER (" +
        "PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') " +
        "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 " +
        "GROUP BY lang ORDER BY lang"),
    "q_token_count" ->
      "SELECT lang, CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS tokens, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    "q_text_quality" ->
      ("SELECT source, CAST(sum(length(text)) AS BIGINT) AS chars, " +
        "CAST(sum(length(text) - length(regexp_replace(text, '\\s', '', 'g'))) AS BIGINT) AS spaces, " +
        "CAST(sum(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS BIGINT) AS alphas, " +
        "CAST(sum(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT) AS digits " +
        "FROM documents GROUP BY source ORDER BY source"),
    "q_fingerprint" ->
      "SELECT source, count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS distinct_fp FROM documents GROUP BY source ORDER BY source",
    "q_token_bpe" ->
      "SELECT lang, CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    "q_token_bpe_merge" -> {
      // rank-ordered replace() replay of the SAME merge table (valid for
      // creation-ordered tables with single-char symbols — Bpe scaladoc);
      // token count == length of the rewritten string
      val replayed = graft.functions.Bpe.SyntheticTable.merges.foldLeft(
        "regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g')") {
        case (acc, m) => s"replace($acc, '${m.left}${m.right}', '${m.out}')"
      }
      s"SELECT lang, count(*) AS n, CAST(sum(length($replayed)) AS BIGINT) " +
        s"AS total_tokens FROM documents GROUP BY lang ORDER BY lang"
    },
    "q_token_bpe_learned" ->
      // the merge table and the fast-vs-rescan token equality are verified
      // Spark-side (two independent algorithm implementations must agree,
      // the q_simhash differential pattern); DuckDB independently replays
      // the document count, the pinned merge budget, and the twin-universe
      // gate membership arithmetic
      ("SELECT count(*) AS n_docs, 10000 AS n_merges, " +
        "CAST(count(CASE WHEN " +
        sampleGateSql("doc_id", "documents", 500L, 23) +
        " THEN 1 END) AS BIGINT) AS n_gated, " +
        "CAST(0 AS BIGINT) AS mismatches, " +
        "CAST(0 AS BIGINT) AS bound_violations FROM documents"),
    "q_quality_score" ->
      // identical double-arithmetic order to TextOps.qualityScore, so the
      // per-row round(..., 4) agrees bit for bit; the per-row score is then
      // scaled to an e4 BIGINT before the sum — integer aggregation is
      // exact and order-independent, unlike round(sum(double), 3), whose
      // last digit flipped on reduce-order ulp at the 10x corpus
      ("SELECT source, CAST(sum(CAST(round(" +
        "round(least(1.0, greatest(0.0, " +
        "(CASE WHEN length(text) < 20 THEN length(text)/20.0 " +
        "WHEN length(text) > 20000 THEN 0.5 ELSE 1.0 END) " +
        "* (0.5 + (CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE / length(text) ELSE 0.0 END) * 0.5) " +
        "* (CASE WHEN (CASE WHEN length(text) > 0 THEN (length(text) - length(regexp_replace(text, '\\s', '', 'g')))::DOUBLE / length(text) ELSE 0.0 END) > 0.6 THEN 0.3 ELSE 1.0 END)" +
        ")), 4) * 10000) AS BIGINT)) AS BIGINT) AS sum_quality_e4, count(*) AS n " +
        "FROM documents GROUP BY source ORDER BY source"),
    "q_sample" ->
      // same Knuth-hash membership arithmetic in plain BIGINT; thresholds
      // are the Scala-side floor(fraction * 2^31) literals. DuckDB's % is
      // sign-preserving while bucketOf uses pmod, so the innermost
      // remainder is folded non-negative — the two engines then agree for
      // negative keys too (all later terms stay >= 0 and < 2^63)
      ("WITH b AS (SELECT lang, " +
        "(((doc_id % 2147483648 + 2147483648) % 2147483648 + 7) % 2147483648 * 2654435761) % 2147483648 AS b7, " +
        "(((doc_id % 2147483648 + 2147483648) % 2147483648 + 3) % 2147483648 * 2654435761) % 2147483648 AS b3 " +
        "FROM documents) " +
        "SELECT count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN b7 < 536870912 THEN 1 ELSE 0 END) AS BIGINT) AS n_bern, " +
        "CAST(sum(CASE WHEN b3 < (CASE WHEN lang = 'en' THEN 1073741824 " +
        "WHEN lang = 'de' THEN 214748364 ELSE 42949672 END) THEN 1 ELSE 0 END) AS BIGINT) AS n_strat " +
        "FROM b"),
    "q_pii_redact" ->
      // the SAME regex chain on the SAME planted text, in RE2: cross-engine
      // agreement on every pattern is the point of this oracle
      ("WITH p AS (SELECT text || ' contact user' || CAST(doc_id AS VARCHAR) " +
        "|| '@mail.example.com from 10.2.' || CAST(doc_id % 200 AS VARCHAR) " +
        "|| '.33 card 4111-1111-1111 token deadbeefdeadbeefdeadbeefdeadbeef.' AS p " +
        "FROM documents), " +
        "r AS (SELECT p, regexp_replace(regexp_replace(regexp_replace(regexp_replace(p, " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', '<IP>', 'g'), " +
        "'\\b[0-9a-fA-F]{32,}\\b', '<KEY>', 'g'), " +
        "'\\b[0-9][0-9\\-]{5,13}[0-9]\\b', '<NUM>', 'g') AS r FROM p) " +
        "SELECT count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN p <> r THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed, " +
        "CAST(sum((length(r) - length(replace(r, '<EMAIL>', ''))) / 7) AS BIGINT) AS emails, " +
        "CAST(sum((length(r) - length(replace(r, '<IP>', ''))) / 4) AS BIGINT) AS ips, " +
        "CAST(sum((length(r) - length(replace(r, '<KEY>', ''))) / 5) AS BIGINT) AS hexkeys, " +
        "CAST(sum((length(r) - length(replace(r, '<NUM>', ''))) / 5) AS BIGINT) AS nums " +
        "FROM r"),
    "q_rep_lines" ->
      ("WITH p AS (SELECT text || chr(10) || 'END' || chr(10) || 'foo' || " +
        "chr(10) || 'END' || chr(10) || 'END' AS p FROM documents), " +
        "m AS (SELECT len(string_split(p, chr(10))) AS nl, " +
        "len(string_split(p, chr(10))) - len(list_distinct(string_split(p, chr(10)))) AS nd " +
        "FROM p) " +
        "SELECT count(*) AS n_docs, CAST(sum(nl) AS BIGINT) AS sum_lines, " +
        "CAST(sum(nd) AS BIGINT) AS sum_dup_lines, " +
        "CAST(sum(CASE WHEN CAST(nd AS DOUBLE) / nl >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS high_rep_docs " +
        "FROM m"),
    "q_multimodal_image" ->
      ("SELECT count(*) AS n, " +
        "CAST(sum(16 + doc_id % 48) AS BIGINT) AS sum_w, " +
        "CAST(sum(16 + doc_id % 31) AS BIGINT) AS sum_h, " +
        "CAST(0 AS BIGINT) AS bad FROM documents"),
    "q_multimodal_audio" ->
      ("SELECT count(*) AS n, CAST(8000 * count(*) AS BIGINT) AS sum_hz, " +
        "CAST(count(*) AS BIGINT) AS sum_ch, CAST(0 AS BIGINT) AS bad " +
        "FROM documents"),
    "q_multimodal_video" ->
      ("SELECT count(*) AS n, " +
        "CAST(sum(160 + doc_id % 480) AS BIGINT) AS sum_w, " +
        "CAST(sum(120 + doc_id % 360) AS BIGINT) AS sum_h, " +
        "CAST(0 AS BIGINT) AS bad FROM documents"),
    "q_multimodal_stub" ->
      // replays Multimodal.stubDecode's closed-form hash (length + first/
      // mid/last byte; ASCII corpus so ascii(char) == utf-8 byte) — plain
      // arithmetic, no list lambdas; modulus = (1<<57)-13 keeps every term
      // inside BIGINT on both engines
      ("WITH h AS (SELECT strlen(text) AS nb, " +
        "CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END AS fb, " +
        "CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(substr(text, CAST(strlen(text) // 2 + 1 AS INT), 1)) END AS mb, " +
        "CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(substr(text, CAST(strlen(text) AS INT), 1)) END AS lb " +
        "FROM documents), " +
        "g AS (SELECT nb, (nb * 2654435761 + fb * 65599 + mb * 499 + lb) % 144115188075855859 AS hv FROM h) " +
        "SELECT count(*) AS n, CAST(sum(nb) AS BIGINT) AS total_bytes, " +
        "CAST(min(64 + hv % 960) AS INT) AS min_w, " +
        "CAST(max(64 + (hv // 8192) % 960) AS INT) AS max_h FROM g"),
    "q_ngram_jaccard" ->
      // brute-force all-pairs within lang over the same word-3-gram shingle
      // sets (set semantics; Spark's 64-bit shingle hashing is
      // collision-free at oracle scale) — value-checks the exact
      // prefix-filtered join end to end. Shingles are built with
      // unnest + lead() window (no list lambdas): shingle at pos p is
      // toks[p..p+2] truncated at the end, kept for p <= max(1, nt-2) —
      // exactly Spark's slice()+array_join semantics incl. short docs.
      ("WITH norm AS (SELECT lang, doc_id, " +
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks " +
        "FROM documents), " +
        "tok AS (SELECT lang, doc_id, len(toks) AS nt, unnest(toks) AS tok, " +
        "generate_subscripts(toks, 1) AS pos FROM norm), " +
        "s0 AS (SELECT lang, doc_id, nt, pos, tok " +
        "|| coalesce(' ' || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos), '') " +
        "|| coalesce(' ' || lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos), '') AS g " +
        "FROM tok), " +
        "sh AS (SELECT DISTINCT lang, doc_id, g FROM s0 WHERE pos <= greatest(1, nt - 2)), " +
        "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "ix AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i " +
        "FROM sh a JOIN sh b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id), " +
        "j AS (SELECT CAST(ix.i AS DOUBLE) / (sa.n + sb.n - ix.i) AS jac " +
        "FROM ix JOIN sz sa ON ix.da = sa.doc_id JOIN sz sb ON ix.db = sb.doc_id) " +
        "SELECT count(*) AS sim_pairs, coalesce(round(max(jac), 3), 0.0) AS max_jaccard " +
        "FROM j WHERE jac >= 0.4"),
    "q_ann_recall" ->
      // the recall floors are evaluated Spark-side; the oracle pins the
      // query coverage (over the same sample-gated universe) and that both
      // scale-path ANN variants clear them
      ("SELECT count(*) AS n_queries, CAST(1 AS BOOLEAN) AS ivf_recall_ok, " +
        "CAST(1 AS BOOLEAN) AS lsh_recall_ok FROM embeddings WHERE " +
        sampleGateSql("vec_id", "embeddings", EmbTruthCeiling, 19)),
    "q_ann_ivf" ->
      // coverage + structural invariants verified Spark-side (dense ranks,
      // non-increasing cosine, cosine == exact recompute); pinned at zero.
      // The universe is the q_ann_recall sample gate (identity at driver
      // scales), whose membership DuckDB replays
      ("SELECT count(*) AS n_queries, count(*) AS queries_covered, CAST(0 AS BIGINT) AS bad_rank, CAST(0 AS BIGINT) AS bad_cosine FROM embeddings WHERE " +
        sampleGateSql("vec_id", "embeddings", EmbTruthCeiling, 19)),
    "q_ann_lsh" ->
      ("SELECT count(*) AS n_queries, count(*) AS queries_covered, CAST(0 AS BIGINT) AS bad_rank, CAST(0 AS BIGINT) AS bad_cosine FROM embeddings WHERE " +
        sampleGateSql("vec_id", "embeddings", EmbTruthCeiling, 19)),
    "q_simhash" ->
      // Spark computes blocked-vs-brute-force mismatches; uncapped pigeonhole
      // blocking (floor(d/2)+1 segments, 1-bit variants enumerated) makes
      // the zero pin exact and unconditional at any scale, not probabilistic
      "SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS mismatches FROM documents",
    "q_embed_neardup" ->
      // DuckDB recomputes the TRUE cosine>=0.9 pair count brute-force;
      // false_pos is structurally zero (the operator verifies candidates
      // with exact cosine); lsh_missed pinned from the deterministic
      // hash-seeded bucketing
      ("WITH base_s AS (SELECT vec_id, embedding FROM embeddings WHERE " +
        sampleGateSql("vec_id", "embeddings", EmbTruthCeiling, 17) + "), " +
        "all_v AS (SELECT vec_id, embedding FROM base_s " +
        "UNION ALL SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings), " +
        "embedding FROM " +
        "(SELECT vec_id, embedding FROM base_s ORDER BY vec_id LIMIT 5)), " +
        "p AS (SELECT a.vec_id AS ka, b.vec_id AS kb, " +
        "list_cosine_similarity(a.embedding, b.embedding) AS c " +
        "FROM all_v a, all_v b WHERE a.vec_id < b.vec_id) " +
        "SELECT (SELECT count(*) FROM all_v) AS n_vecs, " +
        "count(*) AS true_pairs, CAST(0 AS BIGINT) AS false_pos, " +
        "CAST(0 AS BIGINT) AS lsh_missed FROM p WHERE c >= 0.9"),
    "q_minhash_lsh" ->
      // brute-force 5-gram jaccard in DuckDB (same construction as the
      // 3-gram q_ngram_jaccard oracle): true >=0.9 pair count is recomputed
      // independently; missed/false-positive/capped counts pinned at zero.
      // The truth universe carries the SAME deterministic sample gate as
      // the Spark side (identity below DocTruthCeiling)
      ("WITH norm AS (SELECT doc_id, " +
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks " +
        "FROM documents WHERE " +
        sampleGateSql("doc_id", "documents", DocTruthCeiling, 13) + "), " +
        "tok AS (SELECT doc_id, len(toks) AS nt, unnest(toks) AS tok, " +
        "generate_subscripts(toks, 1) AS pos FROM norm), " +
        "s0 AS (SELECT doc_id, nt, pos, tok " +
        "|| coalesce(' ' || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos), '') " +
        "|| coalesce(' ' || lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos), '') " +
        "|| coalesce(' ' || lead(tok, 3) OVER (PARTITION BY doc_id ORDER BY pos), '') " +
        "|| coalesce(' ' || lead(tok, 4) OVER (PARTITION BY doc_id ORDER BY pos), '') AS g " +
        "FROM tok), " +
        "sh AS (SELECT DISTINCT doc_id, g FROM s0 WHERE pos <= greatest(1, nt - 4)), " +
        "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
        "ix AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i " +
        "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id), " +
        "j AS (SELECT CAST(ix.i AS DOUBLE) / (sa.n + sb.n - ix.i) AS jac " +
        "FROM ix JOIN sz sa ON ix.da = sa.doc_id JOIN sz sb ON ix.db = sb.doc_id) " +
        "SELECT (SELECT count(*) FROM documents) AS n_docs, " +
        "count(*) AS true_pairs_09, CAST(0 AS BIGINT) AS lsh_missed_09, " +
        "CAST(0 AS BIGINT) AS false_pos, CAST(0 AS BIGINT) AS capped_buckets " +
        "FROM j WHERE jac >= 0.9"),
    "q_enc_ratio" ->
      // input bytes recomputed exactly by DuckDB; the compression-level
      // booleans are scale-robust invariants of these columns (the 0.75
      // threshold keeps >=0.28 margin for text's ~0.47 measured ratio —
      // the old 0.5 `halves` threshold had 0.03 and flipped at 10x);
      // exceeds_ceiling = 0 is the never-worse-than-reference invariant
      ("SELECT 'doc_id' AS col_name, CAST(8*count(*) AS BIGINT) AS input_bytes, 0 AS exceeds_ceiling, 1 AS compresses, 1 AS under_three_quarters FROM documents " +
        "UNION ALL SELECT 'lang', CAST(sum(4 + strlen(lang)) AS BIGINT), 0, 1, 1 FROM documents " +
        "UNION ALL SELECT 'n_chars', CAST(8*count(*) AS BIGINT), 0, 1, 1 FROM documents " +
        "UNION ALL SELECT 'source', CAST(sum(4 + strlen(source)) AS BIGINT), 0, 1, 1 FROM documents " +
        "UNION ALL SELECT 'text', CAST(sum(4 + strlen(text)) AS BIGINT), 0, 1, 1 FROM documents " +
        "ORDER BY col_name"),
    "q_ann_topk" ->
      ("WITH u AS (SELECT vec_id, embedding FROM embeddings WHERE " +
        sampleGateSql("vec_id", "embeddings", EmbTruthCeiling, 19) + "), " +
        "pairs AS (SELECT a.vec_id AS query, b.vec_id AS neighbor, " +
        "list_cosine_similarity(a.embedding, b.embedding) AS c " +
        "FROM u a, u b WHERE a.vec_id <> b.vec_id) " +
        "SELECT query, neighbor, CAST(r AS INT) AS rank FROM " +
        "(SELECT query, neighbor, row_number() OVER (PARTITION BY query ORDER BY c DESC, neighbor) AS r FROM pairs) " +
        "WHERE r <= 3 ORDER BY query, rank"),
    "q_ann_exact_probe" ->
      ("WITH pairs AS (SELECT a.vec_id AS query, b.vec_id AS neighbor, " +
        "list_cosine_similarity(a.embedding, b.embedding) AS c " +
        "FROM embeddings a, embeddings b " +
        "WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id) " +
        "SELECT query, neighbor, CAST(r AS INT) AS rank FROM " +
        "(SELECT query, neighbor, row_number() OVER (PARTITION BY query ORDER BY c DESC, neighbor) AS r FROM pairs) " +
        "WHERE r <= 3 ORDER BY query, rank"),
  )
}
