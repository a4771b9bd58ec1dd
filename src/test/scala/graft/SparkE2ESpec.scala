package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CodecId
import graft.functions.TextOps
import graft.operators._
import graft.sources.CodeTableGen

class SparkE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def code(n: Long, parts: Int) =
    CodeTableGen.generate(spark, n, parts).toDF()
      .withColumn("content_len", octet_length(col("content")))
      .withColumn("line_count", TextOps.lineCount(col("content")).cast("int"))

  test("code table generator is deterministic and partition-count independent") {
    val a = CodeTableGen.generate(spark, 500L, 2).collect().sortBy(_.commit)
    val b = CodeTableGen.generate(spark, 500L, 7).collect().sortBy(_.commit)
    assert(a.toSeq == b.toSeq)
    assert(a.map(r => (r.repo, r.path, r.commit)).distinct.length == 500)
    assert(a.map(_.lang).distinct.length > 5)
  }

  test("encode -> decode roundtrips the code table bit-identically (sha256 join)") {
    val df = code(1500L, 3)
    val chunks = EncodeJob.encode(df, numPartitions = 6,
      partitionKeys = Seq("repo", "lang"), sortKeys = Seq("repo", "path", "commit"))
    val decoded = DecodeJob.decode(chunks, df.schema)
    val (nSrc, nDec, bad) = Verifier.verify(df, decoded,
      keyCols = Seq("repo", "path", "commit"), contentCol = "content")
    assert(nSrc == 1500L && nDec == 1500L && bad == 0L)
    // the shuffle-free local path (chunks straight off encode are
    // co-partitioned) returns the same rows
    val local = DecodeJob.decodeLocal(chunks, df.schema)
    val (_, nL, badL) = Verifier.verify(df, local,
      keyCols = Seq("repo", "path", "commit"), contentCol = "content")
    assert(nL == 1500L && badL == 0L)
  }

  test("selector never exceeds the reference-policy ceiling and picks cheap codecs") {
    val df = code(2000L, 2)
    val chunks = EncodeJob.encode(df, 4, Seq("repo", "lang"),
      Seq("repo", "path", "commit")).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      assert(c.encodedBytes <= c.refPolicyBytes,
        s"${c.column}/${c.codec}: ${c.encodedBytes} > ${c.refPolicyBytes}")
    }
    val byCol = chunks.groupBy(_.column)
    // lang is ~25 values -> dictionary must win
    assert(byCol("lang").forall(_.codec == "DICT"))
    // overall compression must be real
    val raw = chunks.map(_.rawBytes).sum
    val enc = chunks.map(_.encodedBytes).sum
    assert(enc < raw / 2, s"poor overall ratio: $enc vs $raw")
  }

  test("lineage manifests are identical across parallelism levels (scaling determinism)") {
    val df8 = code(1200L, 2)
    val df32 = code(1200L, 9) // different input partitioning
    def manifests(df: org.apache.spark.sql.DataFrame) =
      EncodeJob.lineage(EncodeJob.encode(df, 6, Seq("repo", "lang"),
          Seq("repo", "path", "commit")))
        .collect().map(l => (l.partId, l.column, l.sha256Manifest)).sortBy(x => (x._1, x._2))
    assert(manifests(df8).toSeq == manifests(df32).toSeq)
  }

  test("pre-shuffle resume pruning preserves chunk identity per partition") {
    // encode() predicts each row's target partition with pmod(hash(keys :+
    // salt), n) — the same murmur3 chain repartition() routes by — and
    // filters skipped-partition rows BEFORE the exchange. If the prediction
    // ever diverged from the partitioner, rows would leak out of (or into)
    // surviving partitions and their chunk hashes would change; equality
    // against the unskipped run is therefore a per-row routing proof.
    val df = code(900L, 3)
    def key(c: graft.operators.ChunkRow) =
      (c.partId, c.chunkIdx, c.colIdx, c.sha256)
    val full = EncodeJob.encode(df, 6, Seq("repo", "lang"),
      Seq("repo", "path", "commit")).collect().map(key).sortBy(x => x)
    val skip = Set(0, 2, 5)
    assert(full.exists(c => skip.contains(c._1)), "skip set must be non-trivial")
    val pruned = EncodeJob.encode(df, 6, Seq("repo", "lang"),
      Seq("repo", "path", "commit"), skipPartitions = skip)
      .collect().map(key).sortBy(x => x)
    assert(pruned.toSeq == full.filterNot(c => skip.contains(c._1)).toSeq)
    // complement-literal branch: skip most partitions, keep a couple
    val skipMost = Set(0, 1, 2, 4)
    val prunedMost = EncodeJob.encode(df, 6, Seq("repo", "lang"),
      Seq("repo", "path", "commit"), skipPartitions = skipMost)
      .collect().map(key).sortBy(x => x)
    assert(prunedMost.toSeq == full.filterNot(c => skipMost.contains(c._1)).toSeq)
  }

  test("task-durable resume: sidecar lineage matches lineage(), crash loses only in-flight work") {
    val df = code(800L, 2)
    val out = java.nio.file.Files.createTempDirectory("graft-task1").toString
    EncodeJob.encodeResumable(df, out, 6, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    // numChunks = 0 rows are the driver's empty-partition markers (they
    // make hash-gap partitions resumable-done); compare only real rows
    def lin(dir: String) = spark.read.parquet(s"$dir/lineage")
      .where(col("numChunks") > 0)
      .select("partId", "column", "codecs", "numChunks", "numValues",
        "inputBytes", "outputBytes", "refPolicyBytes", "sha256Manifest")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // the in-task sidecar rows must be byte-equal to the distributed
    // lineage() aggregation over the same chunk table (incl. the sha256
    // manifest-of-manifests and the '+'-joined sorted codec set)
    val viaAgg = EncodeJob.lineage(
        spark.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow](
          org.apache.spark.sql.Encoders.product[graft.operators.ChunkRow]))
      .toDF().select("partId", "column", "codecs", "numChunks", "numValues",
        "inputBytes", "outputBytes", "refPolicyBytes", "sha256Manifest")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val sidecars = lin(out)
    assert(sidecars.nonEmpty && sidecars == viaAgg)
    // chunk files are task-committed with deterministic names: one file
    // per non-empty partition, no staging leftovers visible
    val files = new java.io.File(s"$out/chunks").listFiles().map(_.getName)
    assert(files.forall(f => f.matches("part-\\d{5}\\.parquet")))
    // EVERY partition has a sidecar (empty ones get driver markers), so a
    // no-op rerun's pre-shuffle filter collapses to lit(false)
    assert(new java.io.File(s"$out/lineage").listFiles()
      .count(_.getName.matches("part-\\d{5}\\.parquet")) == 6)
    // decoded rows roundtrip bit-identically through the task-written files
    val back = graft.operators.DecodeJob.decode(
      spark.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow](
        org.apache.spark.sql.Encoders.product[graft.operators.ChunkRow]),
      df.schema)
    assert(back.count() == df.count())
    // simulate a crash between the chunk-file rename and the sidecar
    // rename (the only non-atomic window): drop one partition's sidecar;
    // resume must re-encode exactly that partition in place and converge
    val victim = sidecars.head.head.asInstanceOf[Int]
    assert(new java.io.File(f"$out/lineage/part-$victim%05d.parquet").delete())
    EncodeJob.encodeResumable(df, out, 6, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    assert(lin(out) == viaAgg)
    val files2 = new java.io.File(s"$out/chunks").listFiles().map(_.getName)
    assert(files2.sorted.toSeq == files.sorted.toSeq, "no duplicate chunk files")
  }

  test("sparse keyspace: empty partitions are marked done, reruns are no-ops") {
    // 60 rows into 32 partitions with a single (repo, lang) key and 16
    // salt buckets -> at most 16 populated partitions; the rest must get
    // driver marker sidecars or they would stay pending forever
    val sp = spark
    import sp.implicits._
    val df = code(60L, 2)
      .withColumn("repo", lit("only/repo")).withColumn("lang", lit("scala"))
    val out = java.nio.file.Files.createTempDirectory("graft-sparse").toString
    EncodeJob.encodeResumable(df, out, 32, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    val lin = spark.read.parquet(s"$out/lineage")
    assert(lin.select("partId").distinct().count() == 32)
    val populated = lin.where(col("numChunks") > 0)
      .select("partId").distinct().count()
    assert(populated > 0 && populated <= 16, s"populated=$populated")
    val files1 = new java.io.File(s"$out/chunks").listFiles().map(_.getName).sorted.toSeq
    assert(files1.length == populated)
    // rerun: every partition done -> nothing re-encoded, files untouched
    val mtimes1 = new java.io.File(s"$out/chunks").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    EncodeJob.encodeResumable(df, out, 32, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    val mtimes2 = new java.io.File(s"$out/chunks").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(mtimes2 == mtimes1, "no-op rerun must not rewrite chunk files")
  }

  test("resumable encode skips completed partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val df = code(800L, 2)
    EncodeJob.encodeResumable(df, out, 4, Seq("repo", "lang"), Seq("repo", "path", "commit"))
    val lineage1 = spark.read.parquet(s"$out/lineage")
    val parts1 = lineage1.select("partId").distinct().collect().map(_.getInt(0)).toSet
    val chunks1 = spark.read.parquet(s"$out/chunks").count()
    // second run: everything complete -> nothing re-encoded, chunks unchanged
    EncodeJob.encodeResumable(df, out, 4, Seq("repo", "lang"), Seq("repo", "path", "commit"))
    val chunks2 = spark.read.parquet(s"$out/chunks").count()
    assert(chunks1 == chunks2, "completed partitions must be skipped on re-run")
    val parts2 = spark.read.parquet(s"$out/lineage")
      .select("partId").distinct().collect().map(_.getInt(0)).toSet
    assert(parts1 == parts2)
  }

  test("EncodeMain job driver: resumable encode + block codec + verify") {
    val in = java.nio.file.Files.createTempDirectory("graft-emain-in").toString
    code(600L, 3).write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft-emain-out").toString
    // defaults pick up (repo, lang) / (repo, path, commit) from the schema;
    // --verify decodes back and sha256-compares every non-key column (a
    // mismatch would sys.exit(1) and abort the suite)
    EncodeMain.main(Array(in, out, "--partitions", "4",
      "--block-codec", "zstd", "--verify", "repo,path,commit"))
    val lin1 = spark.read.parquet(s"$out/lineage")
    assert(lin1.select("partId").distinct().count() == 4)
    assert(lin1.agg(sum("inputBytes")).collect()(0).getLong(0) > 0)
    val chunkFiles1 = spark.read.parquet(s"$out/chunks").count()
    // rerun resumes from the lineage checkpoint: nothing re-encoded
    EncodeMain.main(Array(in, out, "--partitions", "4", "--block-codec", "zstd"))
    assert(spark.read.parquet(s"$out/chunks").count() == chunkFiles1)
    // a resume with different routing (partition count here) must refuse:
    // partIds completed under the old layout would silently mask the new
    // layout's partitions (the _encode_meta marker guard)
    val mism = intercept[IllegalArgumentException] {
      graft.operators.EncodeJob.encodeResumable(
        spark.read.parquet(in), out, 5,
        Seq("repo", "lang"), Seq("repo", "path", "commit"),
        blockCodec = graft.core.BlockCodec.Zstd)
    }
    assert(mism.getMessage.contains("resume config mismatch"), mism.getMessage)
    // --no-resume + projection writes a fresh two-column chunk table
    val out2 = java.nio.file.Files.createTempDirectory("graft-emain2").toString
    EncodeMain.main(Array(in, out2, "--partitions", "2", "--no-resume",
      "--columns", "lang,content", "--partition-keys", "lang",
      "--sort-keys", "content"))
    val cols2 = spark.read.parquet(s"$out2/lineage")
      .select("column").distinct().collect().map(_.getString(0)).toSet
    assert(cols2 == Set("lang", "content"))
    // --no-resume rewrote the routing marker to ITS config, so a resume
    // with the same (projected) settings no-ops cleanly...
    EncodeMain.main(Array(in, out2, "--partitions", "2",
      "--columns", "lang,content", "--partition-keys", "lang",
      "--sort-keys", "content"))
    // ...while a resume with different routing against the overwritten
    // layout refuses instead of matching a stale marker
    val stale = intercept[IllegalArgumentException] {
      graft.operators.EncodeJob.encodeResumable(
        spark.read.parquet(in), out2, 4,
        Seq("repo", "lang"), Seq("repo", "path", "commit"))
    }
    assert(stale.getMessage.contains("resume config mismatch"), stale.getMessage)
  }

  test("resume refusal semantics: projection, schema evolution, missing marker") {
    val in = java.nio.file.Files.createTempDirectory("graft-rref-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-rref-out").toString
    val df = code(400L, 2)
    df.write.mode("overwrite").parquet(in)
    EncodeMain.main(Array(in, out, "--partitions", "3"))
    val chunks1 = spark.read.parquet(s"$out/chunks").count()
    // resume under a PROJECTION re-routes rows (the salt hashes every
    // column), so the marker must refuse it
    val proj = intercept[IllegalArgumentException] {
      EncodeMain.main(Array(in, out, "--partitions", "3",
        "--columns", "repo,lang,content", "--partition-keys", "repo,lang",
        "--sort-keys", "repo"))
    }
    assert(proj.getMessage.contains("resume config mismatch"), proj.getMessage)
    // schema EVOLUTION (a new column in the input) changes the routed
    // column set the same way -> refused, documented: encode into a fresh
    // outDir after evolution
    df.withColumn("stars", lit(5)).write.mode("overwrite").parquet(in)
    val evo = intercept[IllegalArgumentException] {
      EncodeMain.main(Array(in, out, "--partitions", "3"))
    }
    assert(evo.getMessage.contains("resume config mismatch"), evo.getMessage)
    // marker deleted (hand-pruned checkpoint) -> the no-marker guard
    // refuses rather than pinning this run's config as the truth
    df.write.mode("overwrite").parquet(in)
    graft.sources.GraftIO.forPath(out).delete(s"$out/_encode_meta")
    val noMark = intercept[IllegalArgumentException] {
      EncodeMain.main(Array(in, out, "--partitions", "3"))
    }
    assert(noMark.getMessage.contains("routing marker"), noMark.getMessage)
    // the error message tells the user how to re-assert the original
    // config; doing so makes the next resume a clean no-op
    graft.operators.EncodeJob.writeRoutingMarker(out,
      graft.operators.EncodeJob.routingMeta(3, Seq("repo", "lang"),
        Seq("repo", "path", "commit"), graft.core.BlockCodec.None,
        df.schema.fieldNames.toSeq))
    EncodeMain.main(Array(in, out, "--partitions", "3"))
    assert(spark.read.parquet(s"$out/chunks").count() == chunks1)
  }

  test("unreadable lineage refuses the resume instead of erasing the checkpoint") {
    // the round-4 failure mode: a lineage read failure with real sidecars
    // on disk was treated as 'no coverage', and the gap-marker pass then
    // REPLACE_EXISTING-renamed zero-row sidecars over every real manifest.
    // The round-5 contract: a failed read only reads as empty when a
    // directory listing confirms no sidecar exists; otherwise it rethrows
    // and the checkpoint bytes stay untouched.
    val in = java.nio.file.Files.createTempDirectory("graft-clin-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-clin-out").toString
    val df = code(300L, 2)
    df.write.mode("overwrite").parquet(in)
    EncodeMain.main(Array(in, out, "--partitions", "3"))
    val dir = new java.io.File(s"$out/lineage")
    val files = dir.listFiles((_, n) => n.startsWith("part-")).sortBy(_.getName)
    assert(files.nonEmpty)
    def sha(f: java.io.File): String = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(java.nio.file.Files.readAllBytes(f.toPath)))
    // corrupt ONE sidecar in place (truncated garbage = unreadable parquet)
    java.nio.file.Files.write(files.head.toPath, "not a parquet file".getBytes)
    val shas = files.map(f => f.getName -> sha(f)).toMap
    intercept[Exception] {
      EncodeMain.main(Array(in, out, "--partitions", "3"))
    }
    // every sidecar byte-identical to its pre-attempt state: the refusal
    // must not have written gap markers or re-encoded over the checkpoint
    val after = dir.listFiles((_, n) => n.startsWith("part-")).sortBy(_.getName)
    assert(after.map(_.getName).toSeq == files.map(_.getName).toSeq)
    after.foreach(f => assert(sha(f) == shas(f.getName), s"${f.getName} changed"))
  }

  test("--partitions is last-wins when auto and a number both appear") {
    val in = java.nio.file.Files.createTempDirectory("graft-lw-in").toString
    code(300L, 2).write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft-lw-out").toString
    // auto would compute some footer-derived count (>= 32); the later
    // explicit 3 must win
    EncodeMain.main(Array(in, out, "--partitions", "auto", "--partitions", "3"))
    assert(spark.read.parquet(s"$out/lineage")
      .select("partId").distinct().count() == 3)
    // and the reverse keeps auto (>= 32 floor)
    val out2 = java.nio.file.Files.createTempDirectory("graft-lw2-out").toString
    EncodeMain.main(Array(in, out2, "--partitions", "3", "--partitions", "auto"))
    assert(spark.read.parquet(s"$out2/lineage")
      .select("partId").distinct().count() >= 32)
  }

  test("timestamp and numeric columns roundtrip through the chunk pipeline") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts", "event_type", "user_id", "value")
    val back = Roundtrip.through(ev, sortKeys = Seq("event_id"))
    // decimal sum is order-insensitive (double sums vary with partitioning)
    val src = ev.agg(count(lit(1)), min(col("ts")), max(col("ts")),
      sum(col("user_id")), sum(col("value").cast("decimal(28,10)"))).collect()(0)
    val dec = back.agg(count(lit(1)), min(col("ts")), max(col("ts")),
      sum(col("user_id")), sum(col("value").cast("decimal(28,10)"))).collect()(0)
    assert(src == dec)
  }

  test("nullable columns roundtrip via def-level streams (all types)") {
    val df = code(900L, 3)
      .withColumn("s_n", when(col("content_len") % 3 === 0, lit(null))
        .otherwise(col("lang")))
      .withColumn("i_n", when(col("content_len") % 5 === 0, lit(null))
        .otherwise(col("content_len")))
      .withColumn("l_n", when(col("content_len") % 7 === 0, lit(null))
        .otherwise(col("content_len").cast("long") * 3))
      .withColumn("d_n", when(col("content_len") % 2 === 0, lit(null))
        .otherwise(col("content_len").cast("double") / 7.0))
      .withColumn("b_n", when(col("content_len") % 11 === 0, lit(null))
        .otherwise(col("content_len") % 2 === 0))
      .select("repo", "path", "commit", "s_n", "i_n", "l_n", "d_n", "b_n")
    val back = Roundtrip.through(df, sortKeys = Seq("repo", "path", "commit"))
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.orderBy("repo", "path", "commit").collect().toSeq
    assert(canon(back) == canon(df))
    // an all-null chunk column also survives
    val allNull = code(200L, 1).select(col("repo"), col("path"), col("commit"),
      lit(null).cast("string").as("gone"))
    assert(Roundtrip.through(allNull, sortKeys = Seq("repo", "path", "commit"))
      .where(col("gone").isNull).count() == 200L)
    // chunks with nulls report them and keep the ceiling invariant
    val chunks = EncodeJob.encode(df, 4, Seq.empty,
      Seq("repo", "path", "commit")).collect()
    assert(chunks.filter(_.column == "s_n").map(_.numNulls).sum > 0)
    chunks.foreach(c => assert(c.encodedBytes <= c.refPolicyBytes))
  }

  test("chunk min/max stats prune decode work without changing results") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
      .repartitionByRange(8, col("l_orderkey"))
    val chunks = EncodeJob.encode(li, numPartitions = 0,
      partitionKeys = Seq.empty, sortKeys = Seq("l_orderkey", "l_linenumber"),
      chunkRows = 512).cache()
    val (lo, hi) = (50L, 300L)
    // pruning keeps strictly fewer chunk groups than exist
    val total = chunks.toDF().select("partId", "chunkIdx").distinct().count()
    val kept = chunks.filter(c => c.column == "l_orderkey" &&
      DecodeJob.statsOverlap(c, lo, hi)).count()
    assert(kept < total, s"pruning kept $kept of $total groups")
    assert(kept > 0)
    // and results are identical to the unpruned path
    val pruned = DecodeJob.decodeWhere(chunks, li.schema, "l_orderkey", lo, hi)
      .where(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
    val full = li.where(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
    assert(pruned == full)
    // string stats: range on a byte column also prunes safely
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").repartitionByRange(4, col("source"))
    val dc = EncodeJob.encode(d, 0, Seq.empty, Seq("source", "doc_id"),
      chunkRows = 64)
    val prunedS = DecodeJob.decodeWhere(dc, d.schema, "source", "a", "m")
      .where(col("source").between("a", "m")).count()
    val fullS = d.where(col("source").between("a", "m")).count()
    assert(prunedS == fullS)
    chunks.unpersist()
  }

  test("streaming encode: micro-batches land as decodable chunks with lineage") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.sources.CodeRow]
    val rows1 = (0 until 300).map(i => graft.sources.CodeTableGen.genRow(7L, i.toLong, 64, 400))
    val rows2 = (300 until 500).map(i => graft.sources.CodeTableGen.genRow(7L, i.toLong, 64, 400))
    mem.addData(rows1)
    val q = graft.streaming.StreamingEncode.start(mem.toDF(), out,
      numPartitions = 4, partitionKeys = Seq("repo", "lang"),
      sortKeys = Seq("repo", "path", "commit"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      mem.addData(rows2)
      q.processAllAvailable()
    } finally q.stop()
    val chunks = s.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow]
    val decoded = DecodeJob.decode(chunks,
      org.apache.spark.sql.Encoders.product[graft.sources.CodeRow].schema)
    assert(decoded.count() == 500L)
    // bit-identity across the streaming path too
    val src = s.createDataFrame(rows1 ++ rows2)
    val (nS, nD, bad) = Verifier.verify(src, decoded,
      keyCols = Seq("repo", "path", "commit"), contentCol = "content")
    assert(nS == 500L && nD == 500L && bad == 0L)
    // lineage written per batch, partIds globally unique
    val lineage = s.read.parquet(s"$out/lineage")
    assert(lineage.select("partId").distinct().count() ==
      chunks.map(_.partId).distinct().count())
  }

  test("streaming parquet sink: micro-batches land as readable parquet files") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-streampq").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.sources.CodeRow]
    val rows1 = (0 until 300).map(i => graft.sources.CodeTableGen.genRow(9L, i.toLong, 64, 400))
    val rows2 = (300 until 500).map(i => graft.sources.CodeTableGen.genRow(9L, i.toLong, 64, 400))
    mem.addData(rows1)
    val q = graft.streaming.StreamingEncode.startParquetSink(mem.toDF(), out,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      mem.addData(rows2)
      q.processAllAvailable()
    } finally q.stop()
    val batches = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getPath).sorted
    assert(batches.length >= 2)
    // every batch directory reads back through our own DSv2 source AND
    // Spark's reader, value-identically
    val all = batches.map { b =>
      val ours = s.read.format(graft.sources.GraftParquetFormat.Name).load(b)
      val spk = s.read.parquet(b)
      assert(ours.orderBy("repo", "path", "commit").collect().toSeq ==
        spk.orderBy("repo", "path", "commit").collect().toSeq)
      spk.count()
    }.sum
    assert(all == 500L)
    // replaying a batch is idempotent: same directory, same content
    val b0 = s.read.parquet(batches.head)
      .orderBy("repo", "path", "commit").collect().toSeq
    graft.streaming.StreamingEncode.parquetBatch(
      s.createDataFrame(rows1), 0L, out)
    val b0again = s.read.parquet(batches.head)
      .orderBy("repo", "path", "commit").collect().toSeq
    assert(b0again == b0)
  }

  test("salted repartition defuses mega-repo skew; typed decode round-trips") {
    val s = spark
    import s.implicits._
    val df = code(4000L, 4) // Zipf repos: top repo holds a few % of all rows
    val topRepo = df.groupBy("repo").count().orderBy(col("count").desc)
      .select("repo").as[String].first()
    val chunks = EncodeJob.encode(df.select("repo", "path", "commit", "lang", "content"),
      numPartitions = 16, partitionKeys = Seq("repo", "lang"),
      sortKeys = Seq("repo", "path", "commit"), saltBuckets = 16).cache()
    // the hottest repo's rows must land on several partitions, not one
    val decoded = DecodeJob.decodeAs[graft.sources.CodeRow](chunks)
    assert(decoded.count() == 4000L)
    val typedBack = decoded.filter(_.repo == topRepo).count()
    assert(typedBack == df.where(col("repo") === topRepo).count())
    val partsOfTop = chunks.toDF().where(col("column") === "repo")
      .select("partId").distinct().count()
    // repo is a partition KEY, so every partition holds some repos; the
    // skew claim is about the salt: verify by re-encoding WITHOUT salt info
    // is impossible post-hoc, so assert the positive property instead —
    // with 16 salt buckets the top repo's chunk groups span > 1 partition
    val li = df.where(col("repo") === topRepo)
      .select("repo", "path", "commit", "lang", "content")
    val topChunks = EncodeJob.encode(li, 8, Seq("repo", "lang"),
      Seq("repo", "path", "commit"), saltBuckets = 16)
    val topParts = topChunks.toDF().select("partId").distinct().count()
    assert(topParts > 1, s"one hot repo stayed on $topParts partition(s)")
    assert(partsOfTop > 1)
    chunks.unpersist()
  }

  test("flagship entry returns lineage rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("dedup operators find planted duplicates") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val dup = base.limit(5).withColumn("doc_id", col("doc_id") + 100000L)
    val withDups = base.unionByName(dup)
    // exact dedup removes exactly the 5 planted copies
    val deduped = Dedup.exact(withDups, "text", "doc_id").count()
    assert(deduped == base.count())
    // minhash-lsh finds the planted identical pairs at threshold ~1.0
    val pairs = Dedup.minhashLsh(withDups, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.99)
    val found = pairs.select("keyA", "keyB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 5).forall(i => found.exists { case (a, b) =>
      b - a == 100000L }), s"planted dups not found: $found")
    // simhash near-dups find them too (distance 0)
    val sPairs = Dedup.simhashNearDups(withDups, "doc_id", "text", maxDist = 0)
    assert(sPairs.count() >= 5)
  }

  test("MinHashSig expression is bit-identical to the composed built-in form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val base = transform(TextOps.wordShingles(col("text"), 5), s => xxhash64(s))
    val n = 32
    // the exact composed plan minhashSignature used before the one-pass
    // Expression replaced it — the signatures (and so every LSH bucket and
    // estimate downstream) must not move by a single bit
    val composed = array((0 until n).map { i =>
      array_min(transform(col("__b"), x => xxhash64(x, lit(i))))
    }: _*)
    val both = docs.withColumn("__b", base)
      .select(col("doc_id"), composed.as("old"),
        graft.functions.MinHashSig(col("__b"), n).as("new"))
      .withColumn("eq", col("old") === col("new"))
    assert(both.where(!col("eq")).count() == 0)
    // and through the public operator: signatures survive the full path
    val viaOp = Dedup.minhashSignature(docs, "text", n)
      .select(col("doc_id"), col("minhash"))
    val joined = both.select(col("doc_id"), col("old"))
      .join(viaOp, "doc_id")
      .where(col("old") =!= col("minhash"))
    assert(joined.count() == 0)

    // null elements: the composed form's chained xxhash64 skips a null
    // child, contributing hashInt(i, seed=42) — the expression must match
    val sp = spark
    import sp.implicits._
    val withNulls = Seq(Seq[java.lang.Long](3L, null, 9L),
      Seq[java.lang.Long](null), Seq[java.lang.Long](7L))
      .toDF("b")
    val composedN = array((0 until 8).map { i =>
      array_min(transform(col("b"), x => xxhash64(x, lit(i))))
    }: _*)
    val nBoth = withNulls.select(composedN.as("old"),
      graft.functions.MinHashSig(col("b"), 8).as("new"))
    assert(nBoth.where(col("old") =!= col("new")).count() == 0)
  }

  test("SimHashSig expression is bit-identical to the composed 64-vote form") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(300)
    val tokens = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    // the exact composed plan Dedup.simhash used before the one-pass
    // Expression replaced it: 64 per-bit aggregate votes OR-ed together —
    // every blocked pair and hamming distance downstream must not move
    val bitCols = (0 until 64).map { bit =>
      val votes = aggregate(col("__h"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    val both = docs.withColumn("__h", transform(tokens, t => xxhash64(t)))
      .select(col("doc_id"), bitCols.reduce(_.bitwiseOR(_)).as("old"),
        coalesce(graft.functions.SimHashSig(col("__h")), lit(0L)).as("new"))
    assert(both.where(col("old") =!= col("new")).count() == 0)
    // through the public operator too
    val viaOp = Dedup.simhash(docs, "text").select(col("doc_id"), col("simhash"))
    assert(both.select(col("doc_id"), col("old")).join(viaOp, "doc_id")
      .where(col("old") =!= col("simhash")).count() == 0)
    // null elements vote like 0L (the composed form's when(null) takes the
    // -1 branch on every bit); a null ARRAY collapses to 0 via coalesce
    val sp = spark
    import sp.implicits._
    val withNulls = Seq(Seq[java.lang.Long](-1L, null, -1L),
      Seq[java.lang.Long](null), Seq[java.lang.Long](5L))
      .toDF("__h")
    val bitColsN = (0 until 64).map { bit =>
      val votes = aggregate(col("__h"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    val nBoth = withNulls.select(bitColsN.reduce(_.bitwiseOR(_)).as("old"),
      coalesce(graft.functions.SimHashSig(col("__h")), lit(0L)).as("new"))
    assert(nBoth.where(col("old") =!= col("new")).count() == 0)
  }

  test("simhash blocking has full recall at dist <= 3, incl. top-bit flips") {
    val sp = spark
    import sp.implicits._
    // planted hashes whose differing bits live ONLY in bits 48-63 — the
    // round-1 top-16-bit blocking missed every such pair
    val base = 0x123456789ABCDEFL
    val planted = Seq(
      (1L, base),
      (2L, base ^ (1L << 63)),                      // dist 1, top bit
      (3L, base ^ (1L << 62) ^ (1L << 49)),         // dist 2, both in top 16
      (4L, base ^ (1L << 63) ^ (1L << 55) ^ (1L << 48)), // dist 3, top 16
      (5L, base ^ 1L),                              // dist 1, bottom bit
      (6L, 0x7777777777777777L))                    // far away
    // plus deterministic pseudo-random hashes for bulk coverage
    val rng = new scala.util.Random(42)
    val bulk = (100L until 300L).map(k => (k, rng.nextLong()))
    val withSim = (planted ++ bulk).toDF("__key", "simhash")
    val blocked = Dedup.simhashPairs(withSim, maxDist = 3)
      .select("keyA", "keyB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all pairs, no blocking
    val a = withSim.select(col("__key").as("ka"), col("simhash").as("sa"))
    val b = withSim.select(col("__key").as("kb"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).where(col("ka") < col("kb"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 3L)) && brute.contains((1L, 4L)))
    assert(blocked == brute, s"blocked=${blocked.size} brute=${brute.size}")
  }

  test("simhash variant blocking has full recall at dist 8 (adversarial spreads)") {
    val sp = spark
    import sp.implicits._
    // maxDist = 8 -> five ~13-bit segments (0-12, 12-25, 25-38, 38-51,
    // 51-63) with 1-bit variants. Adversarial placements:
    //  - key 2: 8 errors spread 2+2+2+1+1 — NO segment matches exactly, the
    //    pair is reachable ONLY through a 1-bit-variant witness
    //  - key 3: 2+2+2+2+0 — exact witness is the single error-free segment
    //  - key 4: all 8 errors in one segment — four exact witnesses
    //  - key 5: dist 9 — must NOT be reported even if candidates arise
    val base = 0x5A5A5A5A5A5A5A5AL
    def bits(bs: Int*): Long = bs.map(1L << _).reduce(_ | _)
    val planted = Seq(
      (1L, base),
      (2L, base ^ bits(0, 11, 13, 24, 26, 37, 40, 52)),  // 2,2,2,1,1
      (3L, base ^ bits(1, 2, 14, 15, 27, 28, 39, 41)),   // 2,2,2,2,0
      (4L, base ^ bits(25, 26, 27, 28, 29, 30, 31, 32)), // 0,0,8,0,0
      (5L, base ^ bits(0, 1, 12, 13, 25, 26, 38, 39, 51))) // dist 9
    val rng = new scala.util.Random(7)
    val bulk = (100L until 300L).map(k => (k, rng.nextLong()))
    val withSim = (planted ++ bulk).toDF("__key", "simhash")
    val blocked = Dedup.simhashPairs(withSim, maxDist = 8)
      .select("keyA", "keyB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = withSim.select(col("__key").as("ka"), col("simhash").as("sa"))
    val b = withSim.select(col("__key").as("kb"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).where(col("ka") < col("kb"))
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 8)
      .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 3L)) &&
      brute.contains((1L, 4L)) && !brute.contains((1L, 5L)))
    assert(blocked == brute, s"blocked=${blocked.size} brute=${brute.size}")
  }

  test("ANN: lsh buckets agree with brute force on self-match neighborhoods") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 1)
    assert(bf.count() > 0)
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", k = 1, planes = 4)
    assert(lsh.count() > 0)
  }

  test("prefix-filtered jaccard join is EXACT vs brute-force all-pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = 0.3
    val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), n = 2, threshold = t)
      .select("keyA", "keyB", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      .toSet
    // brute force: quadratic all-pairs on the same hashed shingle sets
    val withSh = docs.select(col("lang"), col("doc_id").as("__key"),
      array_sort(transform(TextOps.wordShingles(col("text"), 2),
        s => xxhash64(s))).as("__sh"))
    val a = withSh.select(col("lang"), col("__key").as("keyA"), col("__sh").as("shA"))
    val b = withSh.select(col("lang"), col("__key").as("keyB"), col("__sh").as("shB"))
    val brute = a.join(b, Seq("lang")).where(col("keyA") < col("keyB"))
      .withColumn("__i", size(array_intersect(col("shA"), col("shB"))))
      .withColumn("j", col("__i").cast("double") /
        (size(col("shA")) + size(col("shB")) - col("__i")).cast("double"))
      .where(col("j") >= t)
      .select("keyA", "keyB", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
      .toSet
    assert(brute.nonEmpty, "test needs at least one qualifying pair")
    assert(fast == brute,
      s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
  }

  test("ANN: IVF covers every query and recalls a sane share of exact top-1") {
    val s = spark
    import s.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      k = 1, nLists = 6, nProbe = 3).cache()
    assert(ivf.select("query").distinct().count() == n)
    // recall vs brute force: with 3 of 6 cells probed, expect a solid share
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 1)
      .select($"query", $"neighbor".as("exact"))
    val matched = ivf.where($"rank" === 1).join(bf, "query")
      .where($"neighbor" === $"exact").count()
    assert(matched.toDouble / n > 0.4, s"IVF recall@1 = ${matched.toDouble / n}")
    // determinism
    val again = Similarity.ivfTopK(emb, "vec_id", "embedding",
      k = 1, nLists = 6, nProbe = 3)
    assert(again.orderBy("query").collect().toSeq ==
      ivf.orderBy("query").collect().toSeq)
    ivf.unpersist()
  }

  test("LIST columns roundtrip bit-exactly (nulls, empties, null elements)") {
    val sp = spark
    import sp.implicits._
    // embeddings: array<float> straight from the testdata table
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embBack = Roundtrip.through(emb, sortKeys = Seq("vec_id"))
    val src = emb.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val dec = embBack.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(src == dec)
    // synthetic torture: null arrays, empty arrays, null elements, strings
    val torture = Seq(
      (1L, Seq(1, 2, 3), Seq("a", "bb", "ccc")),
      (2L, null, Seq.empty[String]),
      (3L, Seq.empty[Int], null),
      (4L, Seq(7), Seq("x", null, "z")),
      (5L, Seq(0, -5, Int.MaxValue), Seq("", "q")),
    ).toDF("k", "ints", "strs")
    val back = Roundtrip.through(torture, sortKeys = Seq("k"), parts = 2)
    val t0 = torture.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1), r.getSeq[String](2))).toSeq
    val t1 = back.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getSeq[Int](1), r.getSeq[String](2))).toSeq
    assert(t0 == t1)
  }

  test("MAP columns roundtrip (nulls, empties, null values, key-order-free)") {
    val sp = spark
    import sp.implicits._
    // map<string,string> built from the documents table
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
    val back = Roundtrip.through(docs, sortKeys = Seq("doc_id"))
    def canonDocs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1).toSeq.sorted))
      .toSeq.sortBy(_._1)
    assert(canonDocs(docs) == canonDocs(back))
    // synthetic torture: null maps, empty maps, null values, int values
    val torture = Seq(
      (1L, Map("a" -> java.lang.Integer.valueOf(1), "b" -> java.lang.Integer.valueOf(2))),
      (2L, null),
      (3L, Map.empty[String, java.lang.Integer]),
      (4L, Map("x" -> null.asInstanceOf[java.lang.Integer], "y" -> java.lang.Integer.valueOf(-7))),
      (5L, Map("only" -> java.lang.Integer.valueOf(Int.MaxValue))),
    ).toDF("k", "m")
    val tBack = Roundtrip.through(torture, sortKeys = Seq("k"), parts = 2)
    def canonT(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map { r =>
        val m = if (r.isNullAt(1)) null
          else r.getMap[String, Any](1).toSeq.sortBy(_._1).map {
            case (k, v) => (k, String.valueOf(v))
          }
        (r.getLong(0), m)
      }.toSeq.sortBy(_._1)
    assert(canonT(torture) == canonT(tBack))
  }

  test("parquet writer: LIST and MAP columns read back via Spark's native reader") {
    import graft.sources.{ParquetSink, PqCodec}
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Seq(1, 2, 3), Seq("a", "bb"), Map("x" -> 1L, "y" -> 2L)),
      (2L, null, Seq.empty[String], null),
      (3L, Seq.empty[Int], null, Map.empty[String, Long]),
      (4L, Seq(7, -1), Seq("z", null), Map("k" -> 9L)),
    ).toDF("id", "ints", "strs", "m")
      .repartition(1) // single file keeps the compare one-pass
    val dir = java.nio.file.Files.createTempDirectory("graft-nested").toString
    ParquetSink.write(df, dir, codec = PqCodec.Snappy).count()
    val rd = spark.read.parquet(dir)
    assert(rd.schema("ints").dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    assert(rd.schema("m").dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Int](1),
        if (r.isNullAt(2)) null else r.getSeq[String](2),
        if (r.isNullAt(3)) null else r.getMap[String, Long](3).toSeq.sortBy(_._1))
    }.toSeq.sortBy(_._1)
    assert(canon(df) == canon(rd))
    // dictionary-eligible repeated strings also survive (dict id page +
    // rep/def streams in one compressed page body)
    val big = (0 until 2000).map(i =>
      (i.toLong, Seq.tabulate(i % 5)(j => s"tok-${(i + j) % 13}"))).toDF("id", "toks")
      .repartition(1)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-nested2").toString
    ParquetSink.write(big, dir2, codec = PqCodec.Zstd).count()
    val rd2 = spark.read.parquet(dir2)
    assert(rd2.agg(sum(size(col("toks")))).collect()(0).getLong(0) ==
      big.agg(sum(size(col("toks")))).collect()(0).getLong(0))
    val a = big.selectExpr("explode(toks) t").groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = rd2.selectExpr("explode(toks) t").groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("parquet writer: STRUCT columns read back via Spark's native reader") {
    import graft.sources.{ParquetSink, PqCodec}
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, ("x", 10, 1.5)),
      (2L, (null: String, 20, -0.5)),
      (3L, ("z", 30, 0.0)),
    ).toDF("id", "s")
      .union(spark.sql(
        "SELECT 4L AS id, CAST(NULL AS STRUCT<_1:STRING,_2:INT,_3:DOUBLE>) AS s"))
      .repartition(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-struct").toString
    ParquetSink.write(df, dir, codec = PqCodec.Snappy).count()
    val rd = spark.read.parquet(dir)
    assert(rd.schema("s").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .selectExpr("id", "s._1 AS a", "s._2 AS b", "s._3 AS c")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else Int.box(r.getInt(2)),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3))))
      .toSeq.sortBy(_._1)
    assert(canon(df) == canon(rd))
    // and back through OUR readers: distributed source + DSv2 format()
    val rd2 = graft.sources.ParquetSource.read(spark, dir)
    assert(canon(rd2) == canon(df))
    val rd3 = spark.read.format("graft.sources.GraftParquetFormat").load(dir)
    assert(canon(rd3) == canon(df))
  }

  test("decimal columns roundtrip exactly (chunk engine + parquet file)") {
    import graft.sources.{ParquetSink, PqCodec}
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"))
    // chunk engine
    val back = Roundtrip.through(li, sortKeys = Seq("l_orderkey", "l_linenumber"))
    // (l_orderkey, l_linenumber) is not unique in the synthetic table, so
    // sort fully (incl. value) on the collected side
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2).toPlainString))
      .toSeq.sorted
    assert(canon(li) == canon(back))
    // real parquet file -> Spark's native reader preserves DecimalType
    val dir = java.nio.file.Files.createTempDirectory("graft-dec").toString
    ParquetSink.write(li.limit(200), dir, codec = PqCodec.Uncompressed).count()
    val rd = spark.read.parquet(dir)
    assert(rd.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(rd.agg(sum(col("price"))).collect()(0).getDecimal(0) ==
      li.limit(200).agg(sum(col("price"))).collect()(0).getDecimal(0))
  }

  test("parquet writer: files read back by SPARK'S OWN built-in reader") {
    import graft.sources.{ParquetSink, PqCodec}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val written = ParquetSink.write(docs.repartition(3), dir,
      codec = PqCodec.Snappy, rowGroupRows = 256)
    assert(written.agg(org.apache.spark.sql.functions.sum("rows"))
      .collect()(0).getLong(0) == docs.count())
    // the external anchor: Spark's native reader consumes OUR container
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = back.orderBy("doc_id").collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toSeq
    assert(a == b)
    // uncompressed + gzip files read back too
    val dir2 = java.nio.file.Files.createTempDirectory("graft-pq2").toString
    ParquetSink.write(docs.limit(50), dir2, codec = PqCodec.Uncompressed).count()
    assert(spark.read.parquet(dir2).count() == 50)
    val dir3 = java.nio.file.Files.createTempDirectory("graft-pq3").toString
    ParquetSink.write(docs.limit(50), dir3, codec = PqCodec.Gzip).count()
    assert(spark.read.parquet(dir3).count() == 50)
    // LZ4_RAW pages: consumed by Spark's reader and our own
    val dir4 = java.nio.file.Files.createTempDirectory("graft-pq4").toString
    ParquetSink.write(docs.limit(80), dir4, codec = PqCodec.Lz4Raw).count()
    assert(spark.read.parquet(dir4).count() == 80)
    assert(graft.sources.ParquetSource.read(spark, dir4).count() == 80)
  }

  test("page index interop: parquet-mr filters rows through our ColumnIndex") {
    import graft.sources.ParquetSink
    // one file, one row group, multi-page chunks, sorted ids: Spark's
    // vectorized reader applies column-index filtering by DEFAULT
    // (parquet.filter.columnindex.enabled) when a predicate is pushed —
    // a malformed or lying ColumnIndex/OffsetIndex drops or breaks rows,
    // so exact equality on a filtered aggregate is a real external anchor
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pgidx").toString
    ParquetSink.write(docs.coalesce(1).sortWithinPartitions("doc_id"), dir,
      rowGroupRows = 1 << 20).count()
    val exp = docs.filter(col("doc_id").between(200L, 900L))
      .agg(count(lit(1)), sum(length(col("text"))), sum(col("doc_id")))
      .collect()(0)
    val got = spark.read.parquet(dir)
      .filter(col("doc_id").between(200L, 900L))
      .agg(count(lit(1)), sum(length(col("text"))), sum(col("doc_id")))
      .collect()(0)
    assert(got == exp)
    // and through our own DSv2 (index-driven page pruning inside the scan)
    val ours = spark.read.format(graft.sources.GraftParquetFormat.Name)
      .load(dir).filter(col("doc_id").between(200L, 900L))
      .agg(count(lit(1)), sum(length(col("text"))), sum(col("doc_id")))
      .collect()(0)
    assert(ours == exp)
  }

  test("page CRC32 interop: parquet-mr verifies ours, we verify parquet-mr's") {
    import graft.sources.{ParquetFileReader, ParquetMeta, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").limit(400)
    // ours -> parquet-mr: Spark reads our file with checksum VERIFICATION on
    // (default off), so a CRC that didn't match parquet-mr's definition
    // would abort the scan instead of returning rows
    val dir = java.nio.file.Files.createTempDirectory("graft-crc1").toString
    ParquetSink.write(docs.coalesce(1), dir).count()
    spark.sparkContext.hadoopConfiguration
      .setBoolean("parquet.page.verify-checksum.enabled", true)
    try {
      assert(spark.read.parquet(dir).count() == 400)
    } finally spark.sparkContext.hadoopConfiguration
      .setBoolean("parquet.page.verify-checksum.enabled", false)
    // parquet-mr -> ours: Spark writes with page checksums (its default),
    // our reader parses field 4 and verifies every decoded page
    val dir2 = java.nio.file.Files.createTempDirectory("graft-crc2")
      .toString + "/out"
    docs.coalesce(1).write.parquet(dir2)
    val f = new java.io.File(dir2).listFiles(
      (_, n) => n.endsWith(".parquet")).head.getPath
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val meta = ParquetFileReader.readFooter(bytes)
    val cm = meta.rowGroups.head.columns.head
    val firstOff =
      if (cm.dictionaryPageOffset >= 0)
        math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
      else cm.dataPageOffset
    val ph = ParquetMeta.parsePageHeader(bytes, firstOff.toInt)
    assert(ph.crcDefined, "Spark-written page carries no CRC?")
    val (_, got) = ParquetFileReader.readFileRows(f)
    assert(got.size == 400)
  }

  test("parquet writer: delta/RLE fallback encodings (v2-default + auto policies)") {
    import graft.sources.{EncPolicy, ParquetFileReader, ParquetSink, PqCodec, PqEncoding}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // shaped to dodge the dictionary path so the FALLBACK encoding shows:
    //  sorted_id   unique sorted longs    -> auto: DELTA_BINARY_PACKED
    //  rnd_id      splitmix-style longs   -> auto: PLAIN (delta can't win)
    //  path        long shared prefixes,  -> auto: DELTA_BYTE_ARRAY
    //              >1MiB uniques (busts dict)
    //  blob        no shared prefixes,    -> auto: DELTA_LENGTH_BYTE_ARRAY
    //              >1MiB uniques
    //  flag        99% true               -> auto: RLE
    //  temp        floats, one exponent    -> auto: BYTE_STREAM_SPLIT
    //              band (compresses split)
    val n = 3000
    val pad = "x" * 380
    val rows = (0 until n).map { i =>
      var z = i.toLong * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^= z >>> 27
      Row(i.toLong, z, f"repo/org/project/src/main/scala/$pad/file_$i%06d.scala",
        f"$z%016x$pad$i", i % 100 != 0, 1.0f + i / 8191.0f)
    }
    val schema = StructType(Seq(
      StructField("sorted_id", LongType), StructField("rnd_id", LongType),
      StructField("path", StringType), StructField("blob", StringType),
      StructField("flag", BooleanType), StructField("temp", FloatType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

    val autoDir = java.nio.file.Files.createTempDirectory("graft-encauto").toString
    ParquetSink.write(df, autoDir, codec = PqCodec.Snappy, pageVersion = 2,
      encPolicy = EncPolicy.Auto).count()
    val autoFile = new java.io.File(autoDir).listFiles(
      (_, nm) => nm.endsWith(".parquet")).head.getPath
    val meta = ParquetFileReader.readFooterOnly(autoFile)
    val encOf = meta.rowGroups.head.columns
      .map(c => c.pathInSchema.mkString(".") -> c.encodings).toMap
    assert(encOf("sorted_id").contains(PqEncoding.DeltaBinaryPacked))
    assert(encOf("rnd_id").contains(PqEncoding.Plain) &&
      !encOf("rnd_id").contains(PqEncoding.DeltaBinaryPacked))
    assert(encOf("path").contains(PqEncoding.DeltaByteArray))
    assert(encOf("blob").contains(PqEncoding.DeltaLengthByteArray))
    assert(encOf("flag").contains(PqEncoding.Rle))
    assert(encOf("temp").contains(PqEncoding.ByteStreamSplit))

    // external anchor: parquet-mr consumes every auto-chosen encoding
    // value-exactly. Spark's VECTORIZED reader has no BYTE_STREAM_SPLIT
    // support (even in 4.x), so this read goes through parquet-mr's row
    // path — the same library, non-vectorized surface.
    val expect = rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(3), r.getBoolean(4), r.getFloat(5)))
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    // parquet-mr's row reader refuses DELTA_BYTE_ARRAY on potentially-split
    // files (its PARQUET-246 legacy-bug guard) unless splitting is off
    spark.sparkContext.hadoopConfiguration.setBoolean("parquet.split.files", false)
    val viaSpark =
      try spark.read.parquet(autoDir).orderBy("sorted_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getBoolean(4), r.getFloat(5))).toSeq
      finally {
        spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
        spark.sparkContext.hadoopConfiguration
          .setBoolean("parquet.split.files", true)
      }
    assert(viaSpark == expect)
    // and our own distributed source decodes its own delta pages
    val viaOurs = graft.sources.ParquetSource.read(spark, autoDir)
      .orderBy("sorted_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getFloat(5))).toSeq
    assert(viaOurs == expect)
    // DSv2 columnar path (typed vectors) over the same delta/RLE pages
    val viaDsv2 = spark.read.format(graft.sources.GraftParquetFormat.Name)
      .load(autoDir).orderBy("sorted_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getFloat(5))).toSeq
    assert(viaDsv2 == expect)

    // reference v2-default policy: fixed per-type encodings, v1 pages are
    // legal carriers too (encoding is a page property, not a page-version
    // property) — Spark still reads it
    val v2Dir = java.nio.file.Files.createTempDirectory("graft-encv2").toString
    ParquetSink.write(df, v2Dir, codec = PqCodec.Snappy, pageVersion = 1,
      encPolicy = EncPolicy.V2Default).count()
    val v2File = new java.io.File(v2Dir).listFiles(
      (_, nm) => nm.endsWith(".parquet")).head.getPath
    val encOf2 = ParquetFileReader.readFooterOnly(v2File).rowGroups.head
      .columns.map(c => c.pathInSchema.mkString(".") -> c.encodings).toMap
    assert(encOf2("sorted_id").contains(PqEncoding.DeltaBinaryPacked))
    assert(encOf2("rnd_id").contains(PqEncoding.DeltaBinaryPacked))
    assert(encOf2("path").contains(PqEncoding.DeltaByteArray))
    assert(encOf2("blob").contains(PqEncoding.DeltaByteArray))
    assert(encOf2("flag").contains(PqEncoding.Rle))
    val viaSpark2 = spark.read.parquet(v2Dir).orderBy("sorted_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getFloat(5))).toSeq
    assert(viaSpark2 == expect)
    // auto never loses to plain: compressed file strictly smaller
    val plainDir = java.nio.file.Files.createTempDirectory("graft-encpl").toString
    ParquetSink.write(df, plainDir, codec = PqCodec.Snappy, pageVersion = 2,
      encPolicy = EncPolicy.Plain).count()
    val sz = (d: String) => new java.io.File(d).listFiles(
      (_, nm) => nm.endsWith(".parquet")).map(_.length).sum
    assert(sz(autoDir) < sz(plainDir))
  }

  test("parquet writer: per-column property overrides (encoding/dict/codec/stats)") {
    import graft.sources.{ParquetFileReader, ParquetSink, PqCodec, PqEncoding, WriterProps, ColumnProps}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // id: unique sorted longs (dict WOULD win at n=2000 — the test pins
    // delta by ALSO disabling its dict, exercising the pin+toggle combo);
    // lang: low-card string (dict must stay on, untouched column);
    // text: unique strings (per-column gzip + dict off + deltalen pin);
    // score: doubles with stats disabled
    val n = 2000
    val rows = (0 until n).map { i =>
      Row(i.toLong, Seq("en", "de", "fr")(i % 3),
        f"unique text payload $i%06d with trailing entropy ${i * 2654435761L}%x",
        i / 7.0)
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("score", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val props = WriterProps.empty
      .withColumnEncoding("id", PqEncoding.DeltaBinaryPacked)
      .withColumnDictionaryEnabled("id", on = false)
      .withColumnEncoding("text", PqEncoding.DeltaLengthByteArray)
      .withColumnDictionaryEnabled("text", on = false)
      .withColumnCodec("text", PqCodec.Gzip)
      .withColumnStatisticsEnabled("score", on = false)

    def footerOf(dir: String) = {
      val f = new java.io.File(dir).listFiles(
        (_, nm) => nm.endsWith(".parquet")).head.getPath
      ParquetFileReader.readFooterOnly(f).rowGroups.head.columns
        .map(c => c.pathInSchema.mkString(".") -> c).toMap
    }
    def checkFooter(dir: String): Unit = {
      val cols = footerOf(dir)
      // pinned fallback shows because dict is off; no dict page written
      assert(cols("id").encodings.contains(PqEncoding.DeltaBinaryPacked))
      assert(cols("id").dictionaryPageOffset < 0)
      // untouched column keeps its dictionary and the FILE codec
      assert(cols("lang").dictionaryPageOffset >= 0)
      assert(cols("lang").codec == PqCodec.Snappy)
      // per-column codec + encoding pin + dict off
      assert(cols("text").codec == PqCodec.Gzip)
      assert(cols("text").dictionaryPageOffset < 0)
      assert(cols("text").encodings.contains(PqEncoding.DeltaLengthByteArray))
      // statistics disabled: no chunk stats, while others carry them
      assert(cols("score").stats.isEmpty)
      assert(cols("id").stats.nonEmpty)
    }

    val dir1 = java.nio.file.Files.createTempDirectory("graft-colprops").toString
    ParquetSink.write(df, dir1, codec = PqCodec.Snappy, props = props).count()
    checkFooter(dir1)
    // value-exact through Spark's own reader (mixed per-chunk codecs and
    // the pinned encodings are all spec-legal) and through our DSv2 source
    val expect = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val viaSpark = spark.read.parquet(dir1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(viaSpark == expect)
    val viaDsv2 = spark.read.format(graft.sources.GraftParquetFormat.Name)
      .load(dir1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(viaDsv2 == expect)

    // the same overrides through DSv2 writer OPTIONS (dotted keys)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-colprops2").toString
    df.repartition(1).write.format(graft.sources.GraftParquetFormat.Name)
      .option("enc.id", "delta").option("dict.id", "false")
      .option("enc.text", "deltalen").option("dict.text", "false")
      .option("codec.text", "gzip").option("stats.score", "false")
      .mode("overwrite").save(dir2)
    checkFooter(dir2)
    assert(spark.read.parquet(dir2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSeq == expect)

    // rejection semantics (reference properties.rs:426-431 + strict paths)
    intercept[IllegalArgumentException] {
      ColumnProps(encoding = Some(PqEncoding.RleDictionary))
    }
    intercept[IllegalArgumentException] { WriterProps.parseEncoding("dict") }
    // unknown column path fails at the driver, before any task runs
    intercept[IllegalArgumentException] {
      ParquetSink.write(df, dir1,
        props = WriterProps.empty.withColumnEncoding("nope",
          PqEncoding.Plain))
    }
    // type-incompatible pin (delta over a string leaf) fails up front
    intercept[IllegalArgumentException] {
      ParquetSink.write(df, dir1,
        props = WriterProps.empty.withColumnEncoding("text",
          PqEncoding.DeltaBinaryPacked))
    }
  }

  test("distributed ParquetSource: our writer -> our reader as a DataFrame") {
    import graft.sources.{ParquetSink, ParquetSource, PqCodec}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("day", DateType),
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("m", MapType(StringType, LongType))))
    val rows = (0 until 400).map { i =>
      Row(i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000L + i)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + i, 123456000L)),
        new java.math.BigDecimal(s"${i * 7}.25"),
        if (i % 5 == 0) null else Seq(s"a$i", "b"),
        if (i % 3 == 0) Map.empty[String, Long] else Map("k" -> i.toLong))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 3), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    ParquetSink.write(df, dir, codec = PqCodec.Snappy, rowGroupRows = 64).count()
    val back = ParquetSource.read(spark, dir)
    assert(back.schema == StructType(schema.map(_.copy(nullable = true))))
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a.zip(b).forall { case (x, y) => x == y })
    // range read prunes to surviving row groups, exact filter on top
    val pruned = ParquetSource.read(spark, dir, range = Some(("id", 100L, 150L)))
    val got = pruned.filter(col("id").between(100, 150)).count()
    assert(got == 51)
    assert(pruned.count() < 400) // some groups actually pruned
    // column-pruned read (reordered projection)
    val proj = ParquetSource.read(spark, dir, columns = Seq("amt", "id"))
    assert(proj.schema.fieldNames.toSeq == Seq("amt", "id"))
    assert(proj.agg(sum("id")).collect()(0).getLong(0) == (0L until 400L).sum)
  }

  test("DataSource V2: format() read with Catalyst pushdown into our reader") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    ParquetSink.write(docs.repartition(3).sortWithinPartitions("doc_id"), dir,
      rowGroupRows = 128).count()

    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    assert(df.count() == docs.count())

    // projection + range filter: Catalyst pushes both into the scan
    val q = df.select("lang", "doc_id")
      .where(col("doc_id") >= 100 && col("doc_id") <= 400)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftParquetScan"), plan)
    assert(plan.contains("cols=lang,doc_id") || plan.contains("cols=doc_id,lang"),
      plan)
    assert(plan.contains("ranges="), plan)

    val exp = docs.select("lang", "doc_id")
      .where(col("doc_id") >= 100 && col("doc_id") <= 400)
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = q.orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp)
    // aggregates over the v2 path agree with Spark's reader end to end
    val a = df.groupBy("lang").agg(sum("n_chars").as("s")).orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = docs.groupBy("lang").agg(sum("n_chars").as("s")).orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)

    // string predicates prune on byte-array footer stats: lang-sorted files
    // give row groups disjoint lang ranges, so equality/prefix filters skip
    // groups (results stay exact — filters remain residual)
    val dirS = java.nio.file.Files.createTempDirectory("graft-dsv2s").toString
    ParquetSink.write(docs.repartition(2).sortWithinPartitions("lang"), dirS,
      rowGroupRows = 128).count()
    val dfS = spark.read.format(GraftParquetFormat.Name).load(dirS)
    val qs = dfS.where(col("lang") === "de").select("doc_id", "lang")
    val planS = qs.queryExecution.executedPlan.toString
    assert(planS.contains("strRanges=lang:[de,de]"), planS)
    assert(qs.count() == docs.where(col("lang") === "de").count())
    val qp = dfS.where(col("lang").startsWith("e")).select("doc_id")
    val planP = qp.queryExecution.executedPlan.toString
    assert(planP.contains("strRanges=lang:[e,f]"), planP)
    assert(qp.count() == docs.where(col("lang").startsWith("e")).count())
    val qr = dfS.where(col("lang") >= "fr").select("doc_id")
    assert(qr.queryExecution.executedPlan.toString.contains("strRanges=lang:[fr,*]"))
    assert(qr.count() == docs.where(col("lang") >= "fr").count())
  }

  test("DataSource V2: page-level statistics prune pages inside a row group") {
    import graft.sources.{GraftParquetFormat, ParquetSink, ParquetFileReader}
    // one row group, id-sorted, id chunk ~2.4 MiB PLAIN -> multiple ~1 MiB
    // pages, each carrying header statistics
    val n = 300000
    val big = spark.range(n).select(
      col("id"),
      concat(lit("v"), lpad(col("id").cast("string"), 9, "0")).as("tag"))
    val dir = java.nio.file.Files.createTempDirectory("graft-pgprune").toString
    ParquetSink.write(big.coalesce(1).sortWithinPartitions("id"), dir,
      rowGroupRows = 1 << 20).count()

    // the file really has multi-page chunks with per-page stats
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.head
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val meta = ParquetFileReader.readFooter(bytes)
    val (_, spans) = ParquetFileReader.pageSpans(bytes, meta.rowGroups.head.columns.head)
    assert(spans.size >= 2, s"expected multi-page id chunk, got ${spans.size}")
    assert(spans.forall(_.header.stats.exists(_.min.nonEmpty)))

    // a narrow pushed range decodes only the overlapping pages; results
    // match Spark's own reader exactly
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    val q = df.where(col("id") >= 200000L && col("id") <= 200499L)
    assert(q.queryExecution.executedPlan.toString.contains("ranges="), "push")
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = big.where(col("id") >= 200000L && col("id") <= 200499L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == exp)
  }

  test("DataSource V2: flat scans produce columnar batches (ColumnarToRow)") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val n = 20000
    val src = spark.range(n).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(concat(lit("s"), col("id"))).as("s"),
      (col("id") * 0.5).as("d"),
      (col("id") % 2 === 0).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-colbatch").toString
    ParquetSink.write(src.coalesce(1).sortWithinPartitions("id"), dir,
      rowGroupRows = 8192).count()
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    // the scan reports columnar support, so Spark plans codegen'd
    // ColumnarToRow instead of this source converting row-by-row
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2), r.getBoolean(3))
    assert(df.orderBy("id").collect().map(tup).toSeq ==
      src.orderBy("id").collect().map(tup).toSeq)
    // filtered reads (row-group + page pruning) stay columnar and exact
    val q = df.where(col("id") >= 9000L && col("id") < 10500L)
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(q.orderBy("id").collect().map(tup).toSeq ==
      src.where(col("id") >= 9000L && col("id") < 10500L)
        .orderBy("id").collect().map(tup).toSeq)
    // global limit through the columnar path
    assert(df.limit(123).count() == 123L)
  }

  test("DataSource V2: row groups become tasks; planning prunes them") {
    import graft.sources.{GraftParquetFormat, GraftScan, ParquetSink}
    val n = 50000
    val src = spark.range(n).select(col("id"), (col("id") % 7).as("grp"))
    val dir = java.nio.file.Files.createTempDirectory("graft-rgtasks").toString
    ParquetSink.write(src.coalesce(1).sortWithinPartitions("id"), dir,
      rowGroupRows = 10000).count()
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    // 5 row groups in one file ⇒ 5 tasks: one big file parallelizes
    assert(new GraftScan(dir, df.schema, Map.empty)
      .planInputPartitions().length == 5)
    // a pushed range covering one group ⇒ ONE task planned, not 5
    assert(new GraftScan(dir, df.schema, Map("id" -> (42000L, 42999L)))
      .planInputPartitions().length == 1)
    // end-to-end over the multi-task scan stays value-exact
    assert(df.rdd.getNumPartitions == 5)
    assert(df.where(col("id").between(41990, 42009)).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == (41990L to 42009L))
    assert(df.agg(sum("id"), count("*")).collect().head.toSeq ==
      src.agg(sum("id"), count("*")).collect().head.toSeq)
  }

  test("DataSource V2: Hive-partitioned layout with directory-level pruning") {
    import graft.sources.{GraftParquetFormat, GraftScan, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-hivepart").toString
    // partitioned write: lang moves from file payload to directory names
    ParquetSink.writePartitioned(docs, dir, Seq("lang")).count()
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("lang=")))
    // schema re-gains lang as a trailing partition column
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "n_chars", "lang"))
    // full-table equality vs the original (partition col round-trips)
    def key(r: org.apache.spark.sql.Row) = r.getLong(r.fieldIndex("doc_id"))
    val got = df.collect().map(r => (key(r), r.getString(r.fieldIndex("lang")),
      r.getString(r.fieldIndex("text")))).sortBy(_._1).toSeq
    val exp = docs.collect().map(r => (key(r), r.getString(r.fieldIndex("lang")),
      r.getString(r.fieldIndex("text")))).sortBy(_._1).toSeq
    assert(got == exp)
    // Spark's own reader agrees on the layout (external interop)
    assert(spark.read.parquet(dir).count() == docs.count())
    // a lang predicate prunes DIRECTORIES at planning: only that
    // partition's files get tasks
    val one = subdirs.head.stripPrefix("lang=")
    val lo = one.getBytes("UTF-8")
    val pruned = new GraftScan(dir, df.schema, Map.empty,
      strRanges = Map("lang" -> (lo, lo)))
    val all = new GraftScan(dir, df.schema, Map.empty)
    assert(pruned.planInputPartitions().length <
      all.planInputPartitions().length)
    val q = df.where(col("lang") === one)
    assert(q.count() == docs.where(col("lang") === one).count())
    // partition-column-only projection (both scan paths)
    assert(df.select("lang").where(col("lang") === one).count() ==
      docs.where(col("lang") === one).count())
    assert(df.groupBy("lang").count().collect().map(r =>
      (r.getString(0), r.getLong(1))).sorted.toSeq ==
      docs.groupBy("lang").count().collect().map(r =>
        (r.getString(0), r.getLong(1))).sorted.toSeq)
    // mixed predicate: partition col + file col, values exact
    val mixed = df.where(col("lang") === one && col("doc_id") <= 1000L)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val mixedExp = docs.where(col("lang") === one && col("doc_id") <= 1000L)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(mixed.sortBy(_._1).toSeq == mixedExp.sortBy(_._1).toSeq)
  }

  test("DataSource V2: IN-set filters push their min/max envelope") {
    import graft.sources.{GraftParquetFormat, GraftScan, ParquetSink}
    val n = 50000
    val src = spark.range(n).select(col("id"),
      concat(lit("k"), lpad(col("id").cast("string"), 7, "0")).as("k"))
    val dir = java.nio.file.Files.createTempDirectory("graft-inpush").toString
    ParquetSink.write(src.coalesce(1).sortWithinPartitions("id"), dir,
      rowGroupRows = 10000).count()
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    val q = df.where(col("id").isin(42000L, 42017L, 42900L))
    // envelope lands in the scan (ranges=) and planning keeps ONE of the
    // five row groups; the exact IN set stays residual
    assert(q.queryExecution.executedPlan.toString.contains("ranges="))
    assert(new GraftScan(dir, df.schema, Map("id" -> (42000L, 42900L)))
      .planInputPartitions().length == 1)
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(42000L, 42017L, 42900L))
    // string IN envelope
    val qs = df.where(col("k").isin("k0001000", "k0001999"))
    assert(qs.queryExecution.executedPlan.toString.contains("strRanges="))
    assert(qs.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("k0001000", "k0001999"))
  }

  test("DataSource V2: projected scan reads only projected chunks' bytes") {
    import graft.sources.{GraftParquetFormat, ParquetSink, ParquetFileReader}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-rangedio").toString
    ParquetSink.write(docs.coalesce(1), dir).count()
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.head
    // destroy the `text` chunk bytes ON DISK in every row group
    val meta = ParquetFileReader.readFooterOnly(f)
    val raf = new java.io.RandomAccessFile(f, "rw")
    try meta.rowGroups.foreach { rg =>
      val cm = rg.columns.find(_.pathInSchema.headOption.contains("text")).get
      val (s, e) = ParquetFileReader.chunkByteRange(cm)
      raf.seek(s)
      raf.write(Array.fill((e - s).toInt)(0x77.toByte))
    } finally raf.close()
    // a projection that skips `text` still reads correctly end-to-end —
    // the scan never touched those bytes
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    val got = df.select("doc_id", "lang").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = docs.select("doc_id", "lang").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == exp)
    // reading `text` hits the corruption (the scrub was real)
    intercept[Exception] { df.select("text").collect() }
  }

  test("DataSource V2: aggregate pushdown answers count/min/max from footers") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-aggpd").toString
    ParquetSink.write(docs.repartition(3), dir, rowGroupRows = 128).count()

    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    val q = df.agg(count(lit(1)).as("c"), min("doc_id").as("mn"),
      max("doc_id").as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftParquetAggScan"), plan)
    val got = q.collect()(0)
    val exp = docs.agg(count(lit(1)), min("doc_id"), max("doc_id")).collect()(0)
    assert(got.getLong(0) == exp.getLong(0))
    assert(got.getLong(1) == exp.getLong(1))
    assert(got.getLong(2) == exp.getLong(2))

    // with a filter present the aggregate must NOT be pushed (filters stay
    // residual in this source) — values still exact through the row path
    val qf = df.where(col("doc_id") >= 10)
      .agg(count(lit(1)).as("c"), max("doc_id").as("mx"))
    val planF = qf.queryExecution.executedPlan.toString
    assert(!planF.contains("GraftParquetAggScan"), planF)
    val gotF = qf.collect()(0)
    val expF = docs.where(col("doc_id") >= 10)
      .agg(count(lit(1)), max("doc_id")).collect()(0)
    assert(gotF.getLong(0) == expF.getLong(0))
    assert(gotF.getLong(1) == expF.getLong(1))

    // int32 column + an all-null int32 column (stats-less → decode fallback
    // → SQL null, matching Spark's min over an empty value set)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-aggpd2").toString
    val custom = docs.limit(200)
      .withColumn("small", col("doc_id").cast("int"))
      .withColumn("allnull", lit(null).cast("int"))
    custom.repartition(2).write.format(GraftParquetFormat.Name)
      .mode("overwrite").save(dir2)
    val df2 = spark.read.format(GraftParquetFormat.Name).load(dir2)
    val q2 = df2.agg(min("small").as("mn"), max("small").as("mx"),
      min("allnull").as("nn"))
    assert(q2.queryExecution.executedPlan.toString.contains("GraftParquetAggScan"))
    val g2 = q2.collect()(0)
    val e2 = custom.agg(min("small"), max("small"), min("allnull")).collect()(0)
    assert(g2.getInt(0) == e2.getInt(0))
    assert(g2.getInt(1) == e2.getInt(1))
    assert(g2.isNullAt(2) && e2.isNullAt(2))
  }

  test("DataSource V2: limit pushdown stops row-group decode early") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-limitpd").toString
    ParquetSink.write(docs.repartition(2), dir, rowGroupRows = 64).count()
    val df = spark.read.format(GraftParquetFormat.Name).load(dir)
    val q = df.limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("limit=7"), plan)
    assert(q.collect().length == 7)
  }

  test("DataSource V2: reported footer statistics drive broadcast planning") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    ParquetSink.write(docs.repartition(2), dir, rowGroupRows = 256).count()
    val small = spark.read.format(GraftParquetFormat.Name).load(dir)
    val big = spark.range(0, 200000).toDF("doc_id")
    // no broadcast hint: the static planner must choose a broadcast join
    // purely from the scan's reported size (DSv2 without stats defaults to
    // defaultSizeInBytes = huge → sort-merge)
    val q = big.join(small, "doc_id")
    val sparkPlan = q.queryExecution.sparkPlan.toString
    assert(sparkPlan.contains("BroadcastHashJoin"), sparkPlan)
    assert(q.count() == docs.count())
  }

  test("DataSource V2: df.write.format() writes through our file writer") {
    import graft.sources.GraftParquetFormat
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2w").toString
    docs.repartition(3).write.format(GraftParquetFormat.Name)
      .option("codec", "zstd").option("pageVersion", "2")
      .mode("append").save(dir)
    // Spark's own reader consumes what the v2 writer produced
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.select("doc_id", "lang", "text", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    // overwrite truncates previous part files
    docs.limit(10).repartition(1).write.format(GraftParquetFormat.Name)
      .mode("overwrite").save(dir)
    assert(spark.read.format(GraftParquetFormat.Name).load(dir).count() == 10)
    // brotli option: written and read back entirely by our codec (Spark's
    // own reader has no brotli parquet codec on this classpath)
    val brDir = java.nio.file.Files.createTempDirectory("graft-dsv2br").toString
    docs.repartition(2).write.format(GraftParquetFormat.Name)
      .option("codec", "brotli").mode("append").save(brDir)
    val brBack = spark.read.format(GraftParquetFormat.Name).load(brDir)
      .select("doc_id", "lang", "text", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(brBack == a)
  }

  test("big decimals (p>18) roundtrip as FLBA through both readers") {
    import graft.sources.{ParquetSink, ParquetSource}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amt", DecimalType(25, 4))))
    val rows = (0 until 300).map { i =>
      val sign = if (i % 2 == 0) "" else "-"
      Row(i.toLong, new java.math.BigDecimal(
        s"${sign}123456789012345678${i % 10}.${1000 + i % 9000}"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-flba").toString
    ParquetSink.write(df, dir, rowGroupRows = 128).count()
    // external anchor: Spark's own reader decodes our FLBA decimal pages
    val viaSpark = spark.read.parquet(dir).orderBy("id").collect()
    val exp = rows.sortBy(_.getLong(0))
    assert(viaSpark.length == 300)
    viaSpark.zip(exp).foreach { case (a, e) =>
      assert(a.getDecimal(1).compareTo(e.getDecimal(1)) == 0)
    }
    // our own distributed reader agrees
    val viaOurs = ParquetSource.read(spark, dir).orderBy("id").collect()
    viaOurs.zip(exp).foreach { case (a, e) =>
      assert(a.getDecimal(1).compareTo(e.getDecimal(1)) == 0)
    }
  }

  test("multimodal stub plumbing: binary in, typed features out, no shuffle") {
    val bin = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.extractFeatures(bin, "doc_id", "payload")
    val rows = feats.collect()
    assert(rows.length == bin.count().toInt)
    assert(rows.forall(r => r.features.length == 16 && r.width >= 64))
    // determinism
    val again = Multimodal.extractFeatures(bin, "doc_id", "payload").collect()
    assert(rows.map(_.features.toSeq).toSeq.sorted(Ordering.by((s: Seq[Float]) => s.hashCode)) ==
      again.map(_.features.toSeq).toSeq.sorted(Ordering.by((s: Seq[Float]) => s.hashCode)))
  }

  test("text ops: language id, quality, tokens behave sanely") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val scored = d.select(col("lang"), TextOps.langId(col("text")).as("pred"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.wsTokenCount(col("text")).as("toks"))
    val rows = scored.collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(rows.forall(_.getLong(3) > 0))
    // the synthetic corpus is English-ish word soup regardless of its lang
    // label, so assert the predictor's output domain + determinism instead
    val preds = rows.map(_.getString(1)).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "it", "pt", "und")), preds)
    val again = scored.collect().map(_.getString(1)).toSeq
    assert(again == rows.map(_.getString(1)).toSeq)
  }

  test("text ops: PII redaction masks planted identifiers, leaves clean text") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org today",
        "mail me at <EMAIL> today"),
      (2L, "server 192.168.001.12 answered", "server <IP> answered"),
      (3L, "token 0123456789abcdef0123456789ABCDEF end", "token <KEY> end"),
      (4L, "call 555-123-4567 now", "call <NUM> now"),
      (5L, "card 4111-1111-1111 paid", "card <NUM> paid"),
      // clean text unmodified: short digit runs, short hex, bare words
      (6L, "v1.2.3 build 42 cafe babe", "v1.2.3 build 42 cafe babe"),
      // an ip-shaped mail host is not an email (no alpha TLD), and '@' is
      // a word boundary — both ip literals redact
      (7L, "bot@10.0.0.1 pinged 10.0.0.2", "bot@<IP> pinged <IP>"),
      // overlong digit-dash run: the 7-15-char rule matches the longest
      // prefix that ends on a digit at a word boundary (backtracking), the
      // tail stays — deliberate: a 19-char run is not phone/SSN shaped
      (8L, "card 4111-1111-1111-1111!", "card <NUM>-1111!"))
    val got = cases.toDF("id", "t", "want")
      .select(col("id"), col("want"), TextOps.redactPii(col("t")).as("got"))
      .collect().sortBy(_.getLong(0))
    got.foreach(r => assert(r.getString(2) == r.getString(1),
      s"case ${r.getLong(0)}: got '${r.getString(2)}'"))
  }

  test("deterministic sampling: parallelism-invariant, salt-independent, ANSI-safe") {
    val sp = spark
    import sp.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // membership must not depend on partitioning (DataFrame.sample's does)
    val a = Sampling.bernoulli(d, "doc_id", 0.3, salt = 11)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(d.repartition(17), "doc_id", 0.3, salt = 11)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, s"sample changed with partitioning: ${a.size} vs ${b.size}")
    // fraction lands near its target
    val n = d.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.05, s"got ${a.size / n}")
    // different salts give (nearly) independent draws
    val c = Sampling.bernoulli(d, "doc_id", 0.3, salt = 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(c).size / math.max(1.0, a.size)
    assert(overlap < 0.6, s"salted samples overlap $overlap")
    // stratified: per-stratum rates follow the config
    val strat = Sampling.stratified(d, "doc_id", "lang",
      Map.empty, default = 1.0)
    assert(strat.count() == d.count(), "default 1.0 must keep everything")
    // ANSI mode must never throw, whatever the key
    val extreme = Seq(Long.MaxValue, Long.MinValue, -1L, 0L)
      .toDF("k")
    assert(Sampling.bernoulli(extreme, "k", 0.5).count() <= 4)
  }

  test("text ops: duplicate-line fraction") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, "a\nb\nc", 0.0),
      (2L, "a\na\na\nb", 0.5),     // 4 lines, 2 distinct -> 2/4
      (3L, "", 0.0),               // one empty line, distinct
      (4L, "x\nx", 0.5))
      .toDF("id", "t", "want")
      .select(col("id"), col("want"), TextOps.dupLineFraction(col("t")).as("got"))
      .collect().sortBy(_.getLong(0))
    rows.foreach(r => assert(math.abs(r.getDouble(2) - r.getDouble(1)) < 1e-12,
      s"case ${r.getLong(0)}: got ${r.getDouble(2)}"))
  }

  test("DataSource V2: runtime join-key filtering (DPP) narrows the scan") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // fact side: one file, many small row groups sorted by doc_id, so a
    // narrowed doc_id envelope visibly prunes row groups
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    ParquetSink.write(docs.coalesce(1).sortWithinPartitions("doc_id"), dir,
      rowGroupRows = 50).count()
    val fact = spark.read.format(GraftParquetFormat.Name).load(dir)
    // dim side: tiny but FILE-backed (a local relation would constant-fold
    // its filter away and DPP needs a surviving selective predicate)
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dppdim").toString
    spark.createDataFrame(Seq((42L, "keep"), (57L, "keep"),
      (999999999L, "drop"))).toDF("k", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim, fact("doc_id") === dim("k"))
      .where(col("tag") === "keep")
      .select("doc_id", "lang", "k")
    val rows = joined.collect()
    val expected = docs.where(col("doc_id").isin(42L, 57L)).count()
    assert(rows.length == expected && rows.forall(r =>
      r.getLong(0) == r.getLong(2)))
    // the scan instance in the executed plan must have been runtime-narrowed
    // on the join key by the dim side's surviving values
    val exec = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE materializes stages as leaf QueryStageExec nodes — recurse into
    // their wrapped plans to reach the BatchScanExec
    def findScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.connector.read.Scan] = p.flatMap {
      case b: BatchScanExec => Seq(b.scan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
      case _ => Nil
    }
    val scans = findScans(exec)
      .collectFirst { case g: graft.sources.GraftScan => g }
    assert(scans.nonEmpty, "GraftScan not found in executed plan")
    assert(scans.get.runtimeFilteredColumns == Seq("doc_id"),
      s"runtime filter did not reach the scan: ${exec.toString.take(2000)}")
    // narrowed planning keeps only row groups overlapping [42, 57]: with
    // 200-row groups over sorted doc_ids that is 1 of many
    val planned = scans.get.planInputPartitions().length
    val total = new graft.sources.GraftScan(dir, fact.schema, Map.empty)
      .planInputPartitions().length
    assert(total > 5 && planned < total,
      s"expected runtime-narrowed plan < $total tasks, got $planned")
  }

  test("resumable parquet sink: lineage commits, reruns skip, partial resumes") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").repartition(4, col("doc_id"))
      .sortWithinPartitions("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val lin1 = ParquetSink.writeResumable(docs, dir).cache()
    // lineage: one row per (partition, column), sha+bytes recorded
    assert(lin1.select("partId").distinct().count() == 4)
    assert(lin1.count() == 12)
    val linRows = lin1.collect()
    assert(linRows.forall(_.getAs[String]("fileSha256").length == 64))
    assert(linRows.forall(_.getAs[Long]("compressedBytes") > 0))
    // data files readable through our scan (lineage dir must be skipped)
    val back = spark.read.format(GraftParquetFormat.Name).load(dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum("doc_id")).head.getLong(0) ==
      docs.agg(sum("doc_id")).head.getLong(0))
    // ...and through Spark's own reader (external interop)
    assert(spark.read.parquet(dir).count() == docs.count())
    // recorded sha matches bytes on disk
    val one = linRows.head
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val digest = md.digest(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(one.getAs[String]("path"))))
      .map(b => f"$b%02x").mkString
    assert(digest == one.getAs[String]("fileSha256"))
    // rerun over the same input: all partitions recorded done -> no file
    // rewritten, no lineage rows appended
    val mtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val lin2 = ParquetSink.writeResumable(docs, dir)
    assert(lin2.count() == 12)
    val mtimes2 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(mtimes2 == mtimes)
    // partial resume: seed a fresh dir's lineage with partitions 0-1 only,
    // rerun -> exactly the two missing partition files get written
    val dir2 = java.nio.file.Files.createTempDirectory("graft-resume2").toString
    lin1.where(col("partId") < 2).write.parquet(s"$dir2/_lineage")
    ParquetSink.writeResumable(docs, dir2)
    val files2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    assert(files2 == Seq("part-00002.parquet", "part-00003.parquet"))
    assert(spark.read.parquet(s"$dir2/_lineage").select("partId")
      .distinct().count() == 4)
    lin1.unpersist()
  }

  test("dict chunks carry exact distinct_count in footer statistics") {
    import graft.sources.{ParquetFileReader, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-dc").toString
    ParquetSink.write(docs.coalesce(1), dir).count()
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val meta = ParquetFileReader.readFooterOnly(file)
    val langCm = meta.rowGroups.head.columns
      .find(_.pathInSchema == Seq("lang")).get
    val expected = docs.select("lang").distinct().count()
    assert(langCm.stats.exists(_.distinctCount == expected),
      s"lang distinct_count = ${langCm.stats.map(_.distinctCount)}, " +
        s"expected $expected")
    // the field stays well-formed for external readers
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("INT96 timestamp writes read back exactly through Spark AND our reader") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-i96t").toString
    ParquetSink.write(ev.repartition(2), dir, int96Timestamps = true).count()
    // footer pins physical INT96 on the ts leaf
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    val meta = graft.sources.ParquetFileReader.readFooterOnly(file)
    val tsElem = meta.schema.find(_.name == "ts").get
    assert(tsElem.typ == graft.sources.PqType.Int96,
      s"ts leaf wrote physical type ${tsElem.typ}, expected INT96")
    // INT96 always reads back as a session-TZ timestamp; the source column
    // is NTZ — under the UTC session both carry the same micros, so the
    // value comparison happens on unix_micros
    def micros(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = micros(ev)
    // external anchor: Spark's own reader with int96RebaseMode defaults
    assert(micros(spark.read.parquet(dir)) == exp)
    // our DSv2 reader (boxed INT96 fill on the columnar path)
    assert(micros(spark.read.format(GraftParquetFormat.Name).load(dir)) == exp)
    // and our RDD row source
    assert(micros(graft.sources.ParquetSource.read(spark, dir)) == exp)
  }

  test("pluggable I/O: full write/scan loop over a Hadoop FileSystem path") {
    // file:// routes every open/list/create/delete through Hadoop's
    // FileSystem — the in-sandbox stand-in for hdfs:// / s3a:// paths
    // (VERDICT r2 'What's missing' #1)
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft-hfs").toString
    val written = ParquetSink.write(
      docs.repartition(3).sortWithinPartitions("doc_id"), dir,
      rowGroupRows = 1 << 8)
    assert(written.count() == 3)
    assert(written.collect().forall(_.getString(0).startsWith("file:")))
    // our DSv2 scan over the URI path, with pushed range + projection
    val back = spark.read.format(GraftParquetFormat.Name).load(dir)
      .where(col("doc_id").between(5, 40)).select("doc_id", "lang")
    val exp = docs.where(col("doc_id").between(5, 40)).select("doc_id", "lang")
    assert(back.orderBy("doc_id").collect().toSeq ==
      exp.orderBy("doc_id").collect().toSeq)
    // the RDD source over the same URI
    val src = graft.sources.ParquetSource.read(spark, dir,
      range = Some(("doc_id", 5L, 40L)))
      .where(col("doc_id").between(5, 40))
    assert(src.count() == exp.count())
    // DSv2 write (truncate) through the seam as well
    docs.limit(10).write.format(GraftParquetFormat.Name)
      .mode("overwrite").save(dir)
    assert(spark.read.format(GraftParquetFormat.Name).load(dir).count() == 10)
  }

  test("LSH hot-bucket cap keeps a degenerate corpus linear and is surfaced") {
    val sp = spark
    import sp.implicits._
    // 3000 identical documents: every minhash band bucket is one degenerate
    // 3000-member bucket -> uncapped that is ~4.5M pairs per band; capped
    // at 64 the candidate join is bounded and completes immediately
    val n = 3000
    val degenerate = (0 until n).map(i => (i.toLong, "the same text " * 10))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(degenerate, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.5, maxBucket = 64)
    // capped: the 64 smallest keys pair in full (64*63/2) and every one of
    // the 2936 overflow members still pairs with the anchor (doc 0) — so
    // keep-first dedup removes ALL 2999 duplicates despite the cap, at
    // linear (not quadratic) candidate cost
    val got = pairs.count()
    assert(got == 64L * 63 / 2 + (n - 64),
      s"expected capped+anchored pair count, got $got")
    val coveredDocs = pairs.select(col("keyB")).distinct().count()
    assert(coveredDocs == n - 1,
      s"every non-anchor doc must appear as a keyB, got $coveredDocs")
    // the cap is observable: every band bucket exceeded the bound
    val sig = Dedup.minhashSignature(degenerate, "text", 16)
      .select(col("doc_id").as("__key"), col("minhash"))
    val capped = Dedup.cappedBucketCount(
      Dedup.minhashBands(sig, bands = 4, rowsPerBand = 4),
      Seq("band", "bucket"), 64)
    assert(capped == 4, s"expected 4 capped buckets, got $capped")
    // simhash path: same degenerate corpus, tight cap — identical docs all
    // land in one (tbl, seg) bucket per segment, and the anchor leg must
    // still link every overflow doc so keep-first dedup removes all of them
    val sPairs = Dedup.simhashNearDups(degenerate.limit(500), "doc_id",
      "text", maxDist = 2, maxBucket = 32).cache()
    assert(sPairs.count() > 0)
    val sCovered = sPairs.select(col("keyB")).distinct().count()
    assert(sCovered == 499,
      s"every non-anchor doc must appear as a keyB, got $sCovered")
    sPairs.unpersist()
    // embedding path: 400 identical vectors, one bucket, cap 16 — anchor
    // coverage must again reach every overflow key
    val sameVec = (0 until 400).map(i => (i.toLong, Seq.fill(8)(0.5)))
      .toDF("vec_id", "embedding")
    val ePairs = Dedup.embeddingNearDups(sameVec, "vec_id", "embedding",
      threshold = 0.9, planes = 6, maxBucket = 16).cache()
    val eCovered = ePairs.select(col("keyB")).distinct().count()
    assert(eCovered == 399,
      s"every non-anchor vec must appear as a keyB, got $eCovered")
    ePairs.unpersist()
  }

  test("lshPlanesFor encodes the measured sizing rule") {
    // planes = ceil(log2(n / targetBucket)), floored at 4
    assert(Similarity.lshPlanesFor(2000, 32) == 6)
    assert(Similarity.lshPlanesFor(200000, 32) == 13)
    assert(Similarity.lshPlanesFor(200000, 12) == 15)
    assert(Similarity.lshPlanesFor(100, 32) == 4)     // floor
    assert(Similarity.lshPlanesFor(1L << 40, 32) == 35) // 1T vectors
    intercept[IllegalArgumentException](Similarity.lshPlanesFor(0, 32))
  }

  test("lshTopK cap bounds candidates but never drops a query") {
    val sp = spark
    import sp.implicits._
    // 300 near-identical vectors: one (tbl, bucket) per table holds all of
    // them. A both-sides cap would delete 300-maxBucket keys from every
    // bucket and those queries would vanish from the output entirely; the
    // neighbor-side-only cap keeps every key on the query side.
    val n = 300
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(d => 1.0f + (i * 8 + d) * 1e-6f))
    }.toDF("vec_id", "embedding")
    val top = Similarity.lshTopK(vecs, "vec_id", "embedding",
      k = 1, planes = 4, tables = 2, maxBucket = 32)
    val queries = top.select("query").distinct().count()
    assert(queries == n, s"every key must stay a query: $queries of $n")
    // and the candidate explosion is bounded: <= n * maxBucket * tables
    assert(top.count() == n) // k=1: exactly one neighbor per query
  }

  test("ngram jaccard join-backs stay block-scoped for per-block keys") {
    val sp = spark
    import sp.implicits._
    // doc ids are unique only WITHIN lang (the reason blockCols exists):
    // key 1 is a different document in en vs fr. A bare-key payload
    // join-back would cross-match the fr row onto the en pair.
    val rows = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "alpha beta gamma delta epsilon eta"),
      (1L, "fr", "un deux trois quatre cinq six"),
      (2L, "fr", "sept huit neuf dix onze douze"))
      .toDF("doc_id", "lang", "text")
    val pairs = Dedup.ngramJaccardPairs(rows, "doc_id", "text",
      blockCols = Seq("lang"), n = 2, threshold = 0.3).collect()
    // en 1-2 share 4 of 5 bigrams (j = 4/6 = 0.667); fr 1-2 share none.
    // exactly ONE pair row: cross-block duplication would emit more (or
    // compute a jaccard from mismatched shingle sets)
    assert(pairs.length == 1, pairs.mkString(", "))
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(math.abs(pairs.head.getDouble(2) - 4.0 / 6.0) < 1e-9)
  }

  test("image decode guards hostile headers and the declared media type") {
    val sp = spark
    import sp.implicits._
    // craft a PNG whose IHDR declares 40000x40000 (~6.4 GB raster) on a
    // tiny payload: the header-probe guard must refuse it before any
    // pixel allocation, falling back to the stub
    val png = Multimodal.solidPng(4, 4, 0x336699)
    val evil = png.clone()
    def be(v: Int, off: Int): Unit = {
      evil(off) = (v >>> 24).toByte; evil(off + 1) = (v >>> 16).toByte
      evil(off + 2) = (v >>> 8).toByte; evil(off + 3) = v.toByte
    }
    be(40000, 16); be(40000, 20) // IHDR width, height
    val crc = new java.util.zip.CRC32
    crc.update(evil, 12, 17) // chunk type + IHDR body
    be(crc.getValue.toInt, 29)
    val df = Seq((1L, evil), (2L, png)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload")
      .collect().sortBy(_.key)
    assert(feats(0).width != 40000, "hostile header must not be decoded")
    assert(feats(1).width == 4 && feats(1).height == 4) // real decode intact
    // declared non-image payloads take the stub even if image-decodable
    val audio = Multimodal.extractFeatures(df, "doc_id", "payload",
      mediaType = "audio").collect()
    assert(audio.forall(_.mediaType == "audio"))
  }

  test("audio decode: real WAV PCM features, hostile header, stub fallback") {
    val sp = spark
    import sp.implicits._
    val wav = Multimodal.squareWav(8000, 1000, 12000)
    // hostile header: same WAV with the data-chunk size rewritten to claim
    // 1 GiB of PCM (512M frames) — the declared-size guard must refuse it
    // BEFORE any buffer allocation and fall back to the stub
    val evil = wav.clone()
    val dataAt = (0 until evil.length - 8).find(i =>
      evil(i) == 'd' && evil(i + 1) == 'a' && evil(i + 2) == 't' &&
        evil(i + 3) == 'a').get
    val huge = 1 << 30
    evil(dataAt + 4) = (huge & 0xFF).toByte
    evil(dataAt + 5) = ((huge >> 8) & 0xFF).toByte
    evil(dataAt + 6) = ((huge >> 16) & 0xFF).toByte
    evil(dataAt + 7) = ((huge >> 24) & 0xFF).toByte
    val df = Seq((1L, wav), (2L, evil),
      (3L, "not audio at all".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload",
      mediaType = "audio").collect().sortBy(_.key)
    // real decode: true sample rate + channels, RMS of a full-scale-
    // alternating square wave == amplitude in EVERY window
    assert(feats(0).width == 8000 && feats(0).height == 1)
    assert(feats(0).features.length == 16 &&
      feats(0).features.forall(f => math.abs(f - 12000f / 32768f) < 1e-4),
      feats(0).features.mkString(","))
    // hostile header -> stub (stub widths are 64..1023, never a real rate)
    assert(feats(1).width < 8000, "declared 1 GiB of PCM must not decode")
    // unparseable payload -> stub; declared type always sticks
    assert(feats(2).width < 8000)
    assert(feats.forall(_.mediaType == "audio"))
    // declared video still takes the deterministic stub even for a real WAV
    // (a WAV is RIFF but not RIFF/AVI — the container check must hold)
    val video = Multimodal.extractFeatures(df, "doc_id", "payload",
      mediaType = "video").collect()
    assert(video.forall(m => m.mediaType == "video" && m.width < 1024))
  }

  test("video metadata decode: MP4 + AVI headers, hostile containers, stub fallback") {
    val sp = spark
    import sp.implicits._
    val mp4 = Multimodal.tinyMp4(640, 360, timescale = 600, duration = 1500)
    val avi = Multimodal.tinyAvi(320, 240, usPerFrame = 40000, totalFrames = 100)
    // mp4 with only a 0x0 (audio/hint-style) track: no video track found,
    // stub fallback — and a hostile avi claiming a 2^30 width: the
    // MaxVideoDim guard must reject it (an AVI dwWidth is a full 32-bit
    // field, unlike mp4's 16.16 whose integer part caps at 65535)
    val evilMp4 = Multimodal.tinyMp4(640, 360, 600, 1500)
    locally {
      // zero out the tkhd width+height (last 8 bytes of the 84-byte body)
      val at = (0 until evilMp4.length - 4).find(i =>
        evilMp4(i) == 't' && evilMp4(i + 1) == 'k' && evilMp4(i + 2) == 'h' &&
          evilMp4(i + 3) == 'd').get
      val wAt = at + 4 + 84 - 8
      (0 until 8).foreach(i => evilMp4(wAt + i) = 0)
    }
    val evilAvi = Multimodal.tinyAvi(320, 240, 40000, 100)
    locally {
      // dwWidth lives 32 bytes into the avih payload (which starts 8 bytes
      // after the 'avih' fourcc): claim width 2^30
      val at = (0 until evilAvi.length - 4).find(i =>
        evilAvi(i) == 'a' && evilAvi(i + 1) == 'v' && evilAvi(i + 2) == 'i' &&
          evilAvi(i + 3) == 'h').get
      val wAt = at + 8 + 32
      evilAvi(wAt) = 0; evilAvi(wAt + 1) = 0; evilAvi(wAt + 2) = 0
      evilAvi(wAt + 3) = 0x40.toByte
    }
    // hostile duration: 2^31 frames x 2^31 us/frame — the double-math
    // product (no long wrap) trips the MaxVideoSeconds ceiling; and a
    // 1 us/frame avi trips the MaxVideoFps ceiling
    val evilDur = Multimodal.tinyAvi(320, 240, 40000, 100)
    val evilFps = Multimodal.tinyAvi(320, 240, 40000, 100)
    locally {
      def patch(a: Array[Byte], off: Int, v: Long): Unit = {
        val at = (0 until a.length - 4).find(i =>
          a(i) == 'a' && a(i + 1) == 'v' && a(i + 2) == 'i' && a(i + 3) == 'h').get
        val p = at + 8 + off
        a(p) = v.toByte; a(p + 1) = (v >>> 8).toByte
        a(p + 2) = (v >>> 16).toByte; a(p + 3) = (v >>> 24).toByte
      }
      patch(evilDur, 0, 0x80000000L) // usPerFrame = 2^31
      patch(evilDur, 16, 0x80000000L) // totalFrames = 2^31
      patch(evilFps, 0, 1L) // 1 us/frame -> 1e6 fps
    }
    assert(Multimodal.decodeVideo(0L, evilDur).isEmpty,
      "2^62-microsecond duration must not pass the sanity ceiling")
    assert(Multimodal.decodeVideo(0L, evilFps).isEmpty,
      "1e6 fps must not pass the sanity ceiling")
    // truncated mp4: moov size claims bytes past the buffer end
    val truncated = mp4.take(mp4.length - 20)
    val df = Seq(
      (1L, mp4), (2L, avi), (3L, evilMp4), (4L, truncated),
      (5L, "not a container".getBytes("UTF-8")), (6L, evilAvi))
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload",
      mediaType = "video").collect().sortBy(_.key)
    // real mp4 metadata: presentation dims from tkhd, duration from mvhd
    assert(feats(0).width == 640 && feats(0).height == 360)
    assert(math.abs(feats(0).features(0) - 2.5f) < 1e-6) // 1500/600 s
    assert(feats(0).features(1) == 0f) // mp4 fps needs sample tables
    // real avi metadata: avih dims, 25 fps, 4 s
    assert(feats(1).width == 320 && feats(1).height == 240)
    assert(math.abs(feats(1).features(0) - 4.0f) < 1e-6)
    assert(math.abs(feats(1).features(1) - 25.0f) < 1e-6)
    // video-track-less mp4 -> stub (stub dims are 64..1023)
    assert(feats(2).width <= 1023, s"trackless width ${feats(2).width}")
    // truncated container -> stub, no exception
    assert(feats(3).width <= 1023)
    // non-container -> stub; declared type sticks
    assert(feats(4).width <= 1023)
    // 2^30-wide hostile avi -> MaxVideoDim guard -> stub
    assert(feats(5).width <= 1023, s"hostile avi width ${feats(5).width}")
    assert(feats.forall(_.mediaType == "video"))
  }

  test("video parsers survive random mutations (decode-or-None, never throw)") {
    // the AFL-target contract applied to the container parsers: any byte
    // mutation of a valid file must either parse (sane values only) or
    // return None — no exception escapes, no absurd dimensions pass
    val mp4 = Multimodal.tinyMp4(640, 360, 600, 1500)
    val avi = Multimodal.tinyAvi(320, 240, 40000, 100)
    val rnd = new scala.util.Random(20260820)
    (0 until 2000).foreach { i =>
      val base = if (i % 2 == 0) mp4 else avi
      val m = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextInt(4) == 0) m.take(rnd.nextInt(m.length)) else m
      Multimodal.decodeVideo(i.toLong, cut).foreach { meta =>
        assert(meta.width > 0 && meta.width <= 65535 &&
          meta.height > 0 && meta.height <= 65535 &&
          meta.features(0) >= 0 && meta.features(0) <= 1e7f &&
          meta.features(1) >= 0 && meta.features(1) <= 1000f,
          s"mutation $i produced $meta")
      }
    }
  }

  test("IVF compiles a sane plan and answers at 768 dims (no per-dim aggs)") {
    val sp = spark
    import sp.implicits._
    // 40 vectors of 768 dims — with per-dimension Lloyd aggregates this
    // plan would carry 768 avg() expressions; the kernel path carries none
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(768)(d =>
        math.sin(i * 0.7 + d * 0.13).toFloat))
    }.toDF("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      k = 2, nLists = 4, nProbe = 2, iters = 1)
    val plan = ivf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("avg("), "per-dimension aggregates leaked back in")
    assert(ivf.count() > 0)
    assert(ivf.select("query").distinct().count() == 40)
  }

  test("bruteForceTopK refuses a corpus above its collect guard rail") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 1,
        maxCorpusRows = 3)
    }
    assert(e.getMessage.contains("lshTopK"))
  }

  test("exactTopK (distributed corpus) matches bruteForceTopK row-for-row") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probes = emb.where(col("vec_id") % 7 === 0)
    val dist = Similarity.exactTopK(emb.repartition(8), probes,
      "vec_id", "embedding", k = 3)
      .select("query", "neighbor", "cosine", "rank")
    // the broadcast-corpus baseline restricted to the same probe ids: the
    // two shapes must agree on every (query, neighbor, cosine, rank) row —
    // identical arithmetic, identical tie rule
    val base = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .join(probes.select(col("vec_id").as("query")), "query")
      .select("query", "neighbor", "cosine", "rank")
    assert(dist.count() == base.count())
    assert(dist.exceptAll(base).count() == 0 &&
      base.exceptAll(dist).count() == 0)
  }

  test("exactTopK refuses duplicate probe keys") {
    // a duplicated probe id would make the global merge rank the doubled
    // partials as ONE list (duplicate rows + a dropped true neighbor)
    val sp = spark
    import sp.implicits._
    val emb = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactTopK(emb.where(col("vec_id") === 2), emb,
        "vec_id", "embedding", k = 1)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("exactTopK refuses a probe set above its broadcast guard rail") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactTopK(emb, emb, "vec_id", "embedding", k = 1,
        maxQueryRows = 3)
    }
    assert(e.getMessage.contains("probe"))
  }

  test("estimateStatistics over >FooterPlanLimit files skips footer reads") {
    // a directory of (limit+1) tiny parquet files: the stats path must fall
    // back to a bounded footer sample + listing-size extrapolation
    // (sizeInBytes present and in uncompressed terms, numRows absent)
    // instead of opening every footer on the driver
    import graft.sources.{GraftScan, ParquetFileWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft-manyfiles").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val one = Seq(org.apache.spark.sql.Row(1L))
    (0 to GraftScan.FooterPlanLimit).foreach { i =>
      ParquetFileWriter.writeFile(f"$dir/f-$i%05d.parquet", schema,
        one.iterator)
    }
    val scan = new GraftScan(dir, schema, Map.empty)
    val t0 = System.nanoTime()
    val stats = scan.estimateStatistics()
    val ms = (System.nanoTime() - t0) / 1e6
    assert(stats.sizeInBytes().isPresent && stats.sizeInBytes().getAsLong > 0)
    // never below on-disk bytes: the estimate must stay uncompressed-like
    // on both sides of the cap so a compressed table can't flip into a
    // too-small broadcast estimate by crossing the file-count threshold
    val onDisk = new java.io.File(dir).listFiles().map(_.length).sum
    assert(stats.sizeInBytes().getAsLong >= onDisk)
    assert(!stats.numRows().isPresent,
      "fallback stats must not claim a row count")
    assert(ms < 5000, f"stats path took $ms%.0f ms — all footers were read?")
  }

  test("wide decimals (p > 18) roundtrip through the chunk pipeline") {
    val sp = spark
    import sp.implicits._
    // values exercise sign, > 8-byte unscaled magnitudes, and nulls
    val df = Seq(
      (1L, "123456789012345678901.2345"),
      (2L, "-98765432109876543210.0001"),
      (3L, "0.0000"),
      (4L, null),
      (5L, "-1.5000")
    ).toDF("id", "s").select(col("id"),
      col("s").cast("decimal(25,4)").as("d"))
    val back = Roundtrip.through(df, sortKeys = Seq("id"))
    val exp = df.collect().map(r => (r.getLong(0), Option(r.getDecimal(1))
      .map(_.toPlainString).orNull)).sortBy(_._1).toSeq
    val got = back.collect().map(r => (r.getLong(0), Option(r.getDecimal(1))
      .map(_.toPlainString).orNull)).sortBy(_._1).toSeq
    assert(got == exp)
  }

  test("decodeWhere scales decimal bounds to the stored unscaled int64") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 400).map(i => (i.toLong, BigDecimal(i) / 100))
      .toDF("id", "price").select(col("id"),
        col("price").cast("decimal(12,2)").as("price"))
    val chunks = EncodeJob.encode(df, 1, Seq.empty, Seq("id"),
      chunkRows = 100).cache()
    // bounds in USER units (0.50..1.00 means unscaled 50..100): with raw
    // longValue bounds (0..1) every matching chunk would be pruned
    val got = DecodeJob.decodeWhere(chunks, df.schema, "price",
      java.math.BigDecimal.valueOf(0.50), java.math.BigDecimal.valueOf(1.00))
      .where(col("price") >= 0.50 && col("price") <= 1.00)
    assert(got.count() == 51)
    // and the pruning actually dropped chunks (4 chunks of 100 rows; the
    // [0.50, 1.00] range lives entirely in the first)
    val kept = DecodeJob.decodeWhere(chunks, df.schema, "price",
      java.math.BigDecimal.valueOf(0.50), java.math.BigDecimal.valueOf(1.00))
    assert(kept.count() == 100, s"expected 1 surviving chunk, got ${kept.count()}")
    chunks.unpersist()
  }

  test("struct and nested-array schemas fail fast on the driver in EncodeJob") {
    val sp = spark
    import sp.implicits._
    val withStruct = Seq((1L, ("a", 2))).toDF("id", "s")
    val e1 = intercept[IllegalArgumentException](
      EncodeJob.encode(withStruct, 2, Seq.empty, Seq.empty))
    assert(e1.getMessage.contains("unsupported column type"))
    val nested = Seq((1L, Seq(Seq(1, 2)))).toDF("id", "aa")
    val e2 = intercept[IllegalArgumentException](
      EncodeJob.encode(nested, 2, Seq.empty, Seq.empty))
    assert(e2.getMessage.contains("LIST element"))
  }

  test("resume after a lost lineage write does not duplicate chunks") {
    val out = java.nio.file.Files.createTempDirectory("graft-resume2").toString
    val df = code(600L, 2)
    EncodeJob.encodeResumable(df, out, 4, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    val chunks1 = spark.read.parquet(s"$out/chunks").count()
    val rows1 = DecodeJob.decode(
      spark.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow](
        org.apache.spark.sql.Encoders.product[graft.operators.ChunkRow]),
      df.schema).count()
    // simulate a run that committed chunk files but died before lineage
    def rmLineage(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$out/lineage"))
    }
    rmLineage()
    EncodeJob.encodeResumable(df, out, 4, Seq("repo", "lang"),
      Seq("repo", "path", "commit"))
    val chunks2 = spark.read.parquet(s"$out/chunks").count()
    assert(chunks2 == chunks1,
      s"re-encode after lost lineage duplicated chunks: $chunks1 -> $chunks2")
    val rows2 = DecodeJob.decode(
      spark.read.parquet(s"$out/chunks").as[graft.operators.ChunkRow](
        org.apache.spark.sql.Encoders.product[graft.operators.ChunkRow]),
      df.schema).count()
    assert(rows2 == rows1)
  }

  test("Verifier treats roundtripped nulls as matches, not mismatches") {
    val df = code(300L, 2).withColumn("content",
      when(col("content_len") % 3 === 0, lit(null)).otherwise(col("content")))
    val back = Roundtrip.through(df, sortKeys = Seq("repo", "path", "commit"))
    val (ns, nd, bad) = Verifier.verify(df, back,
      keyCols = Seq("repo", "path", "commit"), contentCol = "content")
    assert(ns == 300L && nd == 300L, s"counts must include null rows: $ns/$nd")
    assert(bad == 0L, s"$bad roundtripped nulls flagged as mismatches")
  }

  test("sampleFrames tiles the payload with integer strides") {
    val sp = spark
    import sp.implicits._
    val payload = Array.tabulate(10)(_.toByte) // 10 bytes, frames = 4
    val df = Seq((1L, payload)).toDF("id", "media")
    val got = Multimodal.sampleFrames(df, "id", "media", frames = 4)
      .orderBy("frameIdx").collect()
      .map(r => r.getAs[Array[Byte]]("frameBytes").toSeq)
    // stride = floor(10/4) = 2: back-to-back windows 0-1, 2-3, 4-5, 6-7
    assert(got.toSeq == Seq(Seq[Byte](0, 1), Seq[Byte](2, 3),
      Seq[Byte](4, 5), Seq[Byte](6, 7)))
  }

  test("LSH/ANN parameter guards fail fast") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", numHashes = 8, bands = 16))
    assert(e1.getMessage.contains("bands"))
    val emb = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 0))
    assert(e2.getMessage.contains("k must be positive"))
  }

  test("partition values with spaces and '+' round-trip across engines") {
    import graft.sources.{GraftParquetFormat, ParquetSink}
    val sp = spark
    import sp.implicits._
    // URLEncoder form-encoding would corrupt BOTH of these: 'a b' -> 'a+b'
    // on write, and a literal '+' -> ' ' on read of a Spark-written dir
    val vals = Seq("a b", "a+b", "plain", "x=y", "p/q")
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, s"t$i") }
      .toDF("id", "part", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-escpart").toString
    ParquetSink.writePartitioned(df, dir, Seq("part")).count()
    // Spark's own reader (percent-unescaping) sees the exact values
    val bySpark = spark.read.parquet(dir).select("id", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(bySpark == vals.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    // our reader agrees with itself
    val byUs = spark.read.format(GraftParquetFormat.Name).load(dir)
      .select("id", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(byUs == bySpark)
    // and reads a SPARK-written partitioned dir (incl. literal '+') exactly
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sparkpart").toString
    df.write.mode("overwrite").partitionBy("part").parquet(dir2)
    val crossRead = spark.read.format(GraftParquetFormat.Name).load(dir2)
      .select("id", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(crossRead == bySpark)
  }

  test("DSv2 writes stage under dot-files; stale staging is invisible/swept") {
    import graft.sources.GraftParquetFormat
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    // a truncated leftover from a crashed attempt: readers must skip it
    // instead of failing the whole table on a missing PAR1 trailer
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/.part-zombie.parquet.inprogress"),
      Array[Byte](1, 2, 3))
    (1L to 100L).toDF("x").repartition(4)
      .write.format(GraftParquetFormat.Name).mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(!files.exists(_.endsWith(".inprogress")),
      s"staging leftovers survived the commit sweep: ${files.mkString(",")}")
    assert(files.count(_.endsWith(".parquet")) == 4)
    assert(spark.read.format(GraftParquetFormat.Name).load(dir)
      .agg(org.apache.spark.sql.functions.sum("x")).as[Long].head() == 5050L)
  }
}
