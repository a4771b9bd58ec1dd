package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

import graft.core._

/** One encoded column chunk, the engine's unit of storage.
  * `(partId, chunkIdx)` identifies a row range; every column of that range
  * appears as one ChunkRow, so rows re-assemble by zipping columns. */
final case class ChunkRow(
    partId: Int,
    chunkIdx: Int,
    colIdx: Int,
    column: String,
    physicalType: Int,
    codec: String,
    numValues: Long,
    numNulls: Long,
    rawBytes: Long,
    encodedBytes: Long,
    refPolicyBytes: Long,
    dictEntries: Int,
    /** min/max statistics over the chunk's non-null values, PLAIN-encoded
      * without length prefix (the reference's Statistics byte convention,
      * `/root/reference/src/file/statistics.rs:116-119`); byte values are
      * truncated to 64 bytes (min stays a valid lower bound, max is padded
      * 0xFF so it stays an upper bound). Empty arrays when numValues ==
      * numNulls. Drives metadata-level chunk pruning in
      * [[DecodeJob.decodeWhere]]. */
    minStat: Array[Byte],
    maxStat: Array[Byte],
    sha256: String,
    blob: Array[Byte])

/** Per-(partition, column) lineage row — the north rule's resumability and
  * metrics record (partition id, codec chosen, input/output bytes, sha256
  * manifest). */
final case class LineageRow(
    partId: Int,
    column: String,
    codecs: String,
    numChunks: Long,
    numValues: Long,
    inputBytes: Long,
    outputBytes: Long,
    refPolicyBytes: Long,
    sha256Manifest: String)

/** Encodes ANY flat-schema DataFrame into per-column compressed chunks.
  *
  * Spark-first design: the input stays a Dataset end to end; the only
  * shuffle is one explicit `repartition` on user-chosen keys plus a salt
  * (defusing mega-repo skew per the north rule), after which all codec work
  * is per-partition CPU with NO further exchange. Chunk contents are a pure
  * function of (input, partitionCount) — independent of executor count —
  * so manifests are reproducible at any parallelism (the scaling-law
  * evidence relies on this).
  */
object EncodeJob {

  val DefaultChunkRows = 16384
  val DefaultChunkRawBytes: Long = 32L * 1024 * 1024

  /** Map a Spark type to our physical type + extractor into column buffers.
    * LIST columns report their ELEMENT physical type (the chunk blob
    * self-describes arrayness via its version byte). */
  private def physicalTypeOf(dt: DataType): Int = dt match {
    case BooleanType => PhysicalType.Bool
    case IntegerType | DateType => PhysicalType.Int32
    case LongType | TimestampType | TimestampNTZType => PhysicalType.Int64
    case FloatType => PhysicalType.Float
    case DoubleType => PhysicalType.Double
    case StringType | BinaryType => PhysicalType.Bytes
    // unscaled INT64 for precision <= 18, the reference's INT64 DECIMAL
    // representation (`/root/reference/src/schema/types.rs:312-343`)
    case dt: DecimalType if dt.precision <= 18 => PhysicalType.Int64
    // wider decimals: two's-complement big-endian unscaled FLBA bytes
    case _: DecimalType => PhysicalType.Bytes
    // container leaves carry ElemBuf's type contract (single-level
    // nesting, primitive/string leaves) — validate it here so an
    // unsupported element type fails on the driver, not mid-task inside
    // ElemBuf on an executor
    case ArrayType(et, _) => physicalTypeOf(elemLeaf(et, "LIST element"))
    // a MAP chunk self-describes both leaf types; the manifest column
    // carries the key's (the prunable side)
    case MapType(kt, vt, _) =>
      elemLeaf(vt, "MAP value")
      physicalTypeOf(elemLeaf(kt, "MAP key"))
    case other => throw new IllegalArgumentException(
      s"unsupported column type $other (flat + LIST/MAP schemas only)")
  }

  /** The leaf types ElemBuf can buffer (LIST elements, MAP keys/values). */
  private def elemLeaf(dt: DataType, what: String): DataType = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         StringType | BinaryType => dt
    case other => throw new IllegalArgumentException(
      s"unsupported $what type $other (primitive/string leaves only)")
  }

  /** Salted repartition + deterministic in-partition sort, then
    * per-partition chunked encode of every column.
    *
    * @param partitionKeys shuffle keys (e.g. repo, lang); a salt derived
    *   from the remaining columns is always appended so one hot key spreads
    *   over `saltBuckets` partitions instead of one.
    */
  def encode(df: DataFrame, numPartitions: Int, partitionKeys: Seq[String],
      sortKeys: Seq[String], saltBuckets: Int = 16,
      chunkRows: Int = DefaultChunkRows,
      chunkRawBytes: Long = DefaultChunkRawBytes,
      skipPartitions: Set[Int] = Set.empty,
      forcedCodecs: Map[String, Int] = Map.empty,
      blockCodec: Int = BlockCodec.None): Dataset[ChunkRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    // fail fast on the driver for schemas the CHUNK pipeline doesn't
    // cover (e.g. STRUCT — supported by the parquet FILE writer only):
    // otherwise ColBuilder.apply accepts the column and the task crashes
    // mid-encode on an executor with an opaque builder error
    schema.fields.foreach(f => physicalTypeOf(f.dataType))
    // Spark forbids hashing MAP columns (same map, different hashcode), so
    // the salt derives from every hashable column; a row's map values still
    // land with it.
    val saltCols = schema.fields.filter(f =>
      !f.dataType.isInstanceOf[MapType]).map(_.name).toSeq
    val saltExpr =
      if (saltCols.isEmpty) pmod(spark_partition_id().cast("long"), lit(saltBuckets))
      else pmod(xxhash64(saltCols.map(col): _*), lit(saltBuckets))
    val salt = saltExpr.as("__salt")
    // Resume pruning BEFORE the exchange: `repartition(n, exprs)` routes a
    // row to pmod(murmur3(exprs, seed 42), n) — the same hash chain
    // `functions.hash` computes — so a row's target partition is knowable
    // at the scan. Filtering there means rows bound for already-completed
    // partitions never enter the shuffle (nor the per-partition sort): a
    // 95%-done resume shuffles ~5% of the input instead of 100%. (The
    // mapPartitions-level skip below still guards the numPartitions <= 0
    // and MAP-salt cases, where the target isn't expressible pre-shuffle.)
    val preFiltered =
      if (skipPartitions.isEmpty || numPartitions <= 0 || saltCols.isEmpty) df
      else {
        val exprs = if (partitionKeys.isEmpty) Seq(saltExpr)
          else partitionKeys.map(col) :+ saltExpr
        val tgt = pmod(hash(exprs: _*), lit(numPartitions))
        // emit whichever literal set is smaller: `pending` on a mostly-done
        // resume, `skip` on a mostly-fresh one
        val pending = (0 until numPartitions).filterNot(skipPartitions)
        if (pending.isEmpty) df.where(lit(false))
        else if (pending.size <= skipPartitions.size) df.where(tgt.isin(pending: _*))
        else df.where(!tgt.isin(skipPartitions.toSeq: _*))
      }
    // numPartitions <= 0 keeps the caller's partitioning (e.g. a
    // repartitionByRange whose clustering makes min/max chunk stats tight)
    val keyed =
      if (numPartitions <= 0) preFiltered
      else if (partitionKeys.isEmpty) preFiltered.repartition(numPartitions, salt)
      else preFiltered.repartition(numPartitions, (partitionKeys.map(col) :+ salt): _*)
    val sorted =
      if (sortKeys.isEmpty) keyed
      else keyed.sortWithinPartitions(sortKeys.map(col): _*)
    val skip = spark.sparkContext.broadcast(skipPartitions)
    // The terminal operator consumes CATALYST rows (queryExecution.toRdd):
    // string columns are read as UTF8String views and copied once straight
    // into the column arenas — no per-row external Row materialization, no
    // per-field boxing, no intermediate byte-array per string. Measured at
    // local[1] the external-Row deserialization was ~20% of total encode
    // wall time.
    val chunkRdd = sorted.queryExecution.toRdd.mapPartitions { rows =>
      val partId = TaskContext.getPartitionId()
      if (skip.value.contains(partId)) Iterator.empty
      else encodePartition(partId, schema, rows, chunkRows, chunkRawBytes,
        forcedCodecs, blockCodec)
    }
    spark.createDataset(chunkRdd)
  }

  /** Pure per-partition encode: buffer up to chunkRows/chunkRawBytes rows,
    * then run the codec auto-selector per column. Typed per-column builders
    * keep the buffering boxing-free (primitive arrays end to end).
    *
    * LAZY: returns an iterator that cuts and yields one chunk's ChunkRows at
    * a time, so task memory is O(one chunk), not O(partition encoded bytes)
    * — a partition far larger than executor memory streams straight through
    * (round-1 review flagged the previous whole-partition ArrayBuffer as the
    * first OOM at 100x). Chunk cut points are unchanged: a chunk closes the
    * first time the post-add row/byte condition trips, so manifests stay
    * byte-identical to the eager version. */
  def encodePartition(partId: Int, schema: StructType,
      rows: Iterator[InternalRow],
      chunkRows: Int, chunkRawBytes: Long,
      forcedCodecs: Map[String, Int] = Map.empty,
      blockCodec: Int = BlockCodec.None): Iterator[ChunkRow] = {
    val fields = schema.fields
    val nCols = fields.length
    val builders: Array[ColBuilder] = fields.map(f => ColBuilder(f.dataType))

    new Iterator[ChunkRow] {
      private var chunkIdx = 0
      private var pending: Array[ChunkRow] = null
      private var pendingPos = 0

      /** Pull rows until this chunk is full (or input ends), then encode
        * every column. The zero-copy BytesVec arena invariant holds: each
        * vec is FULLY consumed (encode + stats + hash) inside this call,
        * before any further builder.add() can overwrite arena bytes. */
      private def fillChunk(): Unit = {
        var bufferedRaw = 0L
        var buffered = 0
        while (rows.hasNext && buffered < chunkRows && bufferedRaw < chunkRawBytes) {
          val row = rows.next()
          var c = 0
          while (c < nCols) {
            bufferedRaw += builders(c).add(row, c)
            c += 1
          }
          buffered += 1
        }
        if (buffered == 0) { pending = null; return }
        val out = new Array[ChunkRow](nCols)
        var c = 0
        while (c < nCols) {
          val nRows = builders(c).rowCount
          val nNulls = builders(c).numNulls
          // (vec, levels for the hash, encoded chunk) per column kind
          val (vec, hashHex, chunk) = builders(c) match {
            case ab: ColBuilder.ArrayBuilder =>
              val (elems, rep, defsArr) = ab.buildArray()
              ab.clear()
              // hash identity = rep stream + def stream + element values
              val levelId = new Array[Byte](rep.length * 2)
              System.arraycopy(rep, 0, levelId, 0, rep.length)
              System.arraycopy(defsArr, 0, levelId, rep.length, defsArr.length)
              val forced = forcedCodecs.getOrElse(fields(c).name, -1)
              (elems, ColVecHash.sha256Hex(elems, levelId),
                ChunkCodec.encodeArrayChunk(elems, rep, defsArr, nRows, forced))
            case mb: ColBuilder.MapBuilder =>
              val (keys, vals, rep, defsArr) = mb.buildMap()
              mb.clear()
              // hash identity = rep + def streams + keys + values
              val levelId = new Array[Byte](rep.length * 2)
              System.arraycopy(rep, 0, levelId, 0, rep.length)
              System.arraycopy(defsArr, 0, levelId, rep.length, defsArr.length)
              (keys, ColVecHash.sha256HexPair(keys, vals, levelId),
                ChunkCodec.encodeMapChunk(keys, vals, rep, defsArr, nRows))
            case b =>
              val v = b.build()
              val levels = b.defLevels
              b.clear()
              val ch = forcedCodecs.get(fields(c).name) match {
                case Some(codec) =>
                  val blob = ChunkCodec.encodeWith(v, codec, levels)
                  EncodedChunk(blob, codec, v.length, v.rawSize,
                    blob.length.toLong, blob.length.toLong, 0)
                case None => ChunkCodec.encodeAuto(v, defLevels = levels)
              }
              (v, ColVecHash.sha256Hex(v, levels), ch)
          }
          // optional general-purpose block compression on top of the chunk
          // encoding (reference compression.rs); kept only when it shrinks,
          // so the <= reference-policy ceiling is never violated
          val blob =
            if (blockCodec == BlockCodec.None) chunk.blob
            else {
              val wrapped = BlockCodec.wrap(chunk.blob, blockCodec)
              if (wrapped.length < chunk.blob.length) wrapped else chunk.blob
            }
          val (mnStat, mxStat) = MinMax.compute(vec)
          out(c) = ChunkRow(partId, chunkIdx, c, fields(c).name, vec.physicalType,
            chunk.codecName, nRows.toLong, nNulls.toLong, chunk.rawSize,
            blob.length.toLong, chunk.refPolicySize, chunk.dictEntries,
            mnStat, mxStat, hashHex, blob)
          c += 1
        }
        chunkIdx += 1
        pending = out
        pendingPos = 0
      }

      private var released = false
      /** Safe only once every emitted ChunkRow is self-contained (blobs are
        * fresh arrays; the zero-copy vecs are fully consumed inside
        * fillChunk), i.e. at terminal exhaustion. */
      private def releaseBuilders(): Unit = if (!released) {
        released = true
        builders.foreach(_.release())
      }

      def hasNext: Boolean = {
        if (pending != null && pendingPos < pending.length) true
        else {
          pending = null
          if (!rows.hasNext) { releaseBuilders(); false }
          else {
            fillChunk()
            if (pending == null) { releaseBuilders(); false } else true
          }
        }
      }

      def next(): ChunkRow = {
        if (!hasNext) throw new NoSuchElementException("encodePartition")
        val r = pending(pendingPos)
        pendingPos += 1
        r
      }
    }
  }

  /** Per-(partition, column) lineage with a deterministic sha256 manifest
    * (chunk hashes concatenated in chunk order). Pure DataFrame aggregation
    * — map-side combinable, one shuffle on (partId, column). */
  def lineage(chunks: Dataset[ChunkRow]): Dataset[LineageRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .groupBy($"partId", $"column")
      .agg(
        concat_ws("+", array_sort(collect_set($"codec"))).as("codecs"),
        count(lit(1)).as("numChunks"),
        sum($"numValues").as("numValues"),
        sum($"rawBytes").as("inputBytes"),
        sum($"encodedBytes").as("outputBytes"),
        sum($"refPolicyBytes").as("refPolicyBytes"),
        sha2(concat_ws(",",
          transform(array_sort(collect_list(struct($"chunkIdx", $"sha256"))),
            x => x.getField("sha256"))), 256).as("sha256Manifest"))
      .as[LineageRow]
  }

  /** Checkpoint-resumable encode: chunks + lineage land under `outDir`; a
    * re-run after partial failure reads the lineage table and skips
    * partitions whose every column already has a manifest.
    *
    * Every completed TASK is a durable checkpoint: each task streams its
    * partition's ChunkRows into `chunks/part-<partId>.parquet` through the
    * engine's own parquet writer (staged under a dot-prefixed
    * attempt-unique name, atomically renamed on completion), then commits
    * `lineage/part-<partId>.parquet` — a per-partition sidecar with the
    * same rows [[lineage]] computes. Spark's output committer only
    * publishes a job's files at job END, so routing this through
    * `DataFrame.write` would lose the WHOLE run to a mid-run driver kill;
    * with per-task commits a kill loses only the tasks in flight, and the
    * next invocation — via the pre-shuffle target-partition filter in
    * [[encode]] — re-shuffles only the missing partitions' rows.
    * Deterministic file names + atomic REPLACE rename make retries and
    * crash-between-renames idempotent (a partition with a chunk file but
    * no lineage sidecar re-encodes in place, never duplicates). */
  def encodeResumable(df: DataFrame, outDir: String, numPartitions: Int,
      partitionKeys: Seq[String], sortKeys: Seq[String],
      blockCodec: Int = BlockCodec.None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val nCols = df.schema.fields.length
    val io = graft.sources.GraftIO.forPath(outDir)
    io.mkdirs(s"$outDir/chunks")
    io.mkdirs(s"$outDir/lineage")
    // sweep staging orphans from killed attempts (dot-prefixed, invisible
    // to scans but real disk): this run's tasks stage under fresh attempt
    // ids, so anything .inprogress now is dead. outDir itself is included
    // because the routing marker stages `._encode_meta.inprogress` there —
    // a crash between its create and rename would otherwise orphan it
    Seq(outDir, s"$outDir/chunks", s"$outDir/lineage").foreach { d =>
      io.list(d).foreach { e =>
        if (e.name.startsWith(".") && e.name.endsWith(".inprogress"))
          io.delete(s"$d/${e.name}")
      }
    }
    // fail fast on a checkpoint dir from the pre-task-durable layout
    // (Hive `partId=N/` subdirectories): mixing flat task-committed files
    // into it would break partition discovery and double-count lineage
    require(!io.list(s"$outDir/chunks").exists(e =>
        e.isDir && e.name.startsWith("partId=")),
      s"$outDir/chunks uses the legacy partId=N layout — re-encode into " +
        "a fresh directory (task-durable resume writes flat part files)")
    // the resume contract is "same job, same routing": a different
    // numPartitions (or partition/sort keys) re-routes every row, so
    // partIds completed under the OLD layout would silently mask NEW-layout
    // partitions (e.g. a 1024-partition checkpoint resumed at 1005 looks
    // 100% complete and skips everything). Pin the routing config in a
    // marker file on first run; refuse a mismatched resume.
    val metaPath = s"$outDir/_encode_meta"
    val metaNow = routingMeta(numPartitions, partitionKeys, sortKeys,
      blockCodec, df.schema.fieldNames.toSeq)
    if (io.status(metaPath).isDefined) {
      val prev = new String(io.readAll(metaPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      require(prev == metaNow,
        s"resume config mismatch for $outDir\n  checkpoint: $prev\n" +
          s"  this run:   $metaNow\nRe-run with the checkpoint's settings," +
          " or encode into a fresh outDir")
    } else {
      // no marker + existing lineage = a checkpoint from before routing
      // markers existed (or a hand-pruned dir). Proceeding would PIN this
      // run's config as the checkpoint's truth with no way to know it
      // matches — the silent-mask bug with extra steps — so refuse and
      // tell the user how to assert the original settings themselves.
      require(!io.list(s"$outDir/lineage").exists(e =>
          !e.isDir && e.name.startsWith("part-") && e.name.endsWith(".parquet")),
        s"$outDir has lineage rows but no _encode_meta routing marker " +
          "(checkpoint predates the marker, or it was deleted). If this " +
          s"run's settings match the original encode, create the marker " +
          s"yourself:\n  echo '$metaNow' > $metaPath\nOtherwise encode " +
          "into a fresh outDir")
      writeRoutingMarker(outDir, metaNow)
    }
    val done: Set[Int] = lineageReadOrEmpty(io, outDir) {
      spark.read.parquet(s"$outDir/lineage")
        .groupBy($"partId").agg(countDistinct($"column").as("n"))
        .where($"n" === nCols)
        .select($"partId").as[Int].collect().toSet
    }
    val chunks = encode(df, numPartitions, partitionKeys, sortKeys,
      skipPartitions = done, blockCodec = blockCodec)
    val chunkSchema = Encoders.product[ChunkRow].schema
    val lineageSchema = Encoders.product[LineageRow].schema
    chunks.foreachPartition { (it: Iterator[ChunkRow]) =>
      if (it.hasNext) writeTaskCheckpoint(outDir, chunkSchema, lineageSchema, it)
    }
    // the job completed, so any partition still without a sidecar received
    // zero rows (hash gaps — e.g. few distinct (keys, salt) combinations).
    // Mark them done with numChunks=0 rows, otherwise they stay pending
    // forever and every no-op rerun re-scans the input instead of hitting
    // the where(lit(false)) fast path.
    if (numPartitions > 0) {
      // covered partIds come from lineage CONTENT, not filenames: a dir
      // whose lineage was written by the non-resumable path carries
      // Spark-committer names (part-00000-<uuid>....parquet) that a
      // filename parse would crash on, and any valid sidecar regardless
      // of name means the partition is accounted for
      val have: Set[Int] = lineageReadOrEmpty(io, outDir) {
        spark.read.parquet(s"$outDir/lineage")
          .select($"partId").distinct().as[Int].collect().toSet
      }
      val columns = df.schema.fieldNames
      (0 until numPartitions).filterNot(have).foreach { pid =>
        val lstage = f"$outDir/lineage/.part-$pid%05d.parquet.driver.inprogress"
        val lpath = f"$outDir/lineage/part-$pid%05d.parquet"
        val lw = new graft.sources.ParquetFileWriter.IncrementalFileWriter(
          lstage, lineageSchema, codec = graft.sources.PqCodec.Zstd)
        columns.foreach { c =>
          lw.addRow(org.apache.spark.sql.Row(pid, c, "", 0L, 0L, 0L, 0L, 0L, ""))
        }
        lw.close()
        io.rename(lstage, lpath)
      }
    }
  }

  /** Run a lineage-checkpoint read, treating a failure as "no coverage"
    * ONLY when a directory listing confirms no lineage data file exists.
    * Both callers act destructively on an empty answer — `done = empty`
    * re-encodes everything, and the gap-marker pass REPLACE_EXISTING-renames
    * zero-row sidecars over every partition it believes uncovered — so a
    * TRANSIENT read failure with real sidecars on disk must propagate, not
    * silently erase the checkpoint's manifest metadata. */
  private def lineageReadOrEmpty(io: graft.sources.GraftIO, outDir: String)(
      read: => Set[Int]): Set[Int] =
    try read
    catch {
      case scala.util.control.NonFatal(e) =>
        val hasData = io.list(s"$outDir/lineage").exists(en =>
          !en.isDir && !en.name.startsWith(".") && !en.name.startsWith("_"))
        if (hasData) throw e
        Set.empty
    }

  /** Canonical routing-config line pinned in a checkpoint's `_encode_meta`
    * marker. The column set is included because the salt hashes every
    * non-map column — a different projection re-routes rows too. */
  private[graft] def routingMeta(numPartitions: Int,
      partitionKeys: Seq[String], sortKeys: Seq[String], blockCodec: Int,
      columns: Seq[String]): String =
    s"v1 numPartitions=$numPartitions" +
      s" partitionKeys=${partitionKeys.mkString(",")}" +
      s" sortKeys=${sortKeys.mkString(",")} blockCodec=$blockCodec" +
      s" columns=${columns.mkString(",")}"

  /** Write (or overwrite) a checkpoint's routing marker via the same
    * stage-and-rename protocol as every other commit in this file: a crash
    * mid-write must not leave a truncated marker that blocks all future
    * resumes of an otherwise healthy checkpoint. */
  private[graft] def writeRoutingMarker(outDir: String, meta: String): Unit = {
    val io = graft.sources.GraftIO.forPath(outDir)
    val stage = s"$outDir/._encode_meta.inprogress"
    val out = io.create(stage)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    io.rename(stage, s"$outDir/_encode_meta")
  }

  /** One task's durable checkpoint: stream the partition's chunks into a
    * deterministic-named parquet file, then commit its lineage sidecar.
    * Both are staged under attempt-unique dot names (invisible to scans,
    * safe under speculative duplicate attempts) and atomically renamed —
    * the sidecar LAST, so a lineage row never exists without its data. */
  private def writeTaskCheckpoint(outDir: String, chunkSchema: StructType,
      lineageSchema: StructType, it: Iterator[ChunkRow]): Unit = {
    import graft.sources.{GraftIO, ParquetFileWriter}
    val first = it.next()
    val pid = first.partId
    val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
    val io = GraftIO.forPath(outDir)
    val path = f"$outDir/chunks/part-$pid%05d.parquet"
    val stage = f"$outDir/chunks/.part-$pid%05d.parquet.$attempt.inprogress"
    // zstd-1 pages: 23% smaller than snappy on chunk blobs (the
    // lightweight encodings leave entropy slack) at equal write speed,
    // measured warm at local[32] on the 21 GB table
    val w = new ParquetFileWriter.IncrementalFileWriter(stage, chunkSchema,
      codec = graft.sources.PqCodec.Zstd)
    // per-column lineage accumulation, mirroring lineage()'s aggregation
    final class Acc {
      val codecs = scala.collection.mutable.Set.empty[String]
      val shas = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      var numValues = 0L; var inputBytes = 0L
      var outputBytes = 0L; var refPolicyBytes = 0L
    }
    val accs = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
    var c = first
    var more = true
    while (more) {
      w.addRow(org.apache.spark.sql.Row(c.partId, c.chunkIdx, c.colIdx,
        c.column, c.physicalType, c.codec, c.numValues, c.numNulls,
        c.rawBytes, c.encodedBytes, c.refPolicyBytes, c.dictEntries,
        c.minStat, c.maxStat, c.sha256, c.blob))
      val a = accs.getOrElseUpdate(c.column, new Acc)
      a.codecs += c.codec
      a.shas += ((c.chunkIdx, c.sha256))
      a.numValues += c.numValues
      a.inputBytes += c.rawBytes
      a.outputBytes += c.encodedBytes
      a.refPolicyBytes += c.refPolicyBytes
      if (it.hasNext) c = it.next() else more = false
    }
    w.close()
    io.rename(stage, path)
    // sidecar rows must be byte-equal to lineage()'s: codecs = sorted
    // distinct joined '+', manifest = sha256 hex of the chunk sha256 hex
    // strings joined ',' in chunkIdx order
    val lstage = f"$outDir/lineage/.part-$pid%05d.parquet.$attempt.inprogress"
    val lpath = f"$outDir/lineage/part-$pid%05d.parquet"
    val lw = new ParquetFileWriter.IncrementalFileWriter(lstage, lineageSchema,
      codec = graft.sources.PqCodec.Zstd)
    accs.foreach { case (column, a) =>
      val manifest = {
        val joined = a.shas.sortBy(_._1).map(_._2).mkString(",")
        BitUtil.hexLower(java.security.MessageDigest.getInstance("SHA-256")
          .digest(joined.getBytes("UTF-8")))
      }
      lw.addRow(org.apache.spark.sql.Row(pid, column,
        a.codecs.toSeq.sorted.mkString("+"), a.shas.length.toLong,
        a.numValues, a.inputBytes, a.outputBytes, a.refPolicyBytes, manifest))
    }
    lw.close()
    io.rename(lstage, lpath)
  }
}

/** Boxing-free per-column row buffer: `add` pulls the typed value straight
  * off the CATALYST row (InternalRow / ArrayData — anything implementing
  * SpecializedGetters) into a primitive array; string bytes copy once from
  * the row buffer into the column arena. Consuming internal rows avoids the
  * per-row external-Row materialization entirely (no boxed fields, no
  * UTF8String -> String -> bytes round trip). Values are fully copied out
  * inside `add`, so the caller may reuse the row instance (UnsafeRow
  * iterators do). Returns the raw-size delta used for chunk-cut accounting.
  * Nulls are tracked as definition levels (0 = null, 1 = present); the
  * value buffer holds only non-null values, mirroring Parquet page
  * semantics. */
sealed abstract class ColBuilder {
  private var levels = new Array[Byte](1024)
  private var nRows = 0
  private var nNulls = 0

  // overridable (not final): ArrayBuilder replaces the whole row protocol
  // with slot-level rep/def tracking
  def add(row: SpecializedGetters, i: Int): Long = {
    if (nRows == levels.length) levels = java.util.Arrays.copyOf(levels, nRows << 1)
    if (row.isNullAt(i)) {
      levels(nRows) = 0; nRows += 1; nNulls += 1
      0L
    } else {
      levels(nRows) = 1; nRows += 1
      addValue(row, i)
    }
  }

  /** Number of buffered rows (incl. nulls). */
  def rowCount: Int = nRows
  def numNulls: Int = nNulls
  /** One 0/1 byte per row, or null when the buffer has no nulls. */
  def defLevels: Array[Byte] =
    if (nNulls == 0) null else java.util.Arrays.copyOf(levels, nRows)

  def clear(): Unit = { nRows = 0; nNulls = 0; clearValues() }

  /** Return any pooled backing arrays to the per-thread pool; the builder
    * must not be used afterwards. Called once per builder when its
    * partition's rows are exhausted. Default: nothing pooled. */
  def release(): Unit = ()

  protected def addValue(row: SpecializedGetters, i: Int): Long
  protected def clearValues(): Unit
  def build(): ColVec
}

object ColBuilder {
  /** Per-thread FIFO pool of byte arenas. Builders are created (schema
    * order) and released (same order) once per PARTITION, while chunk-sized
    * arenas take growth-doubling copies totaling ~2x their final size to
    * warm up — unamortized when a partition holds only a few chunks. Tasks
    * run sequentially per thread, so FIFO pairing hands column c the arena
    * column c released in the previous partition: the second partition
    * onward starts full-sized with zero growth copies. Bounded: at most
    * [[MaxPooled]] arenas of at most [[ArenaRetainLimit]] bytes per thread. */
  private val ArenaRetainLimit = 48 << 20
  private val MaxPooledBytes = 96L << 20 // per-thread cap on TOTAL pooled bytes
  private final class ArenaQueue {
    val dq = new java.util.ArrayDeque[Array[Byte]]()
    var bytes = 0L
  }
  private val arenaPool: ThreadLocal[ArenaQueue] =
    ThreadLocal.withInitial(() => new ArenaQueue)

  private[operators] def borrowArena(min: Int): Array[Byte] = {
    val q = arenaPool.get()
    val a = q.dq.pollFirst()
    if (a != null) q.bytes -= a.length
    if (a != null && a.length >= min) a else new Array[Byte](min)
  }

  private[operators] def giveArena(a: Array[Byte]): Unit = {
    val q = arenaPool.get()
    if (a != null && a.length <= ArenaRetainLimit &&
        q.bytes + a.length <= MaxPooledBytes) {
      q.dq.addLast(a)
      q.bytes += a.length
    }
  }
  /** Minimal FIXED_LEN_BYTE_ARRAY width for a DECIMAL(p): smallest n with
    * 10^p - 1 representable in signed 8n-bit two's complement (public
    * parquet logical-types rule). */
  def decimalFlbaLen(precision: Int): Int =
    (java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE).bitLength + 1 + 7) / 8

  /** Big-endian two's-complement, sign-extended to exactly `len` bytes. */
  def decimalToFlba(unscaled: java.math.BigInteger, len: Int): Array[Byte] = {
    val raw = unscaled.toByteArray
    require(raw.length <= len, s"decimal overflows FLBA($len)")
    if (raw.length == len) raw
    else {
      val out = new Array[Byte](len)
      if (unscaled.signum < 0) java.util.Arrays.fill(out, 0, len - raw.length,
        0xFF.toByte)
      System.arraycopy(raw, 0, out, len - raw.length, raw.length)
      out
    }
  }

  def apply(dt: DataType): ColBuilder = dt match {
    // null conv = direct UTF8String arena copy (one copy, no intermediate
    // per-string array)
    case StringType => new BytesBuilder(null)
    case BinaryType => new BytesBuilder((r, i) => r.getBinary(i))
    // catalyst already stores DATE as epoch days and TIMESTAMP[_NTZ] as
    // epoch/local micros — exactly our physical representation
    case IntegerType | DateType => new IntBuilder(null)
    case LongType | TimestampType | TimestampNTZType => new LongBuilder(null)
    case FloatType => new FloatBuilder
    case DoubleType => new DoubleBuilder
    case BooleanType => new BoolBuilder
    case dt: DecimalType if dt.precision <= 18 => new LongBuilder((r, i) =>
      r.getDecimal(i, dt.precision, dt.scale).toUnscaledLong)
    case dt: DecimalType => { // p > 18: FIXED_LEN_BYTE_ARRAY path
      val len = decimalFlbaLen(dt.precision)
      new BytesBuilder((r, i) => decimalToFlba(
        r.getDecimal(i, dt.precision, dt.scale)
          .toJavaBigDecimal.unscaledValue(), len))
    }
    case ArrayType(et, _) => new ArrayBuilder(et)
    case MapType(kt, vt, _) => new MapBuilder(kt, vt)
    case st: StructType => new StructBuilder(st)
    case other => throw new IllegalArgumentException(
      s"unsupported column type $other (flat + LIST/MAP/STRUCT schemas only)")
  }

  /** LIST column buffer: shreds each array row into per-slot rep/def levels
    * (rep 0 = first slot of the row, 1 = continuation; def 0 = null array,
    * 1 = empty array, 2 = null element, 3 = element) and appends non-null
    * element VALUES to a typed element buffer — the write direction of the
    * reference's record shredding (`/root/reference/src/record/`). */
  final class ArrayBuilder(elemDt: DataType) extends ColBuilder {
    private var rep = new Array[Byte](1024)
    private var defs = new Array[Byte](1024)
    private var nSlots = 0
    private var nR = 0
    private var nN = 0
    private val elems = ElemBuf(elemDt)

    private def slot(r: Byte, d: Byte): Unit = {
      if (nSlots == rep.length) {
        rep = java.util.Arrays.copyOf(rep, nSlots << 1)
        defs = java.util.Arrays.copyOf(defs, nSlots << 1)
      }
      rep(nSlots) = r; defs(nSlots) = d; nSlots += 1
    }

    override def add(row: SpecializedGetters, i: Int): Long = {
      nR += 1
      if (row.isNullAt(i)) { nN += 1; slot(0, 0); 4L }
      else {
        val arr = row.getArray(i)
        val m = arr.numElements()
        if (m == 0) { slot(0, 1); 4L }
        else {
          var delta = 4L
          var j = 0
          while (j < m) {
            val r: Byte = if (j == 0) 0 else 1
            if (arr.isNullAt(j)) slot(r, 2)
            else { slot(r, 3); delta += elems.append(arr, j) }
            j += 1
          }
          delta
        }
      }
    }

    override def rowCount: Int = nR
    override def numNulls: Int = nN
    override def defLevels: Array[Byte] =
      throw new UnsupportedOperationException("use buildArray for LIST columns")
    override def clear(): Unit = { nSlots = 0; nR = 0; nN = 0; elems.clear() }

    def buildArray(): (ColVec, Array[Byte], Array[Byte]) =
      (elems.build(), java.util.Arrays.copyOf(rep, nSlots),
        java.util.Arrays.copyOf(defs, nSlots))

    protected def addValue(row: SpecializedGetters, i: Int): Long =
      throw new UnsupportedOperationException
    protected def clearValues(): Unit = ()
    def build(): ColVec = throw new UnsupportedOperationException(
      "use buildArray for LIST columns")
  }

  /** MAP column buffer: shreds each map row into per-entry rep/def levels
    * (rep 0 = first entry of the row, 1 = continuation; def 0 = null map,
    * 1 = empty map, 2 = entry with null value, 3 = entry with value) and
    * appends keys (every entry) / non-null values to typed buffers — the
    * repeated key_value group of the reference's MAP shredding
    * (`/root/reference/src/record/`). Entry order is whatever the incoming
    * Map iterates; MAP semantics are unordered, and the roundtrip contract
    * is key-set + per-key-value equality, not entry order. */
  final class MapBuilder(keyDt: DataType, valDt: DataType) extends ColBuilder {
    private var rep = new Array[Byte](1024)
    private var defs = new Array[Byte](1024)
    private var nSlots = 0
    private var nR = 0
    private var nN = 0
    private val keys = ElemBuf(keyDt)
    private val vals = ElemBuf(valDt)

    private def slot(r: Byte, d: Byte): Unit = {
      if (nSlots == rep.length) {
        rep = java.util.Arrays.copyOf(rep, nSlots << 1)
        defs = java.util.Arrays.copyOf(defs, nSlots << 1)
      }
      rep(nSlots) = r; defs(nSlots) = d; nSlots += 1
    }

    override def add(row: SpecializedGetters, i: Int): Long = {
      nR += 1
      if (row.isNullAt(i)) { nN += 1; slot(0, 0); 4L }
      else {
        val m = row.getMap(i)
        val sz = m.numElements()
        if (sz == 0) { slot(0, 1); 4L }
        else {
          val ka = m.keyArray()
          val va = m.valueArray()
          var delta = 4L
          var j = 0
          while (j < sz) {
            val r: Byte = if (j == 0) 0 else 1
            delta += keys.append(ka, j)
            if (va.isNullAt(j)) slot(r, 2)
            else { slot(r, 3); delta += vals.append(va, j) }
            j += 1
          }
          delta
        }
      }
    }

    override def rowCount: Int = nR
    override def numNulls: Int = nN
    override def defLevels: Array[Byte] =
      throw new UnsupportedOperationException("use buildMap for MAP columns")
    override def clear(): Unit = { nSlots = 0; nR = 0; nN = 0; keys.clear(); vals.clear() }

    def buildMap(): (ColVec, ColVec, Array[Byte], Array[Byte]) =
      (keys.build(), vals.build(), java.util.Arrays.copyOf(rep, nSlots),
        java.util.Arrays.copyOf(defs, nSlots))

    protected def addValue(row: SpecializedGetters, i: Int): Long =
      throw new UnsupportedOperationException
    protected def clearValues(): Unit = ()
    def build(): ColVec = throw new UnsupportedOperationException(
      "use buildMap for MAP columns")
  }

  /** STRUCT column buffer: a non-repeated nested group. Every subfield
    * becomes its own leaf chunk with max def level 2 (optional group +
    * optional field): per-row def 0 = struct null, 1 = field null,
    * 2 = present — the write direction of the reference's group shredding
    * for flat groups (`/root/reference/src/record/`, no rep levels needed
    * because nothing repeats). Subfields are restricted to the ElemBuf
    * primitive types (int/long/float/double/bool/string/binary). */
  final class StructBuilder(val st: StructType) extends ColBuilder {
    private val n = st.fields.length
    private val bufs: Array[ElemBuf] = st.fields.map(f => ElemBuf(f.dataType))
    private var defs: Array[Array[Byte]] = Array.fill(n)(new Array[Byte](1024))
    private var nR = 0
    private var nN = 0

    override def add(row: SpecializedGetters, i: Int): Long = {
      if (nR == defs(0).length) {
        var j = 0
        while (j < this.n) {
          defs(j) = java.util.Arrays.copyOf(defs(j), nR << 1); j += 1
        }
      }
      nR += 1
      if (row.isNullAt(i)) {
        nN += 1
        var j = 0
        while (j < this.n) { defs(j)(nR - 1) = 0; j += 1 }
        n.toLong
      } else {
        val inner = row.getStruct(i, this.n)
        var delta = 0L
        var j = 0
        while (j < this.n) {
          if (inner.isNullAt(j)) defs(j)(nR - 1) = 1
          else { defs(j)(nR - 1) = 2; delta += bufs(j).append(inner, j) }
          j += 1
        }
        delta + n
      }
    }

    override def rowCount: Int = nR
    override def numNulls: Int = nN
    override def defLevels: Array[Byte] =
      throw new UnsupportedOperationException("use buildStruct for STRUCT columns")
    override def clear(): Unit = {
      nR = 0; nN = 0; bufs.foreach(_.clear())
    }

    /** Per-subfield (values, def levels); def arrays are `rowCount` long. */
    def buildStruct(): Array[(ColVec, Array[Byte])] =
      Array.tabulate(n)(j =>
        (bufs(j).build(), java.util.Arrays.copyOf(defs(j), nR)))

    protected def addValue(row: SpecializedGetters, i: Int): Long =
      throw new UnsupportedOperationException
    protected def clearValues(): Unit = ()
    def build(): ColVec = throw new UnsupportedOperationException(
      "use buildStruct for STRUCT columns")
  }

  /** Typed element-value buffer for Array/Map/Struct builders — reads the
    * value at `ordinal` straight off a catalyst container (ArrayData or a
    * nested InternalRow both implement SpecializedGetters), no boxing. */
  private sealed abstract class ElemBuf {
    def append(g: SpecializedGetters, ordinal: Int): Long
    def build(): ColVec
    def clear(): Unit
  }

  private object ElemBuf {
    def apply(dt: DataType): ElemBuf = dt match {
      case IntegerType => new IntEB
      case LongType => new LongEB
      case FloatType => new FloatEB
      case DoubleType => new DoubleEB
      case BooleanType => new BoolEB
      case StringType => new BytesEB(fromString = true)
      case BinaryType => new BytesEB(fromString = false)
      case other => throw new IllegalArgumentException(
        s"unsupported LIST-element / STRUCT-field type $other")
    }

    private final class IntEB extends ElemBuf {
      private var a = new Array[Int](1024); private var n = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = g.getInt(i); n += 1; 4L
      }
      def build(): ColVec = IntVec(java.util.Arrays.copyOf(a, n))
      def clear(): Unit = n = 0
    }
    private final class LongEB extends ElemBuf {
      private var a = new Array[Long](1024); private var n = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = g.getLong(i); n += 1; 8L
      }
      def build(): ColVec = LongVec(java.util.Arrays.copyOf(a, n))
      def clear(): Unit = n = 0
    }
    private final class FloatEB extends ElemBuf {
      private var a = new Array[Float](1024); private var n = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = g.getFloat(i); n += 1; 4L
      }
      def build(): ColVec = FloatVec(java.util.Arrays.copyOf(a, n))
      def clear(): Unit = n = 0
    }
    private final class DoubleEB extends ElemBuf {
      private var a = new Array[Double](1024); private var n = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = g.getDouble(i); n += 1; 8L
      }
      def build(): ColVec = DoubleVec(java.util.Arrays.copyOf(a, n))
      def clear(): Unit = n = 0
    }
    private final class BoolEB extends ElemBuf {
      private var a = new Array[Boolean](1024); private var n = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
        a(n) = g.getBoolean(i); n += 1; 1L
      }
      def build(): ColVec = BoolVec(java.util.Arrays.copyOf(a, n))
      def clear(): Unit = n = 0
    }
    private final class BytesEB(fromString: Boolean) extends ElemBuf {
      private var data = new Array[Byte](1 << 14)
      private var offsets = new Array[Int](1024)
      private var n = 0
      offsets(0) = 0
      def append(g: SpecializedGetters, i: Int): Long = {
        if (n + 1 == offsets.length)
          offsets = java.util.Arrays.copyOf(offsets, offsets.length << 1)
        val end = offsets(n)
        var len = 0
        if (fromString) {
          // UTF8String bytes copy once, row buffer -> arena
          val u = g.getUTF8String(i)
          len = u.numBytes()
          if (end + len > data.length) grow(end + len)
          u.writeToMemory(data, Platform.BYTE_ARRAY_OFFSET + end)
        } else {
          val b = g.getBinary(i)
          len = b.length
          if (end + len > data.length) grow(end + len)
          System.arraycopy(b, 0, data, end, len)
        }
        n += 1
        offsets(n) = end + len
        4L + len
      }
      private def grow(need: Int): Unit = {
        var cap = data.length << 1
        while (cap < need) cap <<= 1
        data = java.util.Arrays.copyOf(data, cap)
      }
      def build(): ColVec =
        BytesVec(data, java.util.Arrays.copyOf(offsets, n + 1))
      def clear(): Unit = { n = 0; offsets(0) = 0 }
    }
  }

  /** `conv == null` means the column is a STRING: its UTF8String view is
    * copied ONCE from the catalyst row buffer straight into the arena (no
    * intermediate per-string byte array at all). */
  private final class BytesBuilder(conv: (SpecializedGetters, Int) => Array[Byte])
      extends ColBuilder {
    // arena: the row-boundary copy lands directly in one contiguous buffer;
    // borrowed from the per-thread pool so repeat partitions skip the
    // growth-doubling warmup (see ColBuilder.borrowArena)
    private var data = ColBuilder.borrowArena(1 << 16)
    private var offsets = new Array[Int](1024)
    private var n = 0
    offsets(0) = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n + 1 == offsets.length) offsets = java.util.Arrays.copyOf(offsets, offsets.length << 1)
      val end = offsets(n)
      var len = 0
      if (conv == null) {
        val u = row.getUTF8String(i)
        len = u.numBytes()
        if (end + len > data.length) grow(end + len)
        u.writeToMemory(data, Platform.BYTE_ARRAY_OFFSET + end)
      } else {
        val v = conv(row, i)
        len = v.length
        if (end + len > data.length) grow(end + len)
        System.arraycopy(v, 0, data, end, len)
      }
      n += 1
      offsets(n) = end + len
      4L + len
    }
    private def grow(need: Int): Unit = {
      var cap = data.length << 1
      while (cap < need) cap <<= 1
      data = java.util.Arrays.copyOf(data, cap)
    }
    // zero-copy: the returned vec shares the arena. Safe because flushChunk
    // fully consumes the vec (encode + stats + hash) before the next add()
    // can overwrite arena bytes; BytesVec reads are offset-bounded, so the
    // arena's unused tail is never observed. Copying here would move 32 MB
    // per content chunk for nothing.
    def build(): ColVec = BytesVec(data, java.util.Arrays.copyOf(offsets, n + 1))
    protected def clearValues(): Unit = { n = 0; offsets(0) = 0 }
    override def release(): Unit = { ColBuilder.giveArena(data); data = null }
  }

  private class IntBuilder(get: (SpecializedGetters, Int) => Int) extends ColBuilder {
    private var a = new Array[Int](1024)
    private var n = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = if (get == null) row.getInt(i) else get(row, i)
      n += 1
      4L
    }
    def build(): ColVec = IntVec(java.util.Arrays.copyOf(a, n))
    protected def clearValues(): Unit = n = 0
  }

  private class LongBuilder(get: (SpecializedGetters, Int) => Long) extends ColBuilder {
    private var a = new Array[Long](1024)
    private var n = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = if (get == null) row.getLong(i) else get(row, i)
      n += 1
      8L
    }
    def build(): ColVec = LongVec(java.util.Arrays.copyOf(a, n))
    protected def clearValues(): Unit = n = 0
  }

  private final class FloatBuilder extends ColBuilder {
    private var a = new Array[Float](1024)
    private var n = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = row.getFloat(i)
      n += 1
      4L
    }
    def build(): ColVec = FloatVec(java.util.Arrays.copyOf(a, n))
    protected def clearValues(): Unit = n = 0
  }

  private final class DoubleBuilder extends ColBuilder {
    private var a = new Array[Double](1024)
    private var n = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = row.getDouble(i)
      n += 1
      8L
    }
    def build(): ColVec = DoubleVec(java.util.Arrays.copyOf(a, n))
    protected def clearValues(): Unit = n = 0
  }

  private final class BoolBuilder extends ColBuilder {
    private var a = new Array[Boolean](1024)
    private var n = 0
    protected def addValue(row: SpecializedGetters, i: Int): Long = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = row.getBoolean(i)
      n += 1
      1L
    }
    def build(): ColVec = BoolVec(java.util.Arrays.copyOf(a, n))
    protected def clearValues(): Unit = n = 0
  }
}

/** Incremental sha256 of a column vector's canonical value bytes
  * (4-byte LE length + bytes per value — PLAIN-equivalent, so the manifest
  * is decodable-side reproducible). For chunks with nulls the 0/1 def-level
  * bytes are hashed before the values, so validity is part of identity. */
object ColVecHash {
  def sha256Hex(vec: ColVec, defLevels: Array[Byte] = null): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    if (defLevels != null) md.update(defLevels)
    updateWith(md, vec)
    other2hex(md.digest())
  }

  /** Hash identity for MAP chunks: level streams, then keys, then values. */
  def sha256HexPair(keys: ColVec, vals: ColVec,
      levels: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(levels)
    updateWith(md, keys)
    updateWith(md, vals)
    other2hex(md.digest())
  }

  private def updateWith(md: java.security.MessageDigest, vec: ColVec): Unit = {
    val lenBuf = new Array[Byte](4)
    def putLen(n: Int): Unit = {
      lenBuf(0) = n.toByte; lenBuf(1) = (n >>> 8).toByte
      lenBuf(2) = (n >>> 16).toByte; lenBuf(3) = (n >>> 24).toByte
      md.update(lenBuf)
    }
    vec match {
      case v: BytesVec =>
        var i = 0
        while (i < v.length) {
          val len = v.len(i)
          putLen(len)
          md.update(v.data, v.start(i), len)
          i += 1
        }
      case other => md.update(PlainCodec.encode(other))
    }
  }
  private def other2hex(d: Array[Byte]): String = BitUtil.hexLower(d)
}
