package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.ParquetFileReader.{PqGroupVal, readFooter}

/** Distributed `.parquet` SOURCE over our own decode kernels — the mirror
  * of [[ParquetSink]] and the counterpart of the reference's
  * SerializedFileReader + RowIter
  * (`/root/reference/src/file/reader.rs:145-283`,
  * `/root/reference/src/record/reader.rs:731-903`) lifted to Spark's
  * files model.
  *
  * Scale shape: the driver reads ONE footer (bytes, not data) to derive
  * the Spark schema; the file list is parallelized and every task decodes
  * its own files with the [[ParquetFileReader]] kernels, applying
  * footer-statistics row-group pruning locally (`range`) before any page
  * is decompressed. No data ever passes through the driver.
  */
object ParquetSource {

  /** Spark schema from a parquet footer (flat / LIST / MAP subset — the
    * shapes [[ParquetFileWriter]] emits, which is also the common shape of
    * externally-written files). */
  def sparkSchema(meta: PqFileMeta): StructType = {
    val (rootChildren, _) = ParquetFileReader.schemaTree(meta)
    StructType(rootChildren.map(n => StructField(n.elem.name, dataTypeOf(n),
      nullable = n.elem.repetition != 0)))
  }

  private def dataTypeOf(node: ParquetFileReader.SchemaNode): DataType =
    node match {
      case l: ParquetFileReader.SchemaLeaf => leafType(l.elem)
      case g: ParquetFileReader.SchemaGroup
          if g.elem.convertedType == PqConvertedType.List =>
        g.children.head match {
          case rg: ParquetFileReader.SchemaGroup if rg.children.size == 1 =>
            ArrayType(dataTypeOf(rg.children.head))
          case other => ArrayType(dataTypeOf(other))
        }
      case g: ParquetFileReader.SchemaGroup
          if g.elem.convertedType == PqConvertedType.Map ||
            g.elem.convertedType == PqConvertedType.MapKeyValue =>
        val kv = g.children.head.asInstanceOf[ParquetFileReader.SchemaGroup]
        MapType(dataTypeOf(kv.children(0)), dataTypeOf(kv.children(1)))
      case g: ParquetFileReader.SchemaGroup =>
        StructType(g.children.map(c => StructField(c.elem.name, dataTypeOf(c),
          nullable = c.elem.repetition != 0)))
    }

  private def leafType(se: PqSchemaElement): DataType = se.typ match {
    case PqType.Boolean => BooleanType
    case PqType.Int32 =>
      if (se.convertedType == PqConvertedType.Date) DateType
      else if (se.convertedType == PqConvertedType.Decimal)
        DecimalType(se.precision, se.scale)
      else IntegerType
    case PqType.Int64 =>
      if (se.convertedType == PqConvertedType.TimestampMicros) TimestampType
      else if (se.convertedType == PqConvertedType.Decimal)
        DecimalType(se.precision, se.scale)
      else LongType
    case PqType.Int96 => TimestampType
    case PqType.Float => FloatType
    case PqType.Double => DoubleType
    case PqType.ByteArray =>
      if (se.convertedType == PqConvertedType.Utf8 || se.convertedType == 4)
        StringType
      else if (se.convertedType == PqConvertedType.Decimal)
        DecimalType(se.precision, se.scale)
      else BinaryType
    case PqType.FixedLenByteArray =>
      if (se.convertedType == PqConvertedType.Decimal)
        DecimalType(se.precision, se.scale)
      else BinaryType
    case other => throw new IllegalArgumentException(s"leaf type $other")
  }

  /** Read a directory of `.parquet` files (or one file) as a DataFrame.
    * `range = Some((col, lo, hi))` prunes row groups via footer stats
    * inside each task before any page decode; `columns` (empty = all)
    * prunes column decode — chunks of unselected fields are never touched. */
  def read(spark: SparkSession, dir: String,
      range: Option[(String, Long, Long)] = None,
      columns: Seq[String] = Nil): DataFrame = {
    val io = GraftIO.forPath(dir)
    val root = io.status(dir).getOrElse(
      throw new IllegalArgumentException(s"no such path: $dir"))
    val files: Seq[String] =
      if (!root.isDir) Seq(root.path)
      else io.list(dir).filter(e => !e.isDir && e.name.endsWith(".parquet"))
        .map(_.path).sorted
    require(files.nonEmpty, s"no parquet files in $dir")
    // planning-time schema: footer tail only, never the whole file
    val full = sparkSchema(ParquetFileReader.readFooterOnly(files.head))
    val schema =
      if (columns.isEmpty) full
      else StructType(columns.map(c => full(full.fieldIndex(c))))
    val proj = if (columns.isEmpty) null else columns.toSet
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, math.max(1, files.length))
      .flatMap(path => fileRows(path, schema, range, proj))
    spark.createDataFrame(rdd, schema)
  }

  /** Decode one file to Spark Rows (runs inside a task). */
  def fileRows(path: String, schema: StructType,
      range: Option[(String, Long, Long)],
      projection: Set[String] = null): Iterator[Row] = {
    // footer tail + projected chunk ranges only — pruned row groups and
    // unprojected columns are never read from disk
    val meta = ParquetFileReader.readFooterOnly(path)
    val rgs = range match {
      case Some((col, lo, hi)) =>
        ParquetFileReader.rowGroupsInRange(meta, col, lo, hi)
      case None => meta.rowGroups.indices
    }
    rgs.iterator.flatMap { rg =>
      val fetch = new ParquetFileReader.ChunkFetcher(path)
      val groupRows =
        try ParquetFileReader.readRowsFetched(fetch, meta, rg, projection)
        finally fetch.close()
      groupRows.iterator.map(g => toRow(g, schema))
    }
  }

  private def toRow(g: PqGroupVal, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map(f => externalValue(g(f.name), f.dataType)))

  /** Assembled parquet value -> Spark external-row value for `dt`. */
  def externalValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v match {
          case b: Array[Byte] => ParquetFileReader.int96ToMicros(b)
          case l: Long => l
        }
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case d: DecimalType =>
        val unscaled = v match {
          case l: Long => java.math.BigInteger.valueOf(l)
          case i: Int => java.math.BigInteger.valueOf(i.toLong)
          case b: Array[Byte] => new java.math.BigInteger(b) // signed BE
        }
        new java.math.BigDecimal(unscaled, d.scale)
      case ArrayType(et, _) => v.asInstanceOf[Vector[Any]].map(externalValue(_, et))
      case MapType(kt, vt, _) =>
        v.asInstanceOf[Vector[(Any, Any)]]
          .map { case (k, vv) => externalValue(k, kt) -> externalValue(vv, vt) }.toMap
      case st: StructType => toRow(v.asInstanceOf[PqGroupVal], st)
      case _ => v
    }
}
