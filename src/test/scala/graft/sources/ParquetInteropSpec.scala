package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** External correctness anchors for the real-`.parquet` interop layer.
  *
  * Reading: the reference's own golden files
  * (`/root/reference/data/alltypes_plain.parquet`,
  * `alltypes_dictionary.parquet`, `alltypes_plain.snappy.parquet` — the
  * anchor files of `/root/reference/src/file/reader.rs:728-815`), decoded
  * value-exactly with our own PLAIN / dictionary / RLE kernels.
  */
class ParquetInteropSpec extends AnyFunSuite {

  private val dataDir = "/root/reference/data"

  private def str(v: Any): String = new String(v.asInstanceOf[Array[Byte]], "UTF-8")
  private def tsMicros(v: Any): Long =
    ParquetFileReader.int96ToMicros(v.asInstanceOf[Array[Byte]])
  private def utcMicros(iso: String): Long =
    java.time.Instant.parse(iso).toEpochMilli * 1000L

  test("golden: alltypes_plain.parquet decodes value-exactly") {
    val (names, cols) = ParquetFileReader.readFile(s"$dataDir/alltypes_plain.parquet")
    assert(names == Seq("id", "bool_col", "tinyint_col", "smallint_col",
      "int_col", "bigint_col", "float_col", "double_col", "date_string_col",
      "string_col", "timestamp_col"))
    assert(cols(0) == IndexedSeq(4, 5, 6, 7, 2, 3, 0, 1))
    assert(cols(1) == IndexedSeq(true, false, true, false, true, false, true, false))
    assert(cols(2) == IndexedSeq(0, 1, 0, 1, 0, 1, 0, 1))
    assert(cols(3) == IndexedSeq(0, 1, 0, 1, 0, 1, 0, 1))
    assert(cols(4) == IndexedSeq(0, 1, 0, 1, 0, 1, 0, 1))
    assert(cols(5) == IndexedSeq(0L, 10L, 0L, 10L, 0L, 10L, 0L, 10L))
    assert(cols(6) == IndexedSeq(0.0f, 1.1f, 0.0f, 1.1f, 0.0f, 1.1f, 0.0f, 1.1f))
    assert(cols(7) == IndexedSeq(0.0, 10.1, 0.0, 10.1, 0.0, 10.1, 0.0, 10.1))
    assert(cols(8).map(str) == IndexedSeq("03/01/09", "03/01/09", "04/01/09",
      "04/01/09", "02/01/09", "02/01/09", "01/01/09", "01/01/09"))
    assert(cols(9).map(str) == IndexedSeq("0", "1", "0", "1", "0", "1", "0", "1"))
    assert(cols(10).map(tsMicros) == IndexedSeq(
      utcMicros("2009-03-01T00:00:00Z"), utcMicros("2009-03-01T00:01:00Z"),
      utcMicros("2009-04-01T00:00:00Z"), utcMicros("2009-04-01T00:01:00Z"),
      utcMicros("2009-02-01T00:00:00Z"), utcMicros("2009-02-01T00:01:00Z"),
      utcMicros("2009-01-01T00:00:00Z"), utcMicros("2009-01-01T00:01:00Z")))
  }

  test("golden: alltypes_dictionary.parquet decodes value-exactly") {
    val (names, cols) = ParquetFileReader.readFile(s"$dataDir/alltypes_dictionary.parquet")
    assert(names.head == "id")
    assert(cols(0) == IndexedSeq(0, 1))
    assert(cols(1) == IndexedSeq(true, false))
    assert(cols(5) == IndexedSeq(0L, 10L))
    assert(cols(7) == IndexedSeq(0.0, 10.1))
    assert(cols(8).map(str) == IndexedSeq("01/01/09", "01/01/09"))
    assert(cols(9).map(str) == IndexedSeq("0", "1"))
    assert(cols(10).map(tsMicros) == IndexedSeq(
      utcMicros("2009-01-01T00:00:00Z"), utcMicros("2009-01-01T00:01:00Z")))
  }

  test("golden: alltypes_plain.snappy.parquet (snappy pages) decodes") {
    val (names, cols) = ParquetFileReader.readFile(s"$dataDir/alltypes_plain.snappy.parquet")
    assert(names.head == "id")
    assert(cols(0).length == cols(1).length)
    assert(cols(0).forall(_ != null))
  }

  test("golden: footer metadata fields match the reference's assertions") {
    // mirrors /root/reference/src/file/reader.rs:736-758
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dataDir/alltypes_plain.parquet"))
    val meta = ParquetFileReader.readFooter(bytes)
    assert(meta.version == 1)
    assert(meta.numRows == 8)
    assert(meta.rowGroups.size == 1)
    assert(meta.createdBy ==
      "impala version 1.3.0-INTERNAL (build 8a48ddb1eff84592b3fc06bc6f51ec120e1fffc9)")
    assert(meta.rowGroups.head.columns.size == 11)
    assert(meta.rowGroups.head.numRows == 8)
    assert(meta.rowGroups.head.totalByteSize == 671)
  }

  test("schema text: golden footer prints, flat messages parse back") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dataDir/alltypes_plain.parquet"))
    val meta = ParquetFileReader.readFooter(bytes)
    val text = SchemaText.print(meta)
    assert(text.contains("message schema {"))
    assert(text.contains("INT32 id"))
    assert(text.contains("INT96 timestamp_col"))
    // parse a flat message and check the Spark schema
    val parsed = SchemaText.parse(
      """message m {
        |  required INT64 id;
        |  optional BYTE_ARRAY name (UTF8);
        |  optional INT32 day (DATE);
        |  optional INT64 ts (TIMESTAMP_MICROS);
        |  required DOUBLE score;
        |  optional BOOLEAN flag;
        |}""".stripMargin)
    import org.apache.spark.sql.types._
    assert(parsed == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("day", DateType),
      StructField("ts", TimestampType),
      StructField("score", DoubleType, nullable = false),
      StructField("flag", BooleanType))))
  }

  test("writer roundtrip: our file reads back through our reader") {
    val tmp = java.nio.file.Files.createTempDirectory("pqw").toString
    val path = s"$tmp/rt.parquet"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.BooleanType)))
    val rows = (0 until 5000).map { i =>
      org.apache.spark.sql.Row(
        i.toLong,
        if (i % 11 == 0) null else s"val-${i % 7}",
        i * 0.5,
        i % 3 == 0)
    }
    val n = ParquetFileWriter.writeFile(path, schema, rows.iterator,
      rowGroupRows = 2048, codec = PqCodec.Snappy)
    assert(n == 5000)
    val (names, cols) = ParquetFileReader.readFile(path)
    assert(names == Seq("a", "b", "c", "d"))
    assert(cols(0) == (0 until 5000).map(_.toLong))
    assert(cols(1).zipWithIndex.forall { case (v, i) =>
      if (i % 11 == 0) v == null else str(v) == s"val-${i % 7}" })
    assert(cols(2) == (0 until 5000).map(_ * 0.5))
    assert(cols(3) == (0 until 5000).map(_ % 3 == 0))
  }
}
