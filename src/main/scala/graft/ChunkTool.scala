package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI over a stored chunk table — the counterpart of the reference's
  * `parquet-schema` / `parquet-read` binaries
  * (`/root/reference/src/bin/parquet-schema.rs`, `parquet-read.rs:48-90`).
  *
  * {{{
  * runMain graft.ChunkTool schema  <chunksDir>          # per-column layout + codec mix
  * runMain graft.ChunkTool lineage <chunksDir>          # per-partition lineage rollup
  * runMain graft.ChunkTool head    <chunksDir> <n> <c1,c2,...:types | @schemaFile>
  * runMain graft.ChunkTool parquet-schema <file.parquet> # REAL parquet file footer
  * runMain graft.ChunkTool parquet-read   <file.parquet> [n]
  * }}}
  * `head` takes either a `name:type` list (string,int,long,float,double,
  * bool,binary,timestamp) or `@file` holding standard parquet
  * `message {...}` text (parsed by [[graft.sources.SchemaText]]).
  * `parquet-schema`/`parquet-read` run on real `.parquet` files through
  * [[graft.sources.ParquetFileReader]] — no Spark session needed.
  */
object ChunkTool {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ChunkTool schema|lineage|head|parquet-schema|parquet-read <path> ...")
    val cmd = args(0)
    val dir = args(1)
    // real-file commands: pure JVM, no Spark session
    if (cmd == "parquet-schema") {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir))
      val meta = sources.ParquetFileReader.readFooter(bytes)
      println(sources.SchemaText.print(meta))
      println(s"rows: ${meta.numRows}  row groups: ${meta.rowGroups.size}  " +
        s"created by: ${meta.createdBy}")
      meta.rowGroups.head.columns.foreach { cm =>
        println(f"  ${cm.pathInSchema.mkString(".")}%-24s " +
          f"codec=${cm.codec} encodings=${cm.encodings.mkString(",")} " +
          f"values=${cm.numValues} bytes=${cm.totalCompressedSize}")
      }
      return
    }
    if (cmd == "parquet-read") {
      val n = if (args.length > 2) args(2).toInt else 10
      // record assembly (readFileRows) handles nested LIST/MAP/struct files
      // the same way the reference's parquet-read does (parquet-read.rs:48-90)
      val (names, rows) = sources.ParquetFileReader.readFileRows(dir)
      def render(v: Any): String = v match {
        case null => "null"
        case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case g: sources.ParquetFileReader.PqGroupVal =>
          g.names.zip(g.values).map { case (k, x) => s"$k: ${render(x)}" }
            .mkString("{", ", ", "}")
        case xs: Vector[_] => xs.map {
          case (k, x) => s"${render(k)} -> ${render(x)}"
          case x => render(x)
        }.mkString("[", ", ", "]")
        case v => v.toString
      }
      println(names.mkString("\t"))
      rows.take(n).foreach(g => println(g.values.map(render).mkString("\t")))
      return
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chunks = spark.read.parquet(dir)
    cmd match {
      case "schema" =>
        chunks.groupBy($"colIdx", $"column", $"physicalType")
          .agg(
            concat_ws("+", array_sort(collect_set($"codec"))).as("codecs"),
            count(lit(1)).as("chunks"),
            sum($"numValues").as("rows"),
            sum($"numNulls").as("nulls"),
            sum($"rawBytes").as("rawBytes"),
            sum($"encodedBytes").as("encodedBytes"),
            round(sum($"encodedBytes") / sum($"rawBytes"), 4).as("ratio"))
          .orderBy($"colIdx")
          .show(1000, truncate = false)
      case "lineage" =>
        operators.EncodeJob.lineage(chunks.as[operators.ChunkRow]).toDF()
          .orderBy($"partId", $"column")
          .show(1000, truncate = false)
      case "head" =>
        val n = args(2).toInt
        val schema = if (args(3).startsWith("@"))
          sources.SchemaText.parse(java.nio.file.Files.readString(
            java.nio.file.Paths.get(args(3).drop(1))))
        else org.apache.spark.sql.types.StructType(
          args(3).split(",").map { spec =>
            val Array(name, tpe) = spec.split(":")
            val dt = tpe match {
              case "string" => org.apache.spark.sql.types.StringType
              case "int" => org.apache.spark.sql.types.IntegerType
              case "long" => org.apache.spark.sql.types.LongType
              case "float" => org.apache.spark.sql.types.FloatType
              case "double" => org.apache.spark.sql.types.DoubleType
              case "bool" => org.apache.spark.sql.types.BooleanType
              case "binary" => org.apache.spark.sql.types.BinaryType
              case "timestamp" => org.apache.spark.sql.types.TimestampType
              case other => throw new IllegalArgumentException(s"bad type $other")
            }
            org.apache.spark.sql.types.StructField(name, dt)
          })
        operators.DecodeJob.decode(chunks.as[operators.ChunkRow], schema)
          .show(n, truncate = false)
      case other => throw new IllegalArgumentException(s"unknown command $other")
    }
    spark.stop()
  }
}
