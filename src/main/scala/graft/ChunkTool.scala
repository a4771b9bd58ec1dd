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
  * runMain graft.ChunkTool head    <chunksDir> <n> <c1,c2,...:types>
  * }}}
  * `head` types: string,int,long,float,double,bool,binary,timestamp (the
  * flat schema the chunks were encoded from, in colIdx order).
  */
object ChunkTool {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ChunkTool schema|lineage|head <chunksDir> ...")
    val cmd = args(0)
    val dir = args(1)
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
        val schema = org.apache.spark.sql.types.StructType(
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
