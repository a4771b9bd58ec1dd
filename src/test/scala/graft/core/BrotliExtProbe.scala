package graft.core
import org.scalatest.funsuite.AnyFunSuite
class BrotliExtProbe extends AnyFunSuite {
  test("dump own-encoder outputs for external validation") {
    val outDir = java.nio.file.Paths.get("/tmp/brotli_ext")
    java.nio.file.Files.createDirectories(outDir)
    val base = "/root/repo/src/test/resources/brotli"
    for (f <- Seq("empty", "one", "four", "short_rep", "doc_small", "docs",
        "english", "utf8", "random", "runs")) {
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base/$f.raw"))
      java.nio.file.Files.write(outDir.resolve(s"$f.ours.br"), Brotli.compress(raw))
    }
    // plus a 5 MiB mixed blob crossing the metablock boundary
    val big = new Array[Byte](5 << 20)
    var i = 0
    while (i < big.length) { big(i) = (((i * 2654435761L) >>> 23) & 0x7f).toByte; i += 1 }
    java.nio.file.Files.write(outDir.resolve("big.raw"), big)
    java.nio.file.Files.write(outDir.resolve("big.ours.br"), Brotli.compress(big))
    // and a parquet file written with our BROTLI pages, both page versions
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val rows = (0 until 4000).map(j => org.apache.spark.sql.Row(j.toLong,
      if (j % 13 == 0) null else s"brotli page payload ${j % 97} " * 3))
    for (pv <- Seq(1, 2))
      graft.sources.ParquetFileWriter.writeFile(s"/tmp/brotli_ext/ours_v$pv.parquet",
        schema, rows.iterator, rowGroupRows = 1500,
        codec = graft.sources.PqCodec.Brotli, pageVersion = pv)
  }
}
