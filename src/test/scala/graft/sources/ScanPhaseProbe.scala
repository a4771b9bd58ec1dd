package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Single-threaded scan-phase microbench: where does a full-column scan of
  * the bench table actually spend its time? Writes one snappy file shaped
  * like the bench scan table, then times, per column: CRC pass,
  * decompress-only, and full readColumnVec (decompress + decode into typed
  * vectors). Run: Test/runMain graft.sources.ScanPhaseProbe */
object ScanPhaseProbe {
  private def snappyDec(b: Array[Byte], off: Int, cl: Int, ul: Int): Array[Byte] = {
    val out = new Array[Byte](ul)
    org.xerial.snappy.Snappy.uncompress(b, off, cl, out, 0)
    out
  }

  def main(args: Array[String]): Unit = {
    val n = 200000
    val schema = StructType(Seq(
      StructField("repo", StringType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("commit", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("content", StringType, nullable = false),
      StructField("content_len", LongType, nullable = false),
      StructField("line_count", LongType, nullable = false)))
    val path = "/dev/shm/scanprobe.parquet"
    val w = new ParquetFileWriter.IncrementalFileWriter(path, schema,
      rowGroupRows = 1 << 20, codec = PqCodec.Snappy, pageVersion = 1)
    var i = 0
    while (i < n) {
      val r = CodeTableGen.genRow(42L, i.toLong, 500, 1024)
      w.addRow(Row(r.repo, r.path, r.commit, r.lang, r.content,
        r.content.length.toLong, 1L + (i % 40).toLong))
      i += 1
    }
    w.close()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    println(s"file bytes: ${bytes.length}")
    val meta = ParquetFileReader.readFooter(bytes)
    val cols = ParquetFileReader.flatColumns(meta, 0)
    def bestOf[A](reps: Int)(f: => A): Double = {
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    // warm
    cols.foreach(c => ParquetFileReader.readColumnVec(bytes, c))
    cols.foreach { c =>
      val cm = c.meta
      val unc = cm.totalUncompressedSize
      val comp = cm.totalCompressedSize
      val full = bestOf(5)(ParquetFileReader.readColumnVec(bytes, c))
      // CRC-only pass over the chunk's compressed span
      val crc = bestOf(5) {
        val x = new java.util.zip.CRC32
        val off = (if (cm.dictionaryPageOffset >= 0)
          math.min(cm.dictionaryPageOffset, cm.dataPageOffset)
        else cm.dataPageOffset).toInt
        x.update(bytes, off, comp.toInt)
        x.getValue
      }
      println(f"${c.name}%-12s unc=${unc / 1e6}%8.1fMB comp=${comp / 1e6}%8.1fMB " +
        f"full=${full * 1000}%7.2fms (${unc / 1e9 / full}%5.2f GB/s) " +
        f"crcPass=${crc * 1000}%6.2fms")
    }
    // sub-phase timing: where does each column's time go?
    Seq("lang", "content").foreach { colName =>
      val c = cols.find(_.name == colName).get
      val cm = c.meta
      val dictOff = if (cm.dictionaryPageOffset >= 0)
        cm.dictionaryPageOffset.toInt else cm.dataPageOffset.toInt
      val dataOff = cm.dataPageOffset.toInt
      var t = System.nanoTime()
      var pageCount = 0
      var off = dataOff
      val pages = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
      while (off < (cm.dataPageOffset + cm.totalCompressedSize -
          (dataOff - dictOff)).toInt && pageCount < 10000) {
        val ph = ParquetMeta.parsePageHeader(bytes, off)
        pages += ((off + ph.headerLen, ph.compressedSize, ph.uncompressedSize,
          ph.numValues))
        off += ph.headerLen + ph.compressedSize
        pageCount += 1
      }
      println(s"$colName: $pageCount data pages")
      val tParse = bestOf(5) {
        var o = dataOff
        var k = 0
        while (k < pageCount) {
          val ph = ParquetMeta.parsePageHeader(bytes, o)
          o += ph.headerLen + ph.compressedSize; k += 1
        }
      }
      val tDecomp = bestOf(5)(pages.foreach { case (o, cs, us, _) =>
        snappyDec(bytes, o, cs, us) })
      println(f"$colName%-8s phases: headerParse=${tParse * 1000}%6.2fms " +
        f"decompOnly=${tDecomp * 1000}%6.2fms")
    }
    val total = bestOf(3)(cols.foreach(c =>
      ParquetFileReader.readColumnVec(bytes, c)))
    val uncAll = cols.map(_.meta.totalUncompressedSize).sum
    println(f"ALL columns: ${total * 1000}%7.2fms = ${uncAll / 1e9 / total}%5.2f GB/s (uncompressed)")
  }
}
