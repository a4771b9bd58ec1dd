package graft.sources

import java.io.{BufferedOutputStream, InputStream, OutputStream}

/** Pluggable file I/O seam — the Spark-side analogue of the reference's
  * `FileSource`/`FileSink` traits (`/root/reference/src/util/io.rs:41-103`).
  *
  * Every reader/writer in this package resolves its I/O through
  * [[GraftIO.forPath]]: paths carrying a URI scheme (`hdfs://`, `s3a://`,
  * `file://`, ...) route to Hadoop's `FileSystem` — already on every Spark
  * classpath, zero new dependencies — while bare paths keep the
  * zero-overhead local implementation. Resolution is a pure function of the
  * path string, so executors resolve independently and nothing is
  * serialized into tasks.
  */
trait GraftIO {
  /** Direct children of `dir`, sorted by name. */
  def list(dir: String): Seq[GraftIO.Entry]
  def status(path: String): Option[GraftIO.Entry]
  /** Positioned random-access reader (footer tails, chunk ranges). */
  def open(path: String): GraftIO.SeekableInput
  /** Sequential whole-file reader (sha256 manifests, CLI dumps). */
  def openStream(path: String): InputStream
  def readAll(path: String): Array[Byte]
  /** Create-or-truncate writer (task retries overwrite idempotently). */
  def create(path: String): OutputStream
  def mkdirs(dir: String): Unit
  def delete(path: String): Unit
  /** Atomic same-directory rename (commit protocol primitive). */
  def rename(src: String, dst: String): Unit
  def length(path: String): Long
  /** Identity key for the process-wide footer cache: must change whenever
    * the file's bytes may have changed (size + mtime + creation identity
    * where the filesystem exposes one). */
  def cacheKey(path: String): AnyRef
}

object GraftIO {

  final case class Entry(name: String, path: String, isDir: Boolean, len: Long)

  /** Positioned-read handle; implementations must tolerate concurrent
    * `readFully` calls only from one thread (each task opens its own). */
  trait SeekableInput extends AutoCloseable {
    def length: Long
    def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit
    final def readFully(pos: Long, buf: Array[Byte]): Unit =
      readFully(pos, buf, 0, buf.length)
  }

  /** Scheme-based resolution: any `scheme:/...` URI goes through Hadoop
    * (both `file:///x` and Hadoop's normalized `file:/x` forms), bare
    * paths stay on the local JDK implementation. */
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:/.*".r
  def forPath(path: String): GraftIO =
    if (SchemeRe.matches(path)) HadoopIO else LocalIO
}

/** JDK-only local filesystem implementation (the default). */
object LocalIO extends GraftIO {
  import java.nio.file.{Files, Paths}

  override def list(dir: String): Seq[GraftIO.Entry] = {
    val kids = new java.io.File(dir).listFiles()
    if (kids == null) Nil
    else kids.sortBy(_.getName).map(f =>
      GraftIO.Entry(f.getName, f.getPath, f.isDirectory,
        if (f.isFile) f.length else 0L)).toSeq
  }

  override def status(path: String): Option[GraftIO.Entry] = {
    val f = new java.io.File(path)
    if (!f.exists()) None
    else Some(GraftIO.Entry(f.getName, f.getPath, f.isDirectory,
      if (f.isFile) f.length else 0L))
  }

  override def open(path: String): GraftIO.SeekableInput =
    new GraftIO.SeekableInput {
      private val raf = new java.io.RandomAccessFile(path, "r")
      override val length: Long = raf.length()
      override def readFully(pos: Long, buf: Array[Byte], off: Int,
          len: Int): Unit = {
        raf.seek(pos)
        raf.readFully(buf, off, len)
      }
      override def close(): Unit = raf.close()
    }

  override def openStream(path: String): InputStream =
    new java.io.FileInputStream(path)

  override def readAll(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))

  override def create(path: String): OutputStream =
    new BufferedOutputStream(new java.io.FileOutputStream(path), 1 << 16)

  override def mkdirs(dir: String): Unit = { new java.io.File(dir).mkdirs(); () }

  override def delete(path: String): Unit = {
    new java.io.File(path).delete(); ()
  }

  override def rename(src: String, dst: String): Unit =
    Files.move(Paths.get(src), Paths.get(dst),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

  override def length(path: String): Long = new java.io.File(path).length

  /** (path, size, mtime-ns, filesystem fileKey): the fileKey (inode on
    * POSIX) catches a same-size in-place rewrite landing within the
    * filesystem's mtime granularity. */
  override def cacheKey(path: String): AnyRef = {
    val attrs = Files.readAttributes(Paths.get(path),
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val ft = attrs.lastModifiedTime().toInstant
    (path, attrs.size(),
      ft.getEpochSecond * 1000000000L + ft.getNano,
      String.valueOf(attrs.fileKey()))
  }
}

/** Hadoop `FileSystem`-backed implementation for `scheme://` paths. The
  * Spark runtime classpath ships hadoop-client; on a real cluster
  * `HADOOP_CONF_DIR` (or the active session's Hadoop conf on the driver)
  * supplies core-site/hdfs-site, so `hdfs://` / `s3a://` resolve the same
  * way Spark's own sources do. */
object HadoopIO extends GraftIO {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Hadoop conf resolution mirrors Spark's own sources on BOTH sides of
    * the cluster: the driver has a session (session-state Hadoop conf,
    * including runtime `spark.conf.set("spark.hadoop.*")` overrides);
    * executors don't, so `spark.hadoop.*` entries are lifted from the
    * executor's SparkConf (`SparkEnv`) — that is where s3a credentials/
    * endpoints set on the SparkConf live, and a bare `new Configuration()`
    * would drop them.
    *
    * The SESSION path is resolved per call, never cached:
    * `getActiveSession` is thread-local, so a first call on a
    * non-session thread would otherwise freeze a bare conf for the JVM
    * lifetime, and runtime conf updates (rotated s3a credentials, a new
    * endpoint) would be ignored forever. `newHadoopConf` is a cheap
    * in-memory copy of an already-built conf. Only the SESSION-LESS
    * executor fallback is cached: an executor's SparkConf is immutable
    * for the JVM's lifetime, and building a fresh `Configuration` there
    * re-parses the default XML resources per call for an identical
    * result. */
  private lazy val envConf: Configuration = {
    val c = new Configuration()
    val env = org.apache.spark.SparkEnv.get
    if (env != null) env.conf.getAll.foreach { case (k, v) =>
      if (k.startsWith("spark.hadoop."))
        c.set(k.stripPrefix("spark.hadoop."), v)
    }
    c
  }

  private def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(envConf)

  private def fs(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), conf())

  override def list(dir: String): Seq[GraftIO.Entry] = {
    val f = fs(dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).sortBy(_.getPath.getName).map(s =>
      GraftIO.Entry(s.getPath.getName, s.getPath.toString, s.isDirectory,
        if (s.isFile) s.getLen else 0L)).toSeq
  }

  override def status(path: String): Option[GraftIO.Entry] = {
    val f = fs(path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val s = f.getFileStatus(p)
      Some(GraftIO.Entry(s.getPath.getName, s.getPath.toString,
        s.isDirectory, if (s.isFile) s.getLen else 0L))
    }
  }

  override def open(path: String): GraftIO.SeekableInput =
    new GraftIO.SeekableInput {
      private val f = fs(path)
      private val in = f.open(new Path(path))
      override val length: Long = f.getFileStatus(new Path(path)).getLen
      override def readFully(pos: Long, buf: Array[Byte], off: Int,
          len: Int): Unit = in.readFully(pos, buf, off, len)
      override def close(): Unit = in.close()
    }

  override def openStream(path: String): InputStream =
    fs(path).open(new Path(path))

  override def readAll(path: String): Array[Byte] = {
    val in = open(path)
    try {
      require(in.length <= Int.MaxValue, s"$path too large to read whole")
      val buf = new Array[Byte](in.length.toInt)
      in.readFully(0L, buf)
      buf
    } finally in.close()
  }

  override def create(path: String): OutputStream =
    new BufferedOutputStream(
      fs(path).create(new Path(path), /*overwrite=*/ true), 1 << 16)

  override def mkdirs(dir: String): Unit = {
    fs(dir).mkdirs(new Path(dir)); ()
  }

  override def delete(path: String): Unit = {
    fs(path).delete(new Path(path), false); ()
  }

  override def rename(src: String, dst: String): Unit = {
    val f = fs(src)
    val d = new Path(dst)
    f.delete(d, false) // HDFS rename fails onto an existing target
    require(f.rename(new Path(src), d), s"rename $src -> $dst failed")
  }

  override def length(path: String): Long =
    fs(path).getFileStatus(new Path(path)).getLen

  override def cacheKey(path: String): AnyRef = {
    val s = fs(path).getFileStatus(new Path(path))
    (path, s.getLen, s.getModificationTime)
  }
}
