package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the north-rule input table (BASELINE.json `input_hint`):
  * an Iceberg-style source-code file listing. All columns REQUIRED. */
final case class CodeRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic, seeded synthesizer of the `code_files` table.
  *
  * Every value is a pure function of (seed, rowId) — no RNG state crosses
  * rows — so the table is identical at any partitioning or parallelism
  * level (FIXTURES.md §1). Distribution knobs follow the fixture spec:
  * Zipf-skewed repos (a few mega-repos), paths sharing long prefixes inside
  * a repo (front-coding friendly), 40-hex commits (dict-hostile), ~25
  * languages (dict/RLE friendly), token-pool content (FSST friendly).
  */
object CodeTableGen {

  val langs: Array[String] = Array(
    "scala", "java", "python", "go", "rust", "c", "cpp", "csharp", "ruby",
    "php", "javascript", "typescript", "kotlin", "swift", "haskell", "perl",
    "lua", "r", "julia", "dart", "elixir", "clojure", "sql", "sh", "html")

  private val dirs = Array("src", "main", "test", "core", "util", "io",
    "net", "db", "api", "ui", "model", "service", "handler", "codec",
    "internal", "common", "ext", "impl", "bench", "tools")

  private val tokensByLang: Array[Array[String]] = langs.map { l =>
    Array(
      s"def f_$l(x):", "return x + 1", "if (cond) {", "} else {", "}",
      s"import lib.$l.core", "val result = compute(input)",
      "for (i <- 0 until n) {", "// TODO: handle edge case",
      s"/* $l implementation of the hot loop */", "let mut acc = 0;",
      "acc += values[i] * weights[i];", "assert(out.length == n)",
      "class Encoder(object):", "public static void main(String[] args) {",
      "match x { case Some(v) => v case None => 0 }",
      "fn encode(values: &[u64]) -> Vec<u8> {", "buffer.push(byte);",
      "while (pos < end) {", "pos += 1", "}",
    )
  }

  /** splitmix64 — a public-domain mixing function; value keyed by row id. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def u01(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** Pure row generator. Zipf-ish repo skew: repo index = floor(R * u^3),
    * so the top ~1% of repos hold roughly half the rows. */
  def genRow(seed: Long, rowId: Long, numRepos: Int, avgContentBytes: Int): CodeRow = {
    val h0 = mix(seed ^ rowId)
    val h1 = mix(h0)
    val h2 = mix(h1)
    val h3 = mix(h2)
    val repoIdx = (numRepos * math.pow(u01(h0), 3.0)).toInt.min(numRepos - 1)
    val org = repoIdx % 199
    val repo = f"org-$org%03d/repo-$repoIdx%05d"
    // language correlates with repo (low cardinality within a repo)
    val lang = langs((repoIdx + (h1 & 3).toInt) % langs.length)
    val depth = 2 + (h1 >>> 8) % 4
    val sb = new StringBuilder(64)
    var d = 0L
    while (d < depth) {
      sb.append(dirs(((h1 >>> (8 * d + 2)) % dirs.length).toInt.abs))
      sb.append('/')
      d += 1
    }
    sb.append(f"file_${(h2 >>> 17) % 100000}%05d.")
    sb.append(lang.take(4))
    val path = sb.toString
    val commit = f"${h2}%016x${mix(h2 ^ 0x5DEECE66DL)}%016x${(h3 & 0xFFFFFFFFL)}%08x"
    // content length: heavy-tailed around avgContentBytes, 64B..16KiB
    val lenScale = math.exp((u01(h3) - 0.5) * 2.5)
    val targetLen = math.max(64, math.min(16384, (avgContentBytes * lenScale).toInt))
    val pool = tokensByLang(langs.indexOf(lang))
    val cb = new StringBuilder(targetLen + 64)
    var state = h3
    while (cb.length < targetLen) {
      state = mix(state)
      cb.append(pool(((state >>> 5) % pool.length).toInt.abs))
      cb.append('\n')
    }
    CodeRow(repo, path, commit, lang, cb.toString)
  }

  /** Distributed deterministic generation: `spark.range` + per-row pure
    * function, no shuffle, no driver-side data. */
  def generate(spark: SparkSession, numRows: Long, numPartitions: Int,
      seed: Long = 42L, avgContentBytes: Int = 1536): Dataset[CodeRow] = {
    import spark.implicits._
    val numRepos = math.max(16, (numRows / 64).toInt)
    spark.range(0L, numRows, 1L, numPartitions)
      .map(id => genRow(seed, id, numRepos, avgContentBytes))
  }
}
