package graft.sources

/** Hive/Spark-compatible partition-path value escaping.
  *
  * Percent-escapes (`%XX`, uppercase hex) the same character set as
  * Hive's `FileUtils.charToEscape` / Spark's `ExternalCatalogUtils`:
  * ASCII control chars, `" # % ' * / : = ? \ { [ ] ^` and DEL. Unlike
  * `java.net.URLEncoder` (form encoding), a space stays a literal space
  * and `+` is never touched, so values written here read back byte-exact
  * through Spark, Hive, DuckDB and pyarrow — and their partition dirs
  * read back exactly here. Non-ASCII stays literal, as in Hive. */
object PartitionPath {

  private val needsEscape: Array[Boolean] = {
    val a = new Array[Boolean](128)
    var i = 0
    while (i < 0x20) { a(i) = true; i += 1 }
    a(0x7F) = true
    "\"#%'*/:=?\\{[]^".foreach(c => a(c.toInt) = true)
    a
  }

  def escape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128 && needsEscape(c)) {
        b.append('%')
        b.append(Character.toUpperCase(Character.forDigit((c >> 4) & 0xF, 16)))
        b.append(Character.toUpperCase(Character.forDigit(c & 0xF, 16)))
      } else b.append(c)
      i += 1
    }
    b.toString
  }

  /** Inverse of [[escape]]; a `%` not followed by two hex digits stays
    * literal (matches Spark's lenient unescape). */
  def unescape(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = Character.digit(s.charAt(i + 1), 16)
        val l = Character.digit(s.charAt(i + 2), 16)
        if (h >= 0 && l >= 0) { b.append(((h << 4) | l).toChar); i += 3 }
        else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
