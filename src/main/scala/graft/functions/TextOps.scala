package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline. All
  * built from codegen'd `org.apache.spark.sql.functions` (no UDFs), so they
  * stay inside WholeStageCodegen and scale linearly with input. */
object TextOps {

  /** Whitespace + punctuation-aware token count (BPE-ish pre-tokenizer:
    * words, numbers, or single non-space symbols). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Plain whitespace token count (matches a trivial SQL oracle exactly). */
  def wsTokenCount(text: Column): Column = {
    val trimmed = trim(text)
    when(length(trimmed) === 0, lit(0L))
      .otherwise(size(split(trimmed, "\\s+")).cast("long"))
  }

  def lineCount(text: Column): Column =
    (size(split(text, "\n", -1)) - lit(1)).cast("long")

  /** Integer quality signals (exactly reproducible in ANSI SQL): byte and
    * char lengths, whitespace count, alpha count, digit count. */
  def qualitySignals(text: Column): Seq[Column] = Seq(
    length(text).cast("long").as("n_chars"),
    octet_length(text).cast("long").as("n_bytes"),
    (length(text) - length(regexp_replace(text, "\\s", ""))).cast("long").as("n_space"),
    (length(text) - length(regexp_replace(text, "[A-Za-z]", ""))).cast("long").as("n_alpha"),
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long").as("n_digit"),
  )

  /** Heuristic quality score in [0,1]: penalizes extreme lengths, low alpha
    * ratio, and high symbol density — a standard pretraining-corpus filter. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = (length(text) - length(regexp_replace(text, "[A-Za-z]", ""))).cast("double")
    val space = (length(text) - length(regexp_replace(text, "\\s", ""))).cast("double")
    val alphaRatio = when(n > 0, alpha / n).otherwise(lit(0.0))
    val spaceRatio = when(n > 0, space / n).otherwise(lit(0.0))
    val lenScore = when(n < 20, n / 20.0).when(n > 20000, lit(0.5)).otherwise(lit(1.0))
    round(least(lit(1.0), greatest(lit(0.0),
      lenScore * (lit(0.5) + alphaRatio * 0.5) *
        when(spaceRatio > 0.6, lit(0.3)).otherwise(lit(1.0)))), 4)
  }

  /** Stopword table shared with the DuckDB oracle (SparkEntry builds the
    * oracle SQL from this map so the two can never drift). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "que", "de", "es", "en", "un", "por", "con"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "per", "non", "sono", "con"),
    "pt" -> Seq("o", "a", "que", "de", "e", "um", "para", "com", "os", "mais"),
  )

  /** N-gram/stopword-heuristic language ID: the language whose stopword set
    * hits the most lowercase tokens wins; ties break lexicographically;
    * no hits => "und" (undetermined). Pure built-ins, fully distributed. */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "\\W+")
    val scored = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      struct(
        size(filter(tokens, t => t.isin(words.map(lit(_)): _*))).as("hits"),
        lit(langCode).as("lang"))
    }
    val best = greatest(scored: _*) // struct compare: hits first, then lang
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Deterministic 64-bit document fingerprint over normalized text
    * (lowercased, whitespace-collapsed) — xxhash64, codegen'd. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Character n-gram shingles (array column), the MinHash/Jaccard input. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val idx = sequence(lit(1), greatest(lit(1), length(norm) - lit(n - 1)))
    array_distinct(transform(idx, i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
    val count = greatest(lit(1), size(toks) - lit(n - 1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** The PII patterns [[redactPii]] masks, in application order, with their
    * replacement markers. Conservative regex syntax only (character
    * classes, bounded repetition, `\b`) so Java's engine (Spark) and RE2
    * (DuckDB) agree — the cross-engine agreement IS oracle-checked.
    * Order matters: an email is redacted before its host part could match
    * the IPv4 rule, and the IP/hex rules run before the digit-run rule
    * could swallow their digits. Markers contain no digits or '@', so no
    * later pattern can match inside an earlier replacement. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>"),
    ("\\b[0-9a-fA-F]{32,}\\b", "<KEY>"),
    ("\\b[0-9][0-9\\-]{5,13}[0-9]\\b", "<NUM>"))

  /** PII redaction — the pre-training scrub pass every large-scale corpus
    * pipeline runs before anything else sees the text: emails, IPv4s,
    * long hex strings (API-key/token shaped), and 7-15 digit runs
    * (phone/SSN shaped) each collapse to a typed marker. Chained
    * `regexp_replace` — codegen'd, no UDF, and replayable verbatim in
    * ANSI SQL (the q_pii_redact oracle plants synthetic PII and DuckDB
    * re-runs the same chain). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (re, marker)) =>
      regexp_replace(c, re, marker)
    }

  /** Duplicate-line fraction in [0,1] — the repetition quality signal
    * (boilerplate, log spew, and template output duplicate lines; classic
    * pretraining-filter rule). 0 for texts of distinct lines and for empty
    * text; (n_lines - n_distinct_lines) / n_lines otherwise. Exactly
    * reproducible in SQL over string_split. */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    when(n > 0,
      (n - size(array_distinct(lines))).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }
}
