package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.LongType

/** Merge-table byte-pair encoding — the PUBLIC BPE algorithm (iterative
  * lowest-rank pair merging over a learned merge list, the tokenizer shape
  * every LLM data pipeline runs): repeatedly find the lowest-rank adjacent
  * symbol pair present in the sequence and merge every (leftmost,
  * non-overlapping) occurrence, until no listed pair remains. This replaces
  * the round-3 "BPE-ish" regex pre-tokenizer ([[TextOps.tokenCount]]) with
  * the real merge loop; the regex one stays as the cheap approximation.
  *
  * Scale shape: a per-partition kernel (broadcast merge table, primitive
  * loops, one pass per document) — no shuffle, no UDF-registry round trip,
  * linear in corpus size like every other TextOps signal.
  *
  * ORACLE EQUIVALENCE (why DuckDB can replay this in plain SQL): for a
  * CREATION-ORDERED table — every merge's operands are base symbols or
  * outputs of strictly earlier merges, which is true of any actually
  * learned BPE table — priority merging equals applying the merges in rank
  * order, each exhaustively, exactly once: merging pair k only creates new
  * adjacencies involving k's output symbol, and that symbol cannot be an
  * operand of any rank < k, so no earlier pair ever reappears. With
  * single-character symbol names a rank's exhaustive leftmost application
  * is one non-overlapping left-to-right `replace(seq, l || r, out)`, and
  * the final token count is `length(seq)` — which is how the q_token_bpe_merge
  * oracle replays [[SyntheticTable]] (built from the SAME [[Table.merges]]
  * list, so the two engines cannot drift).
  */
object Bpe {

  /** One merge rule: adjacent (left, right) fuse into `out`. */
  final case class Merge(left: String, right: String, out: String)

  /** Rank-ordered merge table (rank = position in `merges`). */
  final class Table(val merges: Seq[Merge]) extends Serializable {
    require(merges.nonEmpty, "empty merge table")
    // (left NUL right) -> rank; NUL cannot appear in symbols
    private val rank = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (m, i) =>
      require(!m.left.contains('\u0000') && !m.right.contains('\u0000'),
        "NUL in merge operand")
      val k = m.left + "\u0000" + m.right
      require(!rank.containsKey(k), s"duplicate merge (${m.left},${m.right})")
      rank.put(k, i)
    }
    private val byRank = merges.toArray

    /** Priority-BPE over a symbol sequence: merge the lowest-rank present
      * pair (all leftmost non-overlapping occurrences) until none applies. */
    def encode(symbols: Array[String]): Array[String] = {
      var syms = symbols
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var i = 0
        while (i + 1 < syms.length) {
          val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
          if (r != null && r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val m = byRank(best)
          val buf = new ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == m.left &&
                syms(j + 1) == m.right) {
              buf += m.out; j += 2
            } else { buf += syms(j); j += 1 }
          }
          syms = buf.toArray
        }
      }
      syms
    }

    /** Encode a string whose base symbols are its characters. */
    def encodeChars(s: String): Array[String] = {
      val base = new Array[String](s.length)
      var i = 0
      while (i < s.length) { base(i) = String.valueOf(s.charAt(i)); i += 1 }
      encode(base)
    }

    def countTokens(s: String): Long =
      if (s == null || s.isEmpty) 0L else encodeChars(s).length.toLong
  }

  /** Deterministic synthetic table over [a-z ] text: common English
    * bigram/trigram merges, creation-ordered, single-char (capital) output
    * names so the oracle can replay it with `replace`/`length` (see the
    * object scaladoc). Space is never an operand, so merges cannot cross
    * word boundaries. */
  val SyntheticTable: Table = new Table(Seq(
    Merge("t", "h", "H"),   // th
    Merge("H", "e", "E"),   // the
    Merge("i", "n", "I"),   // in
    Merge("a", "n", "A"),   // an
    Merge("A", "d", "D"),   // and
    Merge("e", "r", "R"),   // er
    Merge("o", "n", "O"),   // on
    Merge("r", "e", "Q"),   // re
    Merge("a", "t", "T"),   // at
    Merge("e", "n", "N")))  // en

  /** Per-partition token-count kernel: appends `outCol` (bigint) holding
    * the BPE token count of `textCol` under `table`. The table is
    * broadcast once; rows stream through primitive loops. */
  def tokenCount(df: DataFrame, textCol: String, table: Table,
      outCol: String = "bpe_tokens"): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    val bc = spark.sparkContext.broadcast(table)
    df.mapPartitions { it =>
      val t = bc.value
      it.map { r =>
        val s = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ t.countTokens(s))
      }
    }
  }
}
