package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** Pure-JVM checks of the merge-table BPE kernel: hand-computed
  * tokenizations, the priority rule, and the oracle-equivalence property
  * (priority BPE == rank-ordered replace() replay for creation-ordered
  * single-char tables) that q_token_bpe_merge's DuckDB SQL relies on. */
class BpeSpec extends AnyFunSuite {

  private val t = Bpe.SyntheticTable

  test("hand-computed tokenizations") {
    assert(t.encodeChars("the").toSeq == Seq("E"))
    assert(t.encodeChars("and").toSeq == Seq("D"))
    assert(t.encodeChars("thin").toSeq == Seq("H", "I"))
    assert(t.encodeChars("then").toSeq == Seq("E", "n")) // th->H, He->E wins before en
    assert(t.encodeChars("the and").toSeq == Seq("E", " ", "D"))
    assert(t.encodeChars("").isEmpty)
    assert(t.countTokens(null) == 0L)
    assert(t.countTokens("xyz") == 3L) // no merge applies
  }

  test("priority beats textual order: lowest rank merges first") {
    // "ath": pairs (a,t) rank 8 and (t,h) rank 0 -> th merges first,
    // leaving [a, H]; a greedy left-to-right scan would have taken (a,t)
    assert(t.encodeChars("ath").toSeq == Seq("a", "H"))
  }

  test("leftmost non-overlapping merge within one rank") {
    val tbl = new Bpe.Table(Seq(Bpe.Merge("a", "a", "A")))
    assert(tbl.encodeChars("aaa").toSeq == Seq("A", "a"))
    assert(tbl.encodeChars("aaaa").toSeq == Seq("A", "A"))
    assert(tbl.encodeChars("aaaaa").toSeq == Seq("A", "A", "a"))
  }

  test("rank-key ambiguity is impossible: NUL operands and dup pairs rejected") {
    intercept[IllegalArgumentException] {
      new Bpe.Table(Seq(Bpe.Merge("a\u0000", "b", "X")))
    }
    intercept[IllegalArgumentException] { // duplicate pair
      new Bpe.Table(Seq(Bpe.Merge("a", "b", "X"), Bpe.Merge("a", "b", "Y")))
    }
    // multi-char (and space-containing) operands are legal — the rank key
    // separator is NUL, not space
    val multi = new Bpe.Table(Seq(Bpe.Merge("a", "b", "ab"),
      Bpe.Merge("ab", "ab", "abab")))
    assert(multi.encodeChars("abab").toSeq == Seq("abab"))
  }

  test("oracle equivalence: priority BPE == rank-ordered replace() replay") {
    // the exact transformation the DuckDB oracle runs: one global
    // non-overlapping replace per merge, in rank order; token count is
    // the final string length (single-char symbol names)
    def replay(s: String): String =
      t.merges.foldLeft(s)((acc, m) => acc.replace(m.left + m.right, m.out))
    val rng = new scala.util.Random(20260820L)
    val alphabet = "athenirdo "
    (0 until 2000).foreach { _ =>
      val s = Seq.fill(1 + rng.nextInt(40))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      val viaBpe = t.encodeChars(s).mkString
      assert(viaBpe == replay(s), s"input '$s'")
      assert(t.countTokens(s) == replay(s).length.toLong, s"input '$s'")
    }
  }
}
