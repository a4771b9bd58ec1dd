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

  test("indexed encoder == rescan reference on randomized learned-shape tables") {
    // the differential property q_token_bpe_learned relies on: the heap+
    // linked-list encoder and the round-4 full-rescan loop agree symbol
    // for symbol on creation-ordered tables (fresh concatenated outputs —
    // the shape every learned table has) for arbitrary inputs
    val rng = new scala.util.Random(20260821L)
    (0 until 50).foreach { trial =>
      val alphabet = "abcdef"
      val syms = scala.collection.mutable.ArrayBuffer[String](
        alphabet.map(String.valueOf): _*)
      val seen = scala.collection.mutable.Set.empty[(String, String)]
      val merges = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
      var guard = 0
      while (merges.length < 30 && guard < 500) {
        val l = syms(rng.nextInt(syms.length))
        val r = syms(rng.nextInt(syms.length))
        if (!seen((l, r)) && (l + r).length <= 8) {
          seen += ((l, r))
          merges += Bpe.Merge(l, r, l + r)
          syms += (l + r)
        }
        guard += 1
      }
      val tbl = new Bpe.Table(merges.toSeq)
      (0 until 40).foreach { _ =>
        val s = Seq.fill(1 + rng.nextInt(60))(
          alphabet(rng.nextInt(alphabet.length))).mkString
        assert(tbl.encodeChars(s).toSeq ==
          tbl.encodeReference(s.toCharArray.map(String.valueOf)).toSeq,
          s"trial $trial input '$s'")
      }
    }
  }

  test("learn: hand-checked merges, determinism, and encode consistency") {
    // "abab" x3 + "abc" x2: pair counts ab=8, ba=3, bc=2 -> first merge
    // (a,b)->ab; then (ab,ab)=3 vs (ab,c)=2 -> second merge (ab,ab)
    val wf = Seq(("abab", 3L), ("abc", 2L))
    val t1 = Bpe.learn(wf, 3)
    assert(t1.merges.take(2) == Seq(Bpe.Merge("a", "b", "ab"),
      Bpe.Merge("ab", "ab", "abab")), t1.merges.toString)
    // determinism: same inputs, same table
    assert(Bpe.learn(wf, 3).merges == t1.merges)
    // the learned table tokenizes its own training words maximally
    assert(t1.countTokens("abab") == 1L)
    // early stop when pairs run dry, never an error
    assert(Bpe.learn(Seq(("ab", 1L)), 100).merges.size == 1)
  }

  test("learn at 10k merges over synthetic vocab; indexed == rescan") {
    val vocab = Bpe.syntheticVocab(4000)
    assert(vocab == Bpe.syntheticVocab(4000)) // deterministic
    val t = Bpe.learn(vocab ++ Seq(("the", 50L), ("and", 30L)), 10000)
    assert(t.merges.size == 10000, s"only ${t.merges.size} merges learned")
    val rng = new scala.util.Random(7L)
    (0 until 30).foreach { _ =>
      val s = Seq.fill(1 + rng.nextInt(80))(
        ('a' + rng.nextInt(26)).toChar).mkString
      assert(t.countTokens(s) == t.countTokensReference(s), s"input '$s'")
    }
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
