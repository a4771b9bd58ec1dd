package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property layer (SURVEY.md §5: "ScalaCheck roundtrip
  * properties per codec", mirroring the reference's randomized
  * `EncodingTester`, encoding.rs:1199-1285) plus corruption robustness in
  * the spirit of its AFL fuzz target (fuzz/src/main.rs:14-37).
  * Deterministic: generators are sampled with fixed seeds (the
  * scalatest-scalacheck bridge is not on the offline classpath). */
class CodecPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 30)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      val v = gen.pureApply(Gen.Parameters.default, Seed(42L + i), retries = 500)
      try body(v)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed at case $i: $e", e)
      }
    }

  private val genBytesVec: Gen[BytesVec] = for {
    n <- Gen.chooseNum(0, 400)
    lens <- Gen.listOfN(n, Gen.chooseNum(0, 80))
    pool <- Gen.chooseNum(2, 40) // small alphabets stress dict + fsst
    vals <- Gen.sequence[List[Array[Byte]], Array[Byte]](lens.map(l =>
      Gen.listOfN(l, Gen.chooseNum(0, pool).map(_.toByte)).map(_.toArray)))
  } yield BytesVec.of(vals.toArray)

  private val genLongVec: Gen[LongVec] = for {
    n <- Gen.chooseNum(0, 600)
    mode <- Gen.oneOf("any", "small", "monotone")
    vs <- mode match {
      case "any" => Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      case "small" => Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
      case _ => Gen.chooseNum(-1000L, 1000L).map(start =>
        List.iterate(start, n)(_ + 7L))
    }
  } yield LongVec(vs.toArray)

  private val genIntVec: Gen[IntVec] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue)).map(l => IntVec(l.toArray)))

  // Float/Double mix repeated values (dict-friendly, exercises the lazy
  // size-only reference-policy path) with arbitrary bit patterns.
  private val genFloatVec: Gen[FloatVec] = for {
    n <- Gen.chooseNum(0, 600)
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-5, 5).map(_.toFloat),
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(java.lang.Float.intBitsToFloat)))
  } yield FloatVec(vs.toArray)

  private val genDoubleVec: Gen[DoubleVec] = for {
    n <- Gen.chooseNum(0, 600)
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-5, 5).map(_.toDouble),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Double.longBitsToDouble)))
  } yield DoubleVec(vs.toArray)

  private def roundtrips(vec: ColVec, codec: Int): Unit = {
    val back = ChunkCodec.decode(ChunkCodec.encodeWith(vec, codec))
    (vec, back) match {
      case (a: BytesVec, b: BytesVec) =>
        assert(a.length == b.length)
        (0 until a.length).foreach(i =>
          assert(java.util.Arrays.equals(a.valueBytes(i), b.valueBytes(i))))
      case (LongVec(a), LongVec(b)) => assert(a.toSeq == b.toSeq)
      case (IntVec(a), IntVec(b)) => assert(a.toSeq == b.toSeq)
      // Bit-exact compare, except NaNs collapse to the canonical pattern:
      // Float.intBitsToFloat is documented as unable to preserve signaling-NaN
      // bit patterns on some hardware (the JIT quietizes bit 22 in a float
      // register move), so demanding raw-bit equality for NaNs would test the
      // JVM, not the codec. floatToIntBits canonicalizes every NaN.
      case (FloatVec(a), FloatVec(b)) =>
        assert(a.map(java.lang.Float.floatToIntBits).toSeq ==
          b.map(java.lang.Float.floatToIntBits).toSeq)
      case (DoubleVec(a), DoubleVec(b)) =>
        assert(a.map(java.lang.Double.doubleToLongBits).toSeq ==
          b.map(java.lang.Double.doubleToLongBits).toSeq)
      case other => fail(s"type changed: $other")
    }
  }

  test("property: byte-array codecs roundtrip arbitrary values") {
    forAll(genBytesVec) { vec =>
      Seq(CodecId.Plain, CodecId.Dict, CodecId.DeltaLengthByteArray,
        CodecId.DeltaByteArray, CodecId.Fsst).foreach(roundtrips(vec, _))
    }
  }

  test("property: integer codecs roundtrip arbitrary values") {
    forAll(genLongVec) { vec =>
      Seq(CodecId.Plain, CodecId.Dict, CodecId.DeltaBinaryPacked)
        .foreach(roundtrips(vec, _))
    }
    forAll(genIntVec) { vec =>
      Seq(CodecId.Plain, CodecId.Dict, CodecId.DeltaBinaryPacked)
        .foreach(roundtrips(vec, _))
    }
  }

  test("property: float/double codecs roundtrip bit-exactly (NaNs canonicalized)") {
    forAll(genFloatVec) { vec =>
      Seq(CodecId.Plain, CodecId.Dict).foreach(roundtrips(vec, _))
    }
    forAll(genDoubleVec) { vec =>
      Seq(CodecId.Plain, CodecId.Dict).foreach(roundtrips(vec, _))
    }
  }

  test("property: encodeAuto respects the reference-policy ceiling") {
    forAll(genBytesVec) { vec =>
      val chunk = ChunkCodec.encodeAuto(vec)
      assert(chunk.encodedSize <= chunk.refPolicySize)
      roundtripsAuto(vec, chunk.blob)
    }
  }

  private def roundtripsAuto(vec: BytesVec, blob: Array[Byte]): Unit = {
    val back = ChunkCodec.decode(blob).asInstanceOf[BytesVec]
    assert(back.length == vec.length)
  }

  test("property: refPolicySizeOnly equals the materialized reference blob size") {
    forAll(genBytesVec) { vec =>
      assert(ChunkCodec.refPolicySizeOnly(vec) ==
        ChunkCodec.encodeWith(vec, CodecId.Dict).length.toLong)
    }
    forAll(genLongVec) { vec =>
      assert(ChunkCodec.refPolicySizeOnly(vec) ==
        ChunkCodec.encodeWith(vec, CodecId.Dict).length.toLong)
    }
    forAll(genIntVec) { vec =>
      assert(ChunkCodec.refPolicySizeOnly(vec) ==
        ChunkCodec.encodeWith(vec, CodecId.Dict).length.toLong)
    }
    // Float/Double can reach the lazy size-only path too (round-2 advice)
    forAll(genFloatVec) { vec =>
      assert(ChunkCodec.refPolicySizeOnly(vec) ==
        ChunkCodec.encodeWith(vec, CodecId.Dict).length.toLong)
    }
    forAll(genDoubleVec) { vec =>
      assert(ChunkCodec.refPolicySizeOnly(vec) ==
        ChunkCodec.encodeWith(vec, CodecId.Dict).length.toLong)
    }
    // dict-fallback + multi-page regime: >1 MiB of unique strings
    val big = BytesVec.of(Array.tabulate(3000)(i =>
      (s"value-$i-" + ("x" * 700)).getBytes))
    assert(ChunkCodec.refPolicySizeOnly(big) ==
      ChunkCodec.encodeWith(big, CodecId.Dict).length.toLong)
  }

  test("property: corrupted blobs raise cleanly (no hangs, no huge allocs)") {
    val base = ChunkCodec.encodeWith(
      BytesVec.of(Array.fill(200)("some text value".getBytes)), CodecId.Dict)
    forAll(Gen.zip(Gen.chooseNum(0, base.length - 1), Gen.chooseNum(1, 255)),
        cases = 200) { case (pos, delta) =>
        val corrupted = base.clone()
        corrupted(pos) = (corrupted(pos) + delta).toByte
        // must either decode to something or throw a normal exception —
        // never OOM / negative-size / infinite loop
        try { ChunkCodec.decode(corrupted); () }
        catch {
          case _: IllegalArgumentException | _: IndexOutOfBoundsException |
               _: UnsupportedOperationException | _: ClassCastException |
               _: NegativeArraySizeException | _: ArithmeticException |
               _: java.nio.BufferUnderflowException => ()
        }
    }
  }

  test("property: bounded top-k symbol selection equals a full sort") {
    // the training heap keeps the 255 best (gain desc, bytes lex asc,
    // shorter first); pin it against a brute-force reference on random
    // counters, including heavy gain ties
    val rnd = new scala.util.Random(4242)
    (0 until 20).foreach { _ =>
      val gc = new FsstCodec.GainCounter(1 << 12)
      val nEntries = 1 + rnd.nextInt(4000)
      val seen = scala.collection.mutable.LinkedHashMap.empty[(Long, Int), Long]
      (0 until nEntries).foreach { _ =>
        val len = 1 + rnd.nextInt(8)
        // mask the word to `len` bytes so it is a valid symbol key
        val word = rnd.nextLong() & (if (len >= 8) -1L else (1L << (8 * len)) - 1)
        val gain = 1L + rnd.nextInt(8) // few distinct gains => many ties
        gc.bump(word, len, gain)
        seen.updateWith((word, len))(prev => Some(prev.getOrElse(0L) + gain))
      }
      val got = gc.top(255).toSeq.map(_.toSeq)
      def key(w: Long, l: Int): Seq[Byte] =
        (0 until l).map(b => ((w >>> (8 * b)) & 0xFF).toByte)
      val expected = seen.toSeq
        .map { case ((w, l), g) => (g, key(w, l)) }
        .sortWith { case ((g1, b1), (g2, b2)) =>
          if (g1 != g2) g1 > g2
          else {
            val cmp = b1.map(_ & 0xFF).zip(b2.map(_ & 0xFF))
              .collectFirst { case (x, y) if x != y => x - y }.getOrElse(0)
            if (cmp != 0) cmp < 0 else b1.length < b2.length
          }
        }
        .take(255).map(_._2)
      assert(got == expected)
    }
  }
}
