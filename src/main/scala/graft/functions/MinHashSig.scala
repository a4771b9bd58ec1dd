package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-minima MinHash signature in ONE pass — bit-identical to the composed
  * built-in form
  * `array((0 until n).map(i => array_min(transform(base, x => xxhash64(x, lit(i))))))`:
  * Spark's `xxhash64(x, lit(i))` is the seed-42 chained multi-argument hash
  * `XXH64.hashInt(i, XXH64.hashLong(x, 42))`, and this expression calls those
  * same two `XXH64` statics — but without the n intermediate arrays that
  * form allocates per row (and hashing each element's base once, not n times). At n=64 over a
  * ~200-shingle document the built-in plan allocates ~100 KB/row of
  * short-lived `GenericArrayData`; this expression allocates exactly one
  * `long[n]` output. Codegen'd (stays inside WholeStageCodegen), null-safe,
  * foldable-free — the custom-`Expression` tier of SURVEY.md §6's operator
  * preference order, used where built-ins genuinely can't express the
  * one-pass shape.
  *
  * Mirrors the signature construction of the reference-era MinHash pipeline
  * (one base hash per shingle, seed-derived hash family) — see SURVEY.md §5
  * (LLM-pipeline operators), not a reference file: the reference engine has
  * no dedup layer.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 4096, s"bad numHashes $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${t.sql}")
  }

  // never null-per-element: empty input yields Long.MaxValue minima, but
  // callers (minhashSignature) always feed >=1 shingle so the distinction
  // is unobservable there
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // xxhash64(x, lit(i)) is Spark's seed-42 CHAINED multi-arg hash:
      // hashInt(i, hashLong(x, 42)) — hash x once, derive per-i from it.
      // A null element leaves the chained seed untouched (Spark hash
      // semantics), so its contribution is hashInt(i, 42).
      val b = if (arr.isNullAt(j)) 42L else XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, b)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $x = $c.isNullAt($j)
         |    ? 42L : $xxh.hashLong($c.getLong($j), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $h = $xxh.hashInt($i, $x);
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column wrapper: `MinHashSig(baseHashes, 64)`. */
  def apply(base: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.column(
      MinHashSig(org.apache.spark.sql.graftexpr.GraftExpr.expression(base),
        numHashes))
}
