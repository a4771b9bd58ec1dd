package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash majority vote in ONE pass — bit-identical to the composed
  * built-in form (64 separate `aggregate(hashes, 0L, acc ± 1)` bit votes
  * OR-ed together) that [[graft.operators.Dedup.simhash]] used previously:
  * bit b of the result is set iff strictly more element hashes have bit b
  * set than clear (votes = 2·ones − n > 0), and a NULL element votes like
  * 0L (the SQL form's `when(null).otherwise(-1)` takes the −1 branch for
  * every bit — exactly a zero hash's contribution). The built-in form
  * re-walks the hash array once per bit — 64 passes per document, each a
  * separate aggregate state in the generated code; this walks it once with
  * a 64-slot count array. Codegen'd (stays inside WholeStageCodegen),
  * null-safe, same custom-`Expression` tier as [[MinHashSig]].
  *
  * Callers wanting the composed form's null-ARRAY semantics (null text →
  * simhash 0, because `when(null > 0, ..)` falls to the otherwise-0 branch)
  * should wrap in `coalesce(.., lit(0L))` — as `Dedup.simhash` does; the
  * expression itself is null-in → null-out like every UnaryExpression.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ones = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 0L else arr.getLong(j)
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) > n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ones = ctx.freshName("ones")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int[] $ones = new int[64];
         |final int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $c.isNullAt($j) ? 0L : $c.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $ones[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2L * $ones[$b] > $n) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Column wrapper: `SimHashSig(tokenHashes)`. */
  def apply(hashes: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpr.column(
      SimHashSig(org.apache.spark.sql.graftexpr.GraftExpr.expression(hashes)))
}
