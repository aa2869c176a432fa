package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: exact Jaccard similarity of two SORTED
  * `array<long>` columns via a sorted-merge intersection —
  * `|A∩B| / (|A|+|B|-|A∩B|)` in one linear pass, no set construction.
  *
  * This is the candidate-verification step of the banded MinHash path
  * (`dedup_minhash_native`): candidates arrive as (sorted-hash-array,
  * sorted-hash-array) pairs and the exact Jaccard decides. `doGenCode`
  * emits the merge loop straight into whole-stage codegen over unsafe
  * `ArrayData` — no boxed `Array[Long]` per pair, no UDF boundary.
  *
  * Inputs MUST be sorted ascending (the engine always produces them via
  * `array_sort`); both empty yields NaN (0/0), matching the UDF it
  * replaces and the DuckDB division semantics the oracles compare with.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements()
    val lb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    inter.toDouble / (la + lb - inter)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $la && $j < $lb) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = (double) $inter / ($la + $lb - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard_sorted"
}
