package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization asymmetric distance
  * computation (ADC). `codes` is a vector's PQ code word — one centroid
  * index per subspace (`array<int>`, length M) — and `lut` is the query's
  * flattened lookup table (`array<double>`, length M×K, laid out
  * `lut[m*K + k] = ⟨q_sub_m, centroid_{m,k}⟩`). The score is
  * Σ_m lut[m*K + codes[m]] — the PQ approximation of ⟨q, x⟩ with K derived
  * from the two lengths, no third argument.
  *
  * Why an Expression and not a UDF: the ADC pass scans every code word of
  * the index per query — the hot path of a PQ probe. `doGenCode` emits the
  * M-step gather loop straight over the unsafe `ArrayData`, keeping the
  * scan inside whole-stage codegen (asserted in PhysicalSpec), exactly the
  * preference order the engine documents: built-in > native Expression >
  * UDF. Out-of-range codes score NaN (never silently 0) so a codebook/
  * code-word mismatch surfaces as a broken ranking, not a quiet one.
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return Double.NaN
    val k = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= k) return Double.NaN
      s += lut.getDouble(i * k + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |double $s = 0.0;
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  $s = Double.NaN;
         |} else {
         |  int $k = $b.numElements() / $m;
         |  for (int $i = 0; $i < $m; $i++) {
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $k) { $s = Double.NaN; break; }
         |    $s += $b.getDouble($i * $k + $c);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc"
}
