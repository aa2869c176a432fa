package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the k nearest centroids of a float vector,
  * as an `array<int>` of centroid indices ordered by ascending squared-L2
  * distance (ties broken by the lower index — the same deterministic order
  * as a stable sort over (distance, index)).
  *
  * `centroids` is an `array<array<float>>`, in practice a literal built
  * from the collected coarse-quantizer codebook (IVF keeps the codebook
  * tiny — K≈16..65536 — so it inlines into the plan; the index vectors
  * themselves never leave the executors). The squared distance is computed
  * as ‖c‖² − 2·v·c, dropping the per-row constant ‖v‖², which cannot
  * change the argmin ordering.
  *
  * Why an Expression and not a UDF: the IVF assignment pass touches every
  * vector of the index — exactly the pass that must stay inside
  * whole-stage codegen. `doGenCode` emits the distance + partial-selection
  * loops straight over the unsafe `ArrayData`, with no boxing to
  * `Array[Float]` and no UDF serialization boundary.
  */
case class NearestCentroids(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = second.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    val kOk = third.dataType == IntegerType && third.foldable
    if (vecOk && centsOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<array<float>>, " +
        s"foldable int), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, cs: Any, kv: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val m = cents.numElements()
    val nv = vec.numElements()
    val dist = new Array[Double](m)
    val ord = new Array[Int](m)
    var i = 0
    while (i < m) {
      val c = cents.getArray(i)
      val n = c.numElements()
      var s = 0.0
      var t = 0.0
      var j = 0
      while (j < n) {
        val cf = c.getFloat(j).toDouble
        s += cf * cf
        if (j < nv) t += vec.getFloat(j).toDouble * cf
        j += 1
      }
      dist(i) = s - 2.0 * t
      ord(i) = i
      i += 1
    }
    val k = math.min(kv.asInstanceOf[Int], m)
    var a = 0
    while (a < k) {
      var best = a
      var b = a + 1
      while (b < m) {
        if (dist(ord(b)) < dist(ord(best)) ||
          (dist(ord(b)) == dist(ord(best)) && ord(b) < ord(best))) best = b
        b += 1
      }
      val tmp = ord(a); ord(a) = ord(best); ord(best) = tmp
      a += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ord, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, kv) => {
      val m = ctx.freshName("m")
      val nv = ctx.freshName("nv")
      val dist = ctx.freshName("dist")
      val ord = ctx.freshName("ord")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val cf = ctx.freshName("cf")
      val k = ctx.freshName("k")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val tmp = ctx.freshName("tmp")
      val ad = classOf[ArrayData].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $m = $cs.numElements();
         |int $nv = $v.numElements();
         |double[] $dist = new double[$m];
         |int[] $ord = new int[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $ad $c = $cs.getArray($i);
         |  int $n = $c.numElements();
         |  double $s = 0.0;
         |  double $t = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $cf = (double) $c.getFloat($j);
         |    $s += $cf * $cf;
         |    if ($j < $nv) $t += (double) $v.getFloat($j) * $cf;
         |  }
         |  $dist[$i] = $s - 2.0 * $t;
         |  $ord[$i] = $i;
         |}
         |int $k = java.lang.Math.min($kv, $m);
         |for (int $a = 0; $a < $k; $a++) {
         |  int $best = $a;
         |  for (int $b = $a + 1; $b < $m; $b++) {
         |    if ($dist[$ord[$b]] < $dist[$ord[$best]] ||
         |        ($dist[$ord[$b]] == $dist[$ord[$best]] &&
         |         $ord[$b] < $ord[$best])) $best = $b;
         |  }
         |  int $tmp = $ord[$a]; $ord[$a] = $ord[$best]; $ord[$best] = $tmp;
         |}
         |${ev.value} = new $gad(java.util.Arrays.copyOf($ord, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCentroids =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_nearest_cells"
}
