package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the K-permutation MinHash signature of an
  * `array<long>` of shingle hashes — `out(i) = min_j (ha(i)*g(j) + hb(i))`
  * over K seeded affine hash functions (64-bit wrap-around arithmetic, the
  * standard universal-hash family).
  *
  * The coefficient derivation replicates the seeded `scala.util.Random`
  * sequence the engine's boxed-UDF formulation used, so signatures are
  * bit-equal to it (asserted in PhysicalSpec) — but `doGenCode` emits the
  * K×|g| min-loop straight into whole-stage codegen over the unsafe
  * `ArrayData`: no `Array[Long]` boxing per row, no UDF serialization
  * boundary. Per the engine's documented preference order
  * (built-in > native Expression > UDF) this is the hot-path form; at
  * corpus scale the signature pass touches every document.
  *
  * An empty shingle array yields `Long.MaxValue` in every slot (min over
  * the empty set), matching the UDF it replaces.
  */
case class MinHashSignature(child: Expression, k: Int = 12, seed: Long = 7L)
    extends UnaryExpression {

  // same derivation order as the historical UDF: all of ha, then all of hb
  private lazy val (ha: Array[Long], hb: Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L)
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val g = input.asInstanceOf[ArrayData]
    val n = g.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = ha(i) * g.getLong(j) + hb(i)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val haRef = ctx.addReferenceObj("minhashHa", ha, "long[]")
    val hbRef = ctx.addReferenceObj("minhashHb", hb, "long[]")
    nullSafeCodeGen(ctx, ev, g => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $g.numElements();
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $haRef[$i] * $g.getLong($j) + $hbRef[$i];
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$i] = $m;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}
