package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a serialized Bloom filter with a long
  * key — `graft_bloom_contains(key, filterBytes)`.
  *
  * This is the map-side prefilter of the contamination check
  * (`text_contamination_check`) and the membership sketch probe
  * (`sketch_bloom_filter`): both previously went through a boxed Scala
  * `udf` on the hottest path in the query — every row of the huge side
  * paid the codegen→UDF eval boundary (serializer round-trip + closure
  * call). Here the probe compiles straight into whole-stage codegen: the
  * filter deserializes ONCE per task (lazy, from the foldable binary
  * argument) and each row costs one virtual call into the sketch's
  * bit-mix loop over primitive longs.
  *
  * The filter travels as a binary literal in the plan, which Spark ships
  * to executors inside the broadcast task binary — same distribution cost
  * as an explicit `sparkContext.broadcast` of the filter (one copy per
  * executor), without the driver-side lifecycle. This mirrors Spark's own
  * runtime-filter `BloomFilterMightContain` shape. The filter argument
  * must be foldable (a literal); key nulls propagate to null, matching
  * the SQL semantics of the `udf` it replaces.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        // a foldable NULL (lit(null).cast("binary")) would otherwise pass
        // here and NPE at first-eval/codegen when the lazy deserialization
        // reads the bytes — reject it at analysis time instead, so the
        // interpreted and codegen paths can never disagree on null handling
        if (right.eval(null) == null)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a non-null serialized filter literal")
        else TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) serialized filter")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, binary) arguments, got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  /** Deserialized once per task (the expression tree is part of the
    * broadcast task binary; `lazy` defers to first row).
    */
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, filterBytes: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // only the key is evaluated per row; the filter is a codegen-time
    // reference object probed directly — no per-row literal eval
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    val keyGen = left.genCode(ctx)
    ev.copy(code = code"""
      ${keyGen.code}
      boolean ${ev.isNull} = ${keyGen.isNull};
      ${CodeGenerator.javaType(dataType)} ${ev.value} =
        ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        ${ev.value} = $bf.mightContainLong(${keyGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}
