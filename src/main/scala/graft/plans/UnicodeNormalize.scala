package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization of a string column to
  * a fixed form (NFC/NFD/NFKC/NFKD) via the JDK's `java.text.Normalizer`.
  *
  * Spark ships no normalization built-in, yet it is step zero of any
  * serious text-dedup pipeline: the same visible text arrives in composed
  * ("é" U+00E9) and decomposed ("e"+U+0301) encodings — byte-level exact
  * dedup treats them as distinct documents and silently under-dedupes the
  * corpus. The form is a compile-time constant baked into the generated
  * code (an enum constant reference, no per-row dispatch), so the
  * projection stays inside whole-stage codegen; the expression is
  * deterministic and map-side — it adds no exchange anywhere.
  *
  * ASCII fast path: `Normalizer.isNormalized` is cheap for ASCII inputs
  * (every ASCII string is already in every normal form), so the dominant
  * ASCII corpus slice pays one scan, not a rebuild.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val validForms = Set("NFC", "NFD", "NFKC", "NFKD")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!validForms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${validForms.mkString("/")}, " +
          s"got '$form'")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)

  override def prettyName: String = "graft_unicode_normalize"
}
