package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * Catalyst higher-order functions (`zip_with`/`aggregate`) so everything
  * stays inside whole-stage codegen — no UDF boundary, no serialization.
  *
  * Floats are widened to double *before* multiplying (float→double is
  * exact) and accumulated left-to-right, which makes the result bit-equal
  * to DuckDB's `list_dot_product(CAST(.. AS DOUBLE[]))` oracle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ accumulated in double, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
