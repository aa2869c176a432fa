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

  /** Σ aᵢ·bᵢ accumulated in double, left-to-right. zip_with null-pads the
    * shorter array — coalesce those products to 0 so ragged inputs sum over
    * the common prefix (min-length semantics, matching the native
    * graft_dot) instead of collapsing the whole sum to null.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => coalesce(x.cast("double") * y.cast("double"), lit(0.0))),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  // The historical dotUdf (a JIT'd Scala UDF dot product) is gone: every
  // hot-path query now uses the codegen'd native `graft_dot` Expression
  // (plans/ArrayDotProduct.scala), which is strictly better — no
  // serialization boundary, participates in whole-stage codegen, identical
  // left-to-right double accumulation. Keeping `udf(` out of this file
  // makes "no UDF on hot paths" a one-grep invariant: the only udf( in
  // src/main is the deliberate B40 udf_scalar operator
  // (queries/Functions.scala).
}
