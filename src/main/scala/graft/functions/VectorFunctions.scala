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
    * the common prefix (min-length semantics, matching [[dotUdf]] and the
    * native graft_dot) instead of collapsing the whole sum to null.
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

  /** Hot-path dot product for pairwise similarity at scale: a JIT-compiled
    * tight loop instead of Catalyst's eval-mode higher-order lambdas (which
    * are not whole-stage-codegen'd and get re-evaluated once per operator
    * that references them). Marked non-deterministic ONLY to stop the
    * optimizer from pushing/duplicating the call into both a filter and a
    * projection — the function itself is pure, and the accumulation order
    * (left-to-right, double) is identical to [[dot]], so results are
    * bit-equal.
    */
  val dotUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Float], b: Array[Float]) => {
      val n = math.min(a.length, b.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }).asNondeterministic()

  /** Pairwise cosine with norms precomputed per side (norms are O(n) once
    * per row instead of O(n) per pair — the difference between 3 and 1
    * vector passes on an n² pair join).
    */
  def cosineFast(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotUdf(a, b) / (normA * normB)
}
