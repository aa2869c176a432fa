package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass distributed second moments for tall-skinny PCA
  * (`embedding_pca_project`): count, per-dimension sum, and the packed
  * upper-triangular Gram matrix Σ x·xᵀ.
  *
  * This is the canonical tall-skinny decomposition discipline: the data
  * side is a single mergeable partial aggregate whose state is
  * O(d²) = 64·65/2 + 64 doubles — corpus-size-independent — so Catalyst
  * plans it map-side-combined like any built-in aggregate and the only
  * thing crossing the wire is one ~17 KB buffer per task. The d×d
  * eigendecomposition then runs on the DRIVER (Jacobi below): at d = 64
  * that is microseconds, and no distributed eigensolver is warranted
  * until d² stops fitting in a task — the same split RowMatrix's
  * computePrincipalComponents makes.
  */
case class GramBuf(n: Long, sum: Array[Double], gram: Array[Double])

class GramMoments(d: Int) extends Aggregator[Seq[Float], GramBuf, GramBuf] {
  private val tri = d * (d + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](d), new Array[Double](tri))

  override def reduce(b: GramBuf, x: Seq[Float]): GramBuf = {
    require(x.length == d, s"expected dim $d, got ${x.length}")
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = x(i).toDouble; i += 1 }
    var k = 0
    i = 0
    while (i < d) {
      b.sum(i) += v(i)
      var j = i
      while (j < d) { b.gram(k) += v(i) * v(j); k += 1; j += 1 }
      i += 1
    }
    GramBuf(b.n + 1, b.sum, b.gram)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var i = 0
    while (i < d) { a.sum(i) += b.sum(i); i += 1 }
    i = 0
    while (i < tri) { a.gram(i) += b.gram(i); i += 1 }
    GramBuf(a.n + b.n, a.sum, a.gram)
  }

  override def finish(b: GramBuf): GramBuf = b
  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}

/** Driver-side cyclic Jacobi eigendecomposition for small symmetric
  * matrices (the d×d covariance finishing step of [[GramMoments]]).
  * Deterministic: fixed sweep order, fixed convergence threshold — no
  * randomness, so repeated runs emit identical eigenpairs.
  */
object Jacobi {

  /** Eigen-decompose symmetric `a0` (row-major d×d). Returns
    * (eigenvalues, eigenvectors-as-rows), sorted by descending
    * eigenvalue with the original dimension index as tie-break.
    */
  def symEigen(a0: Array[Double], d: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val a = Array.tabulate(d, d)((i, j) => a0(i * d + j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (sweep < 100 && off() > 1e-18) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              math.signum(theta) / (math.abs(theta) +
                math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x   => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }
}
