package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * / whitening step of an embedding pipeline (cheaper ANN at lower dim,
  * decorrelated features for downstream models), built Spark-first:
  *
  *  - ONE distributed pass computes every first and second moment: explode
  *    the (i, j <= i) coordinate pairs of each vector and hash-aggregate
  *    their products. Map-side partial aggregation bounds state and
  *    shuffle at dim*(dim+1)/2 cells PER PARTITION regardless of corpus
  *    size; the driver collects one triangle (~2k rows at dim 64) and
  *    assembles the covariance matrix from `E[x xT] - m mT`.
  *  - The eigensolve runs ON THE DRIVER (a dim x dim symmetric matrix is
  *    planner-side data, exactly like k-means centers): cyclic Jacobi
  *    rotations, deterministic, with a canonical sign fix (largest-|coord|
  *    positive) so results are reproducible bit-for-bit.
  *  - Projection is a map-only codegen'd expression: one
  *    [[graft.functions.DotProduct]] against each literal component,
  *    centered by a precomputed scalar offset — the same driver-held
  *    literal pattern as IVF routing, zero corpus shuffle.
  *
  * Scale note: the declarative moment pass does dim^2/2 hash-agg probes
  * per row — inherent Gramian work, pipelined through the Generate with no
  * materialized amplification. At very large dim (>= ~1k) a BLAS-style
  * `mapPartitions` accumulator wins on constants (MLlib's computeGramian
  * shape); at embedding-table dims the declarative form keeps the whole
  * pass inside codegen and the oracle surface.
  */
object Pca {

  /** @param mean        per-coordinate corpus mean
    * @param components  top-k principal axes (rows, unit-norm, canonical
    *                    sign), ordered by eigenvalue desc
    * @param eigenvalues matching population variances along each axis
    * @param n           corpus rows the model was fit on
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      n: Long)

  /** Fit PCA: one moment pass + driver eigensolve. See object scaladoc. */
  def fit(df: DataFrame, vecCol: Column, k: Int): PcaModel = {
    val cells = df
      .select(vecCol.cast("array<double>").as("x"))
      .select(col("x"), posexplode(col("x")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "xi")
      .select(col("i"), col("xi"), posexplode(slice(col("x"), lit(1), col("i") + lit(1))))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "xj")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("sxx"), sum(col("xi")).as("sxi"),
        count(lit(1)).as("n"))
      .collect()
    require(cells.nonEmpty, "PCA needs a non-empty corpus")
    val dim = cells.map(_.getInt(0)).max + 1
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val n = cells.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get.getLong(4)
    val sxx = Array.fill(dim, dim)(0.0)
    val sxi = Array.fill(dim)(0.0)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      sxx(i)(j) = r.getDouble(2); sxx(j)(i) = r.getDouble(2)
      if (j == 0) sxi(i) = r.getDouble(3)
    }
    val mean = sxi.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => sxx(i)(j) / n - mean(i) * mean(j))

    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { c =>
      val v = vectors.map(_(c)) // eigenvector = column c
      // canonical sign: the largest-|coordinate| entry is positive
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray, n)
  }

  /** Map-only projection onto the model's top-`k` axes: `V (x - m)` as k
    * codegen'd literal dots with precomputed centering offsets.
    */
  def project(vec: Column, model: PcaModel, k: Int): Column = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    array((0 until k).map { c =>
      val comp = model.components(c)
      val offset = comp.zip(model.mean).map { case (a, b) => a * b }.sum
      DotProduct(vec, typedlit(comp)) - lit(offset)
    }: _*)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (driver-side,
    * deterministic): returns (eigenvalues, eigenvector matrix with
    * eigenvectors as COLUMNS). Standard rotations zeroing the largest
    * off-diagonal elements sweep by sweep; converges quadratically for
    * symmetric input.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val dim = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (sweep < maxSweeps && off > tol) {
      for (p <- 0 until dim - 1; q <- p + 1 until dim if math.abs(a(p)(q)) > tol / dim) {
        // rotation angle zeroing a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // sign(0) must be +1 here (equal diagonal still needs the rotation)
        val sign = if (theta >= 0) 1.0 else -1.0
        val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until dim) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until dim) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until dim) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
