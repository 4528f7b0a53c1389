package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** [[graft.ops.Pca]] — distributed moments, driver Jacobi eigensolve,
  * codegen projection.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)) and 1 (along (1,-1))
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector columns are orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
  }

  /** Points spread along the direction (3,4)/5 with small noise on the
    * orthogonal axis: the first principal axis must recover (0.6, 0.8).
    */
  private def line() = (0 until 200).map { i =>
    val t = (i - 100) / 10.0        // main-axis coordinate, var >> noise
    val e = ((i % 5) - 2) / 50.0    // orthogonal noise
    (i.toLong, Array((0.6 * t - 0.8 * e).toFloat, (0.8 * t + 0.6 * e).toFloat))
  }.toDF("id", "vec")

  test("fit recovers the dominant axis; eigenvalues are the axis variances") {
    val m = Pca.fit(line(), col("vec"), 2)
    assert(m.n === 200L)
    // canonical sign: pivot coordinate positive → (0.6, 0.8) not (-.6,-.8).
    // 1e-3, not 1e-9: the fixture's %5 noise has a small residual
    // correlation with the main axis, tilting the TRUE data axis ~1e-4
    // off (0.6, 0.8); exactness is covered by the variance test below.
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-3, m.components(0).mkString(","))
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-3)
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) >= 0)
    // components orthonormal
    val d = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(d) < 1e-9)
    m.components.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("projected coordinates have zero mean and variance = eigenvalue per axis") {
    val df = line()
    val m = Pca.fit(df, col("vec"), 2)
    val proj = df.select(Pca.project(col("vec"), m, 2).as("p"))
      .select(element_at(col("p"), 1).as("p1"), element_at(col("p"), 2).as("p2"))
    val r = proj.agg(
      avg(col("p1")).as("m1"), avg(col("p2")).as("m2"),
      (sum(col("p1") * col("p1")) / count(lit(1))).as("v1"),
      (sum(col("p2") * col("p2")) / count(lit(1))).as("v2"),
      (sum(col("p1") * col("p2")) / count(lit(1))).as("c12")).collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-9 && math.abs(r.getDouble(1)) < 1e-9)
    assert(math.abs(r.getDouble(2) - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-9)
    assert(math.abs(r.getDouble(3) - m.eigenvalues(1)) / m.eigenvalues(0) < 1e-9)
    assert(math.abs(r.getDouble(4)) / m.eigenvalues(0) < 1e-9) // decorrelated
  }

  test("fit is deterministic across invocations") {
    val a = Pca.fit(line(), col("vec"), 2)
    val b = Pca.fit(line(), col("vec"), 2)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }
}
