package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression trainer + scorer for cheap model-based
  * document filtering — the "quality classifier" stage every large-scale
  * training-data pipeline runs after its heuristic filters (a linear model
  * over row-local text features, trained to imitate or refine a teacher
  * signal; cf. the fastText-style quality classifiers in public pipeline
  * papers such as CCNet and its descendants).
  *
  * Same driver/executor split as the k-means trainer ([[Clustering]]):
  * the model (a handful of doubles) lives on the driver; each
  * gradient-descent iteration is ONE distributed aggregate over the
  * corpus — features and the sigmoid are codegen'd Column expressions
  * with literal weights, so an iteration is a map-side-combined pass
  * with no shuffle of rows, only of k+2 partial sums. At 100 TB the
  * per-iteration cost is a single scan (in production you train on a
  * sample and score the full corpus; scoring here is map-only either
  * way).
  *
  * Determinism note: partial-sum addition order over partitions is fixed
  * for a fixed input layout, but cross-SF float sums are not oracle
  * material — the catalog therefore oracle-checks SCORING with fixed
  * literal weights (bit-exact arithmetic both engines) and pins TRAINING
  * with tolerance-based invariants (loss decreases, classes separate).
  */
object Classifier {

  /** Trained model: weights aligned with the feature columns (bias first),
    * plus the per-iteration mean log-loss trace (index 0 = the all-zero
    * starting model, ln 2).
    */
  final case class LogRegModel(weights: Array[Double], lossTrace: Seq[Double])

  /** Linear score z = w·[1, features...] as a codegen'd Column with
    * literal weights, accumulated left to right (bias first) — the same
    * order a mirroring SQL oracle writes, so raw doubles hash-compare.
    */
  def linearScore(features: Seq[Column], weights: Seq[Double]): Column = {
    require(weights.length == features.length + 1,
      s"need ${features.length + 1} weights (bias first), got ${weights.length}")
    features.zip(weights.tail).foldLeft(lit(weights.head)) {
      case (acc, (f, w)) => acc + f * lit(w)
    }
  }

  /** Sigmoid of the linear score: the calibrated keep-probability. */
  def score(features: Seq[Column], weights: Seq[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-linearScore(features, weights)))

  /** Batch gradient descent: `iters` full-gradient steps at rate `lr`.
    * Each iteration computes the k+1 gradient components AND the current
    * log-loss in one aggregate (numerically stable `log1p(exp(-|z|))`
    * form, exact for both label branches).
    */
  def trainLogReg(features: Seq[Column], label: Column, iters: Int, lr: Double)(
      df: DataFrame): LogRegModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val k = features.length
    // one narrow projection, reused every iteration: y + named features
    val proj = df.select(
      (label.cast("boolean").cast("int")).cast("double").as("y") +:
        features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"f$i") }: _*)
    proj.persist()
    try {
      var w = Array.fill(k + 1)(0.0)
      val losses = Seq.newBuilder[Double]
      var it = 0
      var lastLoss = Double.NaN
      while (it <= iters) {
        val fcols = (0 until k).map(i => col(s"f$i"))
        val z = linearScore(fcols, w.toSeq)
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        // loss = y*log1p(e^-z) + (1-y)*log1p(e^z), stable via -|z| form:
        // log1p(exp(z' )) for z' <= 0 never overflows
        val loss = avg(
          when(col("y") === 1.0, log1p(exp(-abs(z))) + when(z < 0, -z).otherwise(lit(0.0)))
            .otherwise(log1p(exp(-abs(z))) + when(z > 0, z).otherwise(lit(0.0))))
        val aggs = loss.as("loss") +:
          (0 until k + 1).map(i =>
            avg((p - col("y")) * (if (i == 0) lit(1.0) else col(s"f${i - 1}")))
              .as(s"g$i"))
        val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
        lastLoss = row.getDouble(0)
        losses += lastLoss
        if (it < iters) {
          val next = new Array[Double](k + 1)
          var i = 0
          while (i < k + 1) { next(i) = w(i) - lr * row.getDouble(i + 1); i += 1 }
          w = next
        }
        it += 1
      }
      LogRegModel(w, losses.result())
    } finally proj.unpersist()
  }
}
