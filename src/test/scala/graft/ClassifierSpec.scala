package graft

import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** Logistic-regression trainer/scorer tests with hand-computed expectations. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("linearScore accumulates bias-first, left to right") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val out = df.select(
      Classifier.linearScore(Seq(col("a"), col("b")), Seq(1.0, 10.0, 100.0)).as("z"))
    assert(out.collect()(0).getDouble(0) === 1.0 + 2.0 * 10.0 + 3.0 * 100.0)
  }

  test("score is the sigmoid of the linear score") {
    val df = Seq(0.0).toDF("x")
    val out = df.select(Classifier.score(Seq(col("x")), Seq(0.0, 1.0)).as("p"))
    assert(out.collect()(0).getDouble(0) === 0.5)
  }

  test("trainLogReg descends the loss and separates a separable dataset") {
    // y = (x > 0) on symmetric points: perfectly separable by sign(x)
    val df = (-10 to 10).filter(_ != 0).map(i => (i.toDouble, i > 0))
      .toDF("x", "y")
    val m = Classifier.trainLogReg(Seq(col("x")), col("y"), iters = 25, lr = 0.5)(df)
    // starting loss is exactly ln 2 (all-zero weights => p = 0.5 everywhere)
    assert(math.abs(m.lossTrace.head - math.log(2.0)) < 1e-12)
    assert(m.lossTrace.last < 0.1)
    // monotone descent on this convex, well-conditioned problem
    m.lossTrace.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
    // the slope carries the signal; every point classified correctly
    assert(m.weights(1) > 0)
    val preds = df.select(col("y"),
      (Classifier.linearScore(Seq(col("x")), m.weights.toSeq) > 0).as("p"))
      .collect().map(r => r.getBoolean(0) == r.getBoolean(1))
    assert(preds.forall(identity))
  }

  test("trained model on the fixture beats the zero model and separates classes") {
    val m = ExtensionQueries.trainedLr(spark, "/root/testdata/sf0.001")
    assert(m.lossTrace.last < m.lossTrace.head - 1e-3)
    val q = graft.ops.TextAnalysis.qualityScore(col("doc_id"), col("text"))(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val z = Classifier.linearScore(
      Seq(col("diversity"), col("stop_ratio"), col("mean_token_len")), m.weights.toSeq)
    val r = q.select(z.as("z"), (col("quality") >= 0.47).as("y"))
      .agg(avg(when(col("y"), col("z"))).as("zp"),
        avg(when(!col("y"), col("z"))).as("zn")).collect()(0)
    assert(r.getDouble(0) > r.getDouble(1))
  }
}
