package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, L2Normalize}

/** Distributed k-means — the trainer that closes the ANN index-build story:
  * [[Similarity.ivfTopK]] and [[Similarity.pqTopK]] take centroids/codebooks
  * as inputs ("in production these are k-means output"); this produces them
  * IN-ENGINE, so a user can index a raw embedding corpus end to end.
  *
  * Spherical k-means (Lloyd's iterations on the unit hypersphere): vectors
  * are L2-normalized once, assignment is argmax DOT against the current
  * centers (= argmax cosine — exactly the routing [[Similarity.ivfTopK]]
  * uses, so trained centers drop straight in), and the update step is the
  * per-cluster normalized mean. The objective (mean cosine of each vector
  * to its assigned center) is non-decreasing across rounds — a testable
  * invariant (see CheckQueries `x7_kmeans_check`).
  *
  * Scale shape (the same idiom as Spark MLlib's own KMeans, re-expressed
  * declaratively): centers are DRIVER-HELD (k x dim doubles — tiny by
  * construction, guarded), each Lloyd's round is ONE distributed job:
  *   map-only codegen'd argmax assignment over literal centers (zero
  *   shuffle of the corpus, same plan shape as ivfTopK routing), then
  *   `posexplode` + hash-aggregate on (bucket, dim) — map-side partial
  *   aggregation caps the shuffle at k*dim rows PER MAPPER regardless of
  *   corpus size — and a k*dim-row collect updates the centers.
  * The normalized corpus is `localCheckpoint`ed once so every round reads
  * a materialized frame with a constant-depth plan; the driver loop is
  * over ACTIONS (one per round), never over collected corpus data.
  */
object Clustering {

  /** @param centers   unit-norm center vectors; cluster id = array index
    * @param objective per-round mean cosine-to-assigned-center (measured
    *                  BEFORE that round's center update; non-decreasing)
    * @param rounds    Lloyd's rounds actually run (<= maxIter)
    */
  final case class KMeansModel(
      centers: Array[Array[Double]],
      objective: Seq[Double],
      rounds: Int)

  /** The trained centers as a (cid, cvec) frame in exactly the shape
    * [[Similarity.ivfTopK]] expects its `centroids` input.
    */
  def centroidsDf(spark: SparkSession, model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }.toSeq
      .toDF("cid", "cvec")
  }

  /** Per-center dot-product array against literal centers — codegen'd
    * ([[graft.functions.DotProduct]]); for unit inputs dot == cosine.
    */
  private[graft] def simsToCenters(unit: Column, centers: Array[Array[Double]]): Column =
    array(centers.map(c => DotProduct(unit, typedlit(c))): _*)

  /** 0-based id of the nearest center (argmax dot, first-index = lowest-id
    * tiebreak — the same deterministic rule as ivfTopK's routing).
    */
  def assignTo(unit: Column, centers: Array[Array[Double]]): Column = {
    val sims = simsToCenters(unit, centers)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Train spherical k-means over `vecCol`.
    *
    * Deterministic seeding: the k vectors whose ids sort first by
    * `md5(id)` — an engine/run/retry-reproducible pseudo-random sample
    * (the same md5-routing idiom as [[TextAnalysis]]'s deterministic
    * sampling), fetched with orderBy+limit (TakeOrdered — no full sort).
    *
    * k is guarded at 4096: centers are driver-held and unrolled into
    * codegen'd literal argmax, and janino's constant-pool/method limits
    * make O(thousands) the practical bound (same guard rationale as
    * [[Similarity.ivfTopK]]).
    */
  def trainKMeans(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
      maxIter: Int = 10, tol: Double = 1e-6): KMeansModel = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val unitized = df
      .select(idCol.as("id"), L2Normalize(vecCol).as("unit"))
      .localCheckpoint()

    var centers: Array[Array[Double]] = unitized
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("unit"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(centers.nonEmpty, "k-means needs a non-empty corpus")
    val dim = centers.head.length
    val kk = centers.length // may be < k on a tiny corpus

    val objective = scala.collection.mutable.ArrayBuffer.empty[Double]
    var moved = Double.MaxValue
    var round = 0
    while (round < maxIter && moved > tol) {
      // ONE job: assign (map-only literal argmax), explode dims, partial
      // hash-aggregate to (bucket, pos) cells, collect k*dim rows.
      val stats = unitized
        .withColumn("sims", simsToCenters(col("unit"), centers))
        .withColumn("bucket",
          (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
        .withColumn("bsim", array_max(col("sims")))
        .select(col("bucket"), col("bsim"), posexplode(col("unit")))
        .groupBy(col("bucket"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"), sum(col("bsim")).as("o"))
        .collect()

      val sums = Array.fill(kk, dim)(0.0)
      val counts = Array.fill(kk)(0L)
      var objSum = 0.0
      var nTot = 0L
      stats.foreach { r =>
        val b = r.getInt(0)
        val p = r.getInt(1)
        sums(b)(p) = r.getDouble(2)
        if (p == 0) { // per-bucket scalars are replicated across pos cells
          counts(b) = r.getLong(3)
          objSum += r.getDouble(4)
          nTot += r.getLong(3)
        }
      }
      objective += (if (nTot > 0) objSum / nTot else 0.0)

      val next = Array.tabulate(kk) { b =>
        if (counts(b) == 0L) centers(b) // empty cluster: keep its center
        else {
          val mean = sums(b).map(_ / counts(b))
          val nrm = math.sqrt(mean.map(x => x * x).sum)
          if (nrm > 0) mean.map(_ / nrm) else centers(b)
        }
      }
      moved = (0 until kk).map { b =>
        1.0 - centers(b).zip(next(b)).map { case (a, c) => a * c }.sum
      }.max
      centers = next
      round += 1
    }
    KMeansModel(centers, objective.toSeq, round)
  }
}
