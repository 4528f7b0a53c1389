package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, L2Normalize, NearestCenter}

/** Distributed k-means — the trainer that closes the ANN index-build story:
  * [[Similarity.ivfTopK]] and [[Similarity.pqTopK]] take centroids/codebooks
  * as inputs ("in production these are k-means output"); this produces them
  * IN-ENGINE, so a user can index a raw embedding corpus end to end.
  *
  * Two geometries, one Lloyd's core:
  *  - SPHERICAL (cosine): vectors L2-normalized once, assignment is argmax
  *    DOT against the current centers (= argmax cosine — exactly the
  *    routing [[Similarity.ivfTopK]] uses, so trained centers drop straight
  *    in), update is the per-cluster normalized mean. Objective = mean
  *    cosine to assigned center, NON-DECREASING across rounds.
  *  - EUCLIDEAN (classic k-means): assignment is argmin squared L2,
  *    computed as argmax of `dot(x, c) - |c|^2/2` (the |x|^2 term is
  *    constant per row and drops out of the argmax), update is the plain
  *    per-cluster mean. Objective = mean squared distance, NON-INCREASING.
  *
  * Both invariants are testable and tested (ClusteringSpec; CheckQueries
  * `x7_kmeans_check` drives the spherical one through the driver's oracle).
  *
  * Scale shape (the same idiom as Spark MLlib's own KMeans, re-expressed
  * declaratively): centers are DRIVER-HELD (k x dim doubles — tiny by
  * construction, guarded), each Lloyd's round is ONE distributed job:
  *   map-only codegen'd argmax assignment over literal centers (zero
  *   shuffle of the corpus, same plan shape as ivfTopK routing), then
  *   `posexplode` + hash-aggregate on (bucket, dim) — map-side partial
  *   aggregation caps the shuffle at k*dim rows PER MAPPER regardless of
  *   corpus size — and a k*dim-row collect updates the centers.
  * The prepared corpus is `localCheckpoint`ed once so every round reads
  * a materialized frame with a constant-depth plan; the driver loop is
  * over ACTIONS (one per round), never over collected corpus data.
  */
object Clustering {

  /** @param centers   center vectors (unit-norm iff spherical); cluster id
    *                  = array index
    * @param objective per-round objective, measured BEFORE that round's
    *                  center update: mean cosine (spherical, non-decreasing)
    *                  or mean squared distance (euclidean, non-increasing)
    * @param rounds    Lloyd's rounds actually run (<= maxIter)
    * @param euclidean which geometry trained this model
    */
  final case class KMeansModel(
      centers: Array[Array[Double]],
      objective: Seq[Double],
      rounds: Int,
      euclidean: Boolean = false)

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
  private[graft] def simsToCenters(vec: Column, centers: Array[Array[Double]]): Column =
    array(centers.map(c => DotProduct(vec, typedlit(c))): _*)

  /** Per-center Euclidean ranking scores `dot(x,c) - |c|^2/2`: argmax of
    * these = argmin of squared distance (|x|^2 is row-constant).
    */
  private[graft] def euclideanScores(vec: Column, centers: Array[Array[Double]]): Column =
    array(centers.map { c =>
      val half = c.map(x => x * x).sum / 2.0
      DotProduct(vec, typedlit(c)) - lit(half)
    }: _*)

  /** Per-center score offsets under the model's geometry: |c|²/2 for
    * Euclidean (so argmax dot−offset = argmin squared distance), zero
    * for spherical. The SAME fold order as [[euclideanScores]]'s
    * literals, so [[NearestCenter]] scores are bit-identical to the
    * unrolled twin (pinned in ClusteringSpec).
    */
  private def offsetsFor(centers: Array[Array[Double]], euclidean: Boolean): Array[Double] =
    if (euclidean) centers.map(c => c.map(x => x * x).sum / 2.0)
    else Array.fill(centers.length)(0.0)

  /** Best (bucket, score) against the centers as a
    * `struct<bucket int, score double>` — ONE compile-stable codegen'd
    * expression ([[NearestCenter]]) instead of k unrolled DotProducts,
    * so serving and every Lloyd's round share a single compiled class
    * no matter how large k grows or how often the centers move.
    */
  private[graft] def nearest(vec: Column, centers: Array[Array[Double]],
      euclidean: Boolean): Column =
    NearestCenter(vec, centers, offsetsFor(centers, euclidean))

  /** 0-based id of the nearest center under the model's geometry (first-max
    * tiebreak = lowest cid — the same deterministic rule as ivfTopK's
    * routing). Spherical models expect a UNIT vector input.
    */
  def assignTo(vec: Column, model: KMeansModel): Column =
    nearest(vec, model.centers, model.euclidean).getField("bucket")

  /** Spherical-model argmax over raw centers (back-compat form used by the
    * catalog's check queries).
    */
  def assignTo(unit: Column, centers: Array[Array[Double]]): Column =
    assignTo(unit, KMeansModel(centers, Nil, 0))

  /** Train k-means over `vecCol`; see the object scaladoc for the two
    * geometries and the per-round job shape.
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
    *
    * @param tol convergence threshold on center movement between rounds:
    *            max over centers of `1 - dot(old,new)` (spherical) or of
    *            squared displacement (euclidean)
    */
  def trainKMeans(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
      maxIter: Int = 10, tol: Double = 1e-6, euclidean: Boolean = false): KMeansModel = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val feature =
      if (euclidean) vecCol.cast("array<double>") else L2Normalize(vecCol)
    // malformed vectors (NULL / empty / zero-norm) are dropped here —
    // the family-wide ingestion contract ([[Similarity.wellFormedVec]]):
    // a zero vector has no direction to train on, and a NULL one would
    // poison the per-dimension sums of every round it lands in.
    val prepared = df
      .filter(Similarity.wellFormedVec(vecCol))
      .select(idCol.as("id"), feature.as("x"))
      .localCheckpoint()

    var centers: Array[Array[Double]] = prepared
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("x"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(centers.nonEmpty, "k-means needs a non-empty corpus")
    val dim = centers.head.length
    val kk = centers.length // may be < k on a tiny corpus

    val objective = scala.collection.mutable.ArrayBuffer.empty[Double]
    var moved = Double.MaxValue
    var round = 0
    while (round < maxIter && moved > tol) {
      // ONE job: assign (map-only compile-stable argmax — see [[nearest]]:
      // the round's centers ride as codegen references, NOT source
      // literals, so round 2..maxIter reuse round 1's compiled class),
      // explode dims, partial hash-aggregate to (bucket, pos) cells,
      // collect k*dim rows.
      // per-row objective contribution: best cosine (spherical) or
      // |x|^2 - 2*bestScore = squared distance to the chosen center
      val contrib = if (euclidean)
        DotProduct(col("x"), col("x")) - lit(2.0) * col("nc").getField("score")
      else col("nc").getField("score")
      val stats = prepared
        .withColumn("nc", nearest(col("x"), centers, euclidean))
        .withColumn("bucket", col("nc").getField("bucket"))
        .withColumn("contrib", contrib)
        .select(col("bucket"), col("contrib"), posexplode(col("x")))
        .groupBy(col("bucket"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"), sum(col("contrib")).as("o"))
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
          if (euclidean) mean
          else {
            val nrm = math.sqrt(mean.map(x => x * x).sum)
            if (nrm > 0) mean.map(_ / nrm) else centers(b)
          }
        }
      }
      moved = (0 until kk).map { b =>
        if (euclidean)
          centers(b).zip(next(b)).map { case (a, c) => (a - c) * (a - c) }.sum
        else
          1.0 - centers(b).zip(next(b)).map { case (a, c) => a * c }.sum
      }.max
      centers = next
      round += 1
    }
    KMeansModel(centers, objective.toSeq, round, euclidean)
  }

  /** Train PQ codebooks in-engine: one independent k-means per contiguous
    * subvector slice, in the exact `codebooks(j)(entry)(component)` shape
    * [[Similarity.pqEncode]]/[[Similarity.pqTopK]] consume. SPHERICAL
    * geometry, deliberately: pqEncode's cell assignment is argmax cosine,
    * so training the codebooks under the same geometry keeps
    * trainer and encoder consistent (Euclidean-trained entries would be
    * assigned by a rule they weren't optimized for).
    *
    * m driver-looped trainings of a tiny model each — the loop is over
    * training RUNS (each internally the one-job-per-round shape above),
    * never over corpus data.
    */
  def trainPqCodebooks(df: DataFrame, idCol: Column, vecCol: Column,
      m: Int, k: Int, dim: Int, maxIter: Int = 5): Array[Array[Array[Float]]] = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    Array.tabulate(m) { j =>
      val model = trainKMeans(df, idCol,
        slice(vecCol, j * sub + 1, sub), k, maxIter)
      model.centers.map(_.map(_.toFloat))
    }
  }

  /** Embedding-outlier detection against a trained spherical model — the
    * embedding-side quality filter (SemDeDup prunes the TOO-similar;
    * this prunes the too-DISSIMILAR: mojibake, truncated inputs, wrong-
    * modality rows whose vectors sit far from every topic centroid).
    * Each row is assigned to its nearest centroid (the same codegen'd
    * [[NearestCenter]] argmax the IVF router uses) and flagged when its
    * cosine falls more than `nSigmas` cluster standard deviations below
    * the cluster mean.
    *
    * Determinism at the flag boundary: the per-cluster mean/stddev are
    * computed over sims QUANTIZED to integer micro-units
    * (`floor(sim*1e6)` as long), so the aggregate sums are exact integer
    * arithmetic — bit-identical regardless of partial-aggregation order
    * — and the threshold `mean − nSigmas·σ` is a pure function of exact
    * integers. A double-summed stddev would move by ulps between runs
    * and flip boundary rows; this never does. The squared sum runs
    * through decimal(38,0) UNCONDITIONALLY (cost is negligible next to
    * the scan): a long sum of ≤1e12-per-row squares silently wraps past
    * ~9.2e6 rows per cluster — a size 100 TB corpora reach — corrupting
    * the variance; decimal(38,0) is exact to 1e26 rows per cluster. The
    * linear sum stays long (≤1e6/row ⇒ exact to ~9e12 rows/cluster,
    * orders beyond any real cluster).
    *
    * Plan shape: one map-only assignment scan + one k-row aggregate +
    * a broadcast join of the k thresholds back onto the scan — the
    * corpus is read once and never shuffled.
    */
  def embeddingOutliers(emb: DataFrame, idCol: Column, vecCol: Column,
      model: KMeansModel, nSigmas: Double = 2.0): DataFrame = {
    require(!model.euclidean, "embeddingOutliers expects a spherical model")
    // same ingestion contract as the trainer: malformed vectors carry no
    // angle to measure an outlier BY — they are dropped, not flagged
    // (quarantine them upstream with !wellFormedVec if needed)
    val assigned = emb.filter(Similarity.wellFormedVec(vecCol))
      .select(idCol.as("vec_id"),
        nearest(L2Normalize(vecCol), model.centers, euclidean = false).as("n"))
      .select(col("vec_id"), col("n.bucket").as("cid"),
        floor(col("n.score") * 1e6).cast("long").as("sim_u"))
    val stats = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("cnt"), sum(col("sim_u")).as("s1"),
        sum((col("sim_u") * col("sim_u")).cast("decimal(38,0)")).as("s2"))
      .select(col("cid"),
        (col("s1").cast("double") / col("cnt")).as("mean_u"),
        sqrt(greatest(
          col("s2").cast("double") / col("cnt")
            - pow(col("s1").cast("double") / col("cnt"), 2),
          lit(0.0))).as("sd_u"))
      .select(col("cid"), (col("mean_u") - lit(nSigmas) * col("sd_u")).as("thr_u"))
    assigned.join(broadcast(stats), "cid")
      .select(col("vec_id"), col("cid"), col("sim_u"),
        when(col("sim_u").cast("double") < col("thr_u"), lit(1))
          .otherwise(lit(0)).as("outlier"))
  }
}
