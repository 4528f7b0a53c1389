package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, IVF-style partitioned
  * search as the scale path.
  *
  * Scale design: the query side is always the small side — it is broadcast,
  * so the candidate scan is a map-only pass over the (huge) corpus with no
  * corpus shuffle. Top-k uses a per-query window over the similarity; at
  * true scale you'd cap candidates per partition first (partial top-k before
  * the final window) — Catalyst's `WindowExec` already sorts per partition
  * key, which is the same O(n log k) shape when k is small. The IVF path
  * cuts the scanned fraction to ~1/nlist by routing each query to its
  * nearest centroid's bucket only.
  */
object Similarity {

  /** Cosine similarity between two `array<float>` columns, computed in
    * double precision with a deterministic left-to-right fold (so results
    * are reproducible and oracle-comparable). HOF expression — codegen'd,
    * no UDF.
    */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = c.cast("array<double>")
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(d(a), d(b)) / (sqrt(dot(d(a), d(a))) * sqrt(dot(d(b), d(b))))
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (excluding the query itself), ranked with a
    * deterministic id tiebreak.
    *
    * @param corpus  (id, vec) — the big side, scanned map-only
    * @param queries (qid, qvec) — the small side, broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    corpus.join(broadcast(queries), col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (argmax cosine, deterministic centroid-id tiebreak), route each query
    * to ITS nearest centroid, and search only within that bucket. With
    * `nlist` balanced centroids this scans ~1/nlist of the corpus per query
    * — the standard recall/cost trade of IVF indexes.
    *
    * @param centroids (cid, cvec) — small, broadcast twice (assignment +
    *                  routing); in a real pipeline these come from k-means,
    *                  here any deterministic seed set works
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    def assign(df: DataFrame, key: String, vec: String, out: String): DataFrame =
      df.join(broadcast(centroids))
        .withColumn("csim", cosine(col(vec), col("cvec")))
        .withColumn("crank",
          row_number().over(Window.partitionBy(col(key)).orderBy(col("csim").desc, col("cid"))))
        .filter(col("crank") === 1)
        .withColumnRenamed("cid", out)
        .drop("cvec", "csim", "crank")
    val corpusB = assign(corpus, "id", "vec", "bucket")
    val queriesB = assign(queries, "qid", "qvec", "qbucket")
    corpusB.join(broadcast(queriesB),
        col("bucket") === col("qbucket") && col("id") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("vec")))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: `nBits` sign
    * bits of dot products with deterministic pseudo-random hyperplanes.
    * Hyperplane j's component i is derived from xxhash64(i, j) scaled to
    * [-1, 1] — deterministic across executors with no side data to ship.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val dotExpr = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") *
          (xxhash64(lit(i), lit(j)).cast("double") / lit(Long.MaxValue.toDouble))
      }.reduce(_ + _)
      when(dotExpr > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
