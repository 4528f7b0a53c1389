package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): every path is shuffle-on-key with map-side
  * combine — no driver-side collection anywhere. The LSH path exists
  * precisely because all-pairs Jaccard is O(n²): LSH buckets candidates so
  * the expensive verify join touches only pairs sharing a band, which is
  * near-linear for realistic dup rates. Hot-shingle skew (stop-shingles
  * appearing in a large fraction of docs) is the classic blow-up of the
  * pair-generation join; [[ngramJaccardPairs]] takes a `maxShingleDf`
  * frequency cut for that, the standard mitigation in web-scale dedup.
  */
object Dedup {

  /** X1 exact dedup: keep one deterministic survivor per key group
    * (lowest `tiebreak`). `dropDuplicates` would keep an arbitrary row —
    * fine in production, not reproducible against an oracle.
    */
  def exact(keys: Seq[Column], tiebreak: Column)(df: DataFrame): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(keys: _*).orderBy(tiebreak)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** All candidate pairs (a < b) with shingle-set Jaccard >= `threshold`.
    *
    * Plan shape: explode distinct shingles → self-equi-join on shingle
    * (shuffle on shingle) → per-pair intersection counts → join per-doc
    * set sizes → |A∩B| / (|A|+|B|-|A∩B|). All integer arithmetic until the
    * final division, so the result is bit-deterministic.
    *
    * @param maxShingleDf drop shingles occurring in more than this many docs
    *        before pairing (0 = keep all). At scale this bounds the worst
    *        join group from O(n²) to O(maxShingleDf²).
    */
  def ngramJaccardPairs(id: Column, text: Column, n: Int, threshold: Double,
      maxShingleDf: Long = 0L)(df: DataFrame): DataFrame = {
    val sets = df.select(id.as("id"), Texts.shingles(Texts.tokens(text), n).as("sh"))
    val sizes = sets.select(col("id"), size(col("sh")).as("sz"))
    val exploded = sets.select(col("id"), explode(col("sh")).as("s"))
    val pruned =
      if (maxShingleDf <= 0) exploded
      else {
        val hot = exploded.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") > maxShingleDf)
        exploded.join(hot, Seq("s"), "left_anti")
      }
    pruned.as("l").join(pruned.as("r"), col("l.s") === col("r.s") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sza") + col("szb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signature columns: `numHashes` independent min-hashes of the
    * shingle set, via seeded xxhash64 (seed folded in as a prefix — Spark's
    * xxhash64 has a fixed seed). Row-local HOF, no shuffle.
    */
  def minhashSignature(sh: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s))).as(s"mh$i")
    }

  /** X2 MinHash+LSH near-dup candidates, verified with exact Jaccard.
    *
    * shingle → `numBands*rowsPerBand` minhashes → band signatures → explode
    * bands → shuffle on (band, signature) → pairs within a bucket →
    * distinct → verify via array_intersect on the (small) candidate set.
    * Emits (a, b, jaccard) for verified pairs >= `threshold`.
    */
  def minhashLshPairs(id: Column, text: Column, n: Int, numBands: Int, rowsPerBand: Int,
      threshold: Double)(df: DataFrame): DataFrame = {
    val sets = df.select(id.as("id"), Texts.shingles(Texts.tokens(text), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val numHashes = numBands * rowsPerBand
    val signed = sets.select(col("id") +: col("sh") +: minhashSignature(col("sh"), numHashes): _*)
    // one 64-bit signature per band = hash of its rowsPerBand minhashes
    val bands = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    val bucketed = signed
      .select(col("id"), explode(array(bands: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val candidates = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    // verify: join shingle sets back, exact Jaccard on the candidate pairs only
    candidates
      .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** X2 SimHash: 64-bit locality-sensitive fingerprint per document.
    * Row-local: per bit b, sum +1/-1 over token hashes' bit b; the sign
    * becomes bit b of the fingerprint. Near-dups have small Hamming
    * distance. Pure SQL HOFs (codegen); at scale this is a single
    * map-only pass.
    */
  def simhash(toksCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63), b ->
         |    CASE WHEN aggregate(transform($toksCol, t -> xxhash64(t)), 0L,
         |                        (acc, h) -> acc + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
         |         THEN shiftleft(1L, cast(b AS int)) ELSE 0L END),
         |  0L, (acc, x) -> acc | x)""".stripMargin)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
