package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, DotProduct, L2Normalize, NearestCenter, QuantizeInt8, TopKByScore}

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, IVF-style partitioned
  * search as the scale path.
  *
  * Scale design: the query side is always the small side — it is broadcast,
  * so the candidate scan is a map-only pass over the (huge) corpus with no
  * corpus shuffle. Per-candidate scoring is a native codegen'd expression
  * ([[graft.functions.CosineSimilarity]]), and top-k selection is a bounded
  * aggregate ([[graft.functions.TopKByScore]]) whose map-side partial
  * buffers cap the shuffle at k rows per (query, mapper) — no per-query
  * single-reducer sort anywhere. The IVF path cuts the scanned fraction to
  * ~1/nlist by routing each query to its nearest centroid's bucket, with
  * centroid assignment computed map-only from driver-held centers (the
  * standard IVF shape: centers are k-means output, small by construction,
  * and live with the planner exactly like a broadcast dim).
  */
object Similarity {

  /** Cosine similarity — native codegen'd expression, double precision,
    * deterministic left-to-right accumulation (oracle-comparable with
    * DuckDB's `list_cosine_similarity`).
    */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Vector-validity predicate — the embedding family's input contract:
    * a vector is WELL-FORMED iff it is non-NULL, non-empty and has a
    * strictly positive norm. Cosine geometry is undefined for the rest
    * (a zero vector has no direction; an empty array has no dimensions),
    * so every operator in this family and [[Clustering]] DROPS malformed
    * rows at its ingestion boundary — the vector analog of the reference
    * serde's drop-on-malformed contract (KafkaStreamsApp.scala:64-70:
    * undeserializable records are skipped, not poisoned downstream).
    * Callers that need the dropped rows (e.g. to quarantine them) filter
    * with the negation BEFORE invoking the operator. Exact-SQL oracles
    * mirror the contract with
    * `len(embedding) > 0 AND list_sum(list_transform(embedding, x -> x*x)) > 0`
    * (NULL embeddings fail any comparison and drop with it; the
    * transform form, not list_dot_product — DuckDB 1.0 evaluates pushed
    * scan filters on unfiltered vectors and list_dot_product hard-errors
    * on the NULL rows it would later mask out).
    */
  def wellFormedVec(c: Column): Column =
    c.isNotNull && size(c) > 0 && DotProduct(c, c) > 0

  /** Lambda-HOF formulation of [[cosine]] (interpreted — CodegenFallback).
    * Kept as the differential-testing twin of the native expression; not
    * used on any hot path.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def d(c: Column) = c.cast("array<double>")
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(d(a), d(b)) / (sqrt(dot(d(a), d(a))) * sqrt(dot(d(b), d(b))))
  }

  /** Rank the scored candidates: explode the per-query top-k array into
    * (qid, rank, id, sim) rows, best first.
    */
  private def explodeRanked(scored: DataFrame): DataFrame =
    scored
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"), col("col.score").as("sim"))

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (excluding the query itself), ranked with a
    * deterministic id tiebreak.
    *
    * Plan shape: broadcast the queries, score map-only over the corpus,
    * then ONE bounded aggregate per qid — partial top-k on the map side,
    * final top-k on the reduce side. The shuffle carries ≤ k rows per
    * (query, mapper); no stage ever holds a query's full candidate set.
    *
    * @param corpus  (id, vec) — the big side, scanned map-only
    * @param queries (qid, qvec) — the small side, broadcast
    */
  /** [[wellFormedVec]] applied to an op input (see its scaladoc): the
    * filter rides the same scan as the op's first projection, so the
    * contract costs no extra pass.
    */
  private def wf(df: DataFrame, vecCol: String): DataFrame =
    df.filter(wellFormedVec(col(vecCol)))

  def bruteForceTopK(corpus0: DataFrame, queries0: DataFrame, k: Int): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val queries = wf(queries0, "qvec")
    explodeRanked(
      corpus.join(broadcast(queries), col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), col("vec")))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (argmax cosine, deterministic centroid-id tiebreak), route each query
    * to ITS nearest centroid, and search only within that bucket. With
    * `nlist` balanced centroids this scans ~1/nlist of the corpus per query
    * — the standard recall/cost trade of IVF indexes.
    *
    * The centroid table is collected to the driver (IVF centers are k-means
    * output — inherently small; guarded at 4096) and unrolled into a
    * codegen'd argmax over literal vectors, so corpus bucket assignment is
    * a map-only projection: zero shuffle, zero corpus movement. Round 1
    * computed the same assignment as a corpus×centroids cross join plus a
    * per-id window rank — a full extra shuffle of nlist× the corpus.
    *
    * @param centroids (cid, cvec) — small; in a real pipeline these come
    *                  from k-means, here any deterministic seed set works
    */
  /** Collect and guard the (small, k-means-output) centroid table for
    * literal-unrolled codegen. 4096, not "as many as fit on the driver":
    * each centroid unrolls into literal vectors inside ONE generated
    * argmax expression, and janino's 64 KB method / constant-pool limits
    * give out at O(thousands) of centers long before driver memory does.
    * Above this bound the right plan is a broadcast-join assignment
    * (centroids as a broadcast dim + max_by aggregate), not a bigger
    * literal unroll.
    */
  private def collectCenters(centroids: DataFrame): Array[(Long, Array[Float])] = {
    val centers = centroids
      .select(col("cid").cast("long"), col("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(centers.nonEmpty && centers.length <= 4096,
      s"IVF centroid count must be in [1, 4096], got ${centers.length}")
    centers
  }

  def ivfTopK(corpus0: DataFrame, queries0: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val queries = wf(queries0, "qvec")
    val centers = collectCenters(centroids)

    /** Codegen'd argmax over the per-centroid similarity array:
      * `array_position` returns the FIRST index of the max, so ties pick
      * the earlier (= lower cid) center, matching rank by (csim DESC,
      * cid ASC). A when-chain fold would duplicate the accumulated branch
      * per step (2^nlist code growth past janino's 64 KB method limit);
      * the array form stays linear and method-splittable.
      */
    def nearestCid(vec: Column): Column = {
      val sims = array(centers.map { case (_, cvec) => cosine(vec, typedlit(cvec)) }: _*)
      val pos = array_position(sims, array_max(sims)).cast("int")
      element_at(typedlit(centers.map(_._1)), pos)
    }

    val corpusB = corpus.withColumn("bucket", nearestCid(col("vec")))
    val queriesB = queries.withColumn("qbucket", nearestCid(col("qvec")))
    explodeRanked(
      corpusB.join(broadcast(queriesB),
          col("bucket") === col("qbucket") && col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), col("vec")))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** Multi-probe IVF ANN: like [[ivfTopK]], but each query searches its
    * `nprobe` NEAREST centroid buckets instead of only the single nearest —
    * the standard IVF recall knob (a query near a Voronoi boundary finds
    * neighbors that fell just across it) at `nprobe/nlist` of the corpus
    * scanned per query.
    *
    * Plan shape: corpus bucket assignment is the same map-only codegen'd
    * literal argmax; the query side ranks all centroids in ONE generated
    * sort over a literal-built (score, cid) struct array, slices the top
    * `nprobe`, and EXPLODES them (nprobe rows per query — still tiny, still
    * broadcast), so the probe fan-out stays an equi-join on the bucket id:
    * no `array_contains` theta-join, no nested-loop fallback. Each corpus
    * vector lives in exactly one bucket, so no candidate dedup is needed.
    */
  def ivfProbeTopK(corpus0: DataFrame, queries0: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val queries = wf(queries0, "qvec")
    val centers = collectCenters(centroids)
    require(nprobe >= 1 && nprobe <= centers.length,
      s"nprobe must be in [1, ${centers.length}], got $nprobe")

    def nearestCid(vec: Column): Column = {
      val sims = array(centers.map { case (_, cvec) => cosine(vec, typedlit(cvec)) }: _*)
      val pos = array_position(sims, array_max(sims)).cast("int")
      element_at(typedlit(centers.map(_._1)), pos)
    }
    // (-sim, cid) structs sort ascending = sim DESC with cid ASC tiebreak,
    // matching ivfTopK's deterministic routing rule
    def probeCids(vec: Column): Column = {
      val entries = array(centers.map { case (cid, cvec) =>
        struct((-cosine(vec, typedlit(cvec))).as("negs"), lit(cid).as("c"))
      }: _*)
      slice(sort_array(entries), 1, nprobe)
    }

    val corpusB = corpus.withColumn("bucket", nearestCid(col("vec")))
    val queriesB = queries
      .select(col("qid"), col("qvec"),
        explode(probeCids(col("qvec"))).as("probe"))
      .select(col("qid"), col("qvec"), col("probe.c").as("qbucket"))
    explodeRanked(
      corpusB.join(broadcast(queriesB),
          col("bucket") === col("qbucket") && col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), col("vec")))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: `nBits` sign
    * bits of dot products with deterministic pseudo-random hyperplanes.
    * Hyperplane j's component i is derived from a splitmix64 mix of (i, j)
    * scaled to [-1, 1] — generated on the driver, shipped as literal
    * vectors (tiny: nBits × dim doubles), so every per-row dot is the
    * native codegen'd [[graft.functions.DotProduct]]: the bucketing pass
    * over a 100 TB corpus is one generated-code map, no interpreted
    * lambdas, no side data beyond the literals.
    *
    * @param dim vector dimensionality (hyperplanes are driver-generated)
    * @param firstPlane index of the first hyperplane — band b of an
    *                   OR-amplified multi-table scheme passes b*nBits so
    *                   each band draws DISJOINT planes from the same
    *                   deterministic stream (band 0 ≡ the single-table
    *                   bucketing, so existing callers are unchanged)
    */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int,
      firstPlane: Int = 0): Column = {
    def mix(z0: Long): Double = { // splitmix64 finalizer → [-1, 1]
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
    }
    val bits = (0 until nBits).map { j =>
      val plane =
        Array.tabulate(dim)(i => mix(i.toLong * 0x100000001bL + (firstPlane + j)))
      when(DotProduct(vec, typedlit(plane)) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding near-DUP pairs at scale: (a < b) with cosine >=
    * `threshold`, candidates generated by a hyperplane-LSH bucket
    * self-join (vectors at small angles collide) and verified with the
    * exact codegen'd cosine — the embedding twin of
    * [[graft.ops.Dedup.minhashLshPairs]]: equi-join-shaped candidate
    * generation, never all-pairs.
    *
    * Scale machinery shared with [[knnGraph]] (same rationale, see its
    * scaladoc): `nBits = 0` derives the bucket width from the corpus
    * (`ceil(log2(N/64))` clamped [4, 20] — constant mean bucket
    * population, linear candidate volume; a FIXED width makes the
    * self-join quadratic in N: measured 3.9× pairs time at 3× rows at
    * nBits=4), `bands` OR-amplifies recall (a pair is a candidate if it
    * collides in ANY band; duplicates fold in the (a, b) aggregate
    * before the threshold filter), and over-`capPerBucket` buckets thin
    * their candidate side by the deterministic xxhash gate so a
    * degenerate angular distribution cannot go quadratic. Recall: at
    * dedup thresholds (cos → 1) per-band collision stays near 1 at any
    * derived width, so bands = 1–2 suffices; moderate thresholds trade
    * recall for scale and buy it back with more bands.
    */
  def embeddingDupPairs(corpus0: DataFrame, nBits: Int, dim: Int,
      threshold: Double, bands: Int = 1, capPerBucket: Int = 1024): DataFrame = {
    val corpus = wf(corpus0, "vec")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(capPerBucket >= 1, s"capPerBucket must be >= 1, got $capPerBucket")
    require(nBits >= 0, s"nBits must be >= 0 (0 = derive from corpus size), got $nBits")
    val bits =
      if (nBits > 0) nBits
      else {
        // RAW row count, above the validity filter: a bare parquet count
        // is metadata-only, while counting the filtered frame would decode
        // every vector just to size buckets (+65% on x36 at sf0.1, a full
        // extra embedding-column pass at 100 TB). Malformed rows are a
        // sliver; the log2-derived width cannot move by a whole bit unless
        // they were half the corpus.
        val n = corpus0.count()
        math.min(20, math.max(4,
          math.ceil(math.log(math.max(1.0, n.toDouble / 64.0)) / math.log(2.0)).toInt))
      }
    val buckets = array((0 until bands).map(b =>
      hyperplaneBucket(col("vec"), bits, dim, firstPlane = b * bits)): _*)
    val bucketed = corpus
      .select(col("id"), col("vec"), posexplode(buckets))
      .select(col("id"), col("vec"), col("pos").as("band"), col("col").as("bucket"))
      .repartition(col("band"), col("bucket")) // one reused exchange: both sides + pops
    val pops = bucketed.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__pop"))
    val cand = bucketed.join(pops, Seq("band", "bucket"))
      .filter(col("__pop") <= capPerBucket ||
        pmod(xxhash64(col("id"), col("band"), col("bucket")), col("__pop"))
          < capPerBucket)
      .drop("__pop")
    bucketed.as("l")
      .join(cand.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        cosine(col("l.vec"), col("r.vec")).as("cos"))
      .groupBy(col("a"), col("b")).agg(max(col("cos")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** SEMDEDUP (Abbas et al. 2023-style semantic deduplication): drop a
    * vector when its k-means cluster contains a LOWER-id vector within
    * cosine `threshold` — the embedding-space analog of near-dup text
    * removal, catching paraphrases that lexical dedup can't see. The
    * min-id keep rule makes the output a pure function of the data: a
    * vector is dropped iff ANY smaller-id cluster-mate is within the
    * radius (whether or not that mate itself survives), which also
    * guarantees survivors are pairwise > threshold apart within every
    * cluster — the invariant the paired check query re-verifies.
    *
    * Emits every corpus row as (vec_id, cid, dropped).
    *
    * Scale: this is the reason SemDeDup clusters first — pairwise cosine
    * happens only WITHIN a cluster, so cost is Σ|cluster|², bounded by
    * growing k with the corpus (the paper's regime: k ~ sqrt(N) keeps
    * clusters near-constant). The plan is one repartition(cid) whose
    * exchange both self-join sides reuse, a codegen'd dot-product filter
    * on unit vectors, and an aggregate-then-anti-join — no all-pairs path
    * and nothing driver-side except the (driver-held, trained) centers.
    */
  def semDedup(corpus0: DataFrame, centers: Array[Array[Double]],
      threshold: Double): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val unit = corpus
      .select(col("id"), L2Normalize(col("vec")).as("unit"))
      .select(col("id"), col("unit"),
        Clustering.assignTo(col("unit"), centers).as("cid"))
      .repartition(col("cid")) // one exchange, reused by both join sides
    val dropped = unit.as("l")
      .join(unit.as("r"), col("l.cid") === col("r.cid")
        && col("l.id") < col("r.id")
        && DotProduct(col("l.unit"), col("r.unit")) > threshold)
      .select(col("r.id").as("id")).distinct()
      .withColumn("__dropped", lit(true))
    unit.select(col("id").as("vec_id"), col("cid"))
      .join(dropped.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("__dropped"), lit(false)).as("dropped"))
  }

  /** Semantic benchmark DECONTAMINATION — the embedding analog of
    * [[graft.ops.Dedup.decontaminate]]: drop every corpus vector whose
    * cosine to ANY eval-set vector exceeds `threshold` (a paraphrased
    * benchmark item survives lexical decontamination; it does not survive
    * this). Keeps the corpus rows that are clean.
    *
    * Scale: an eval set is small by definition (benchmarks are thousands
    * of items), so it rides with the planner as driver-held literals —
    * the corpus pass is MAP-ONLY: one codegen'd max-dot filter, zero
    * shuffle, zero join, nothing collected (the same play as
    * [[ivfTopK]]'s centroid routing). The guard is 4096, the same
    * janino-realistic bound as [[ivfTopK]]; for an eval set beyond it,
    * the fallbacks are a broadcast join + max aggregate, or the
    * [[embeddingDupPairs]] LSH prefilter; both stay corpus-shuffle-free.
    *
    * The scoring pass rides [[graft.functions.NearestCenter]] over the
    * driver-normalized eval matrix: `max_v cos(x, v) <= t` is evaluated
    * as `max_v dot(x, v/|v|) <= t * |x|` — ONE tight primitive loop per
    * row (one array decode, |eval|·dim multiply-adds) instead of |eval|
    * separate cosine expressions each re-decoding the row vector and
    * re-deriving its norm (measured ~4x on a 50 x 64-dim eval set at
    * 200k corpus rows). A zero-norm corpus row is dropped, matching the
    * greatest-of-cosines form it replaces (every cosine NaN -> filter
    * false under Spark's NaN ordering).
    */
  def semanticDecontaminate(corpus: DataFrame, evalVecs: Array[Array[Float]],
      threshold: Double): DataFrame = {
    require(evalVecs.nonEmpty && evalVecs.length <= 4096,
      s"eval set must have 1..4096 driver-held vectors, got ${evalVecs.length}")
    val normalized = evalVecs.map { v =>
      var n2 = 0.0
      var i = 0
      while (i < v.length) { n2 += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(n2)
      v.map(x => if (n == 0.0) 0.0 else x.toDouble / n)
    }
    val maxDot = NearestCenter(col("vec"), normalized,
      Array.fill(normalized.length)(0.0)).getField("score")
    val norm = sqrt(DotProduct(col("vec"), col("vec")))
    corpus.filter(norm > lit(0.0) && maxDot <= lit(threshold) * norm)
  }

  /** Product quantization: split each vector into `m` contiguous
    * subvectors and replace each with the index of its nearest codebook
    * entry (argmax cosine over that subvector's codebook, deterministic
    * index tiebreak — the same literal-argmax shape as [[ivfTopK]]'s
    * centroid routing, codegen'd, map-only). At scale this is the memory
    * play of ANN indexes: a d-float vector becomes m small ints, so a
    * 100 TB embedding corpus holds its index in RAM.
    *
    * @param codebooks codebooks(j) = the entries for subvector j, each of
    *                  dimension d/m; driver-held literals (k-means output,
    *                  small by construction — guarded)
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    require(codebooks.nonEmpty && codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
      "each subvector codebook must have 1..256 entries")
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      val slice0 = slice(vec, j * sub + 1, sub)
      val sims = array(cb.map(entry => cosine(slice0, typedlit(entry))): _*)
      (array_position(sims, array_max(sims)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** Reconstruct the quantized vector from its PQ codes: concatenate the
    * selected codebook entries. Pure codegen'd `element_at` over literal
    * arrays — the decode step of reconstruction-based ADC scoring.
    */
  def pqReconstruct(codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    concat(codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(typedlit(cb), element_at(codes, j + 1) + 1)
    }: _*)

  /** PQ-based ANN top-k: score each query against the RECONSTRUCTED
    * corpus vectors (reconstruction-based asymmetric distance — the query
    * stays exact, the corpus is m bytes/vector), then exact re-rank is the
    * caller's option. Same broadcast + bounded-aggregate shape as
    * [[bruteForceTopK]]; the whole scoring pass is generated code over
    * literal codebooks, no side joins.
    */
  def pqTopK(corpus0: DataFrame, queries0: DataFrame,
      codebooks: Array[Array[Array[Float]]], k: Int): DataFrame = {
    val queries = wf(queries0, "qvec")
    // reconstruct ONCE per corpus row, BELOW the query join: the decode is
    // a pure function of the codes, and evaluating it in the join's output
    // projection re-ran the 2·d element_at/concat construction once per
    // (candidate, query) PAIR — |queries|× the necessary work (measured in
    // the executed plan; same expression, so scores are bit-identical).
    // The reconstructed vector lives only in-flight inside the same
    // codegen stage — the stored index is still m codes per vector.
    val coded = wf(corpus0, "vec")
      .select(col("id"), pqEncode(col("vec"), codebooks).as("codes"))
      .select(col("id"), pqReconstruct(col("codes"), codebooks).as("rvec"))
    explodeRanked(
      coded.join(broadcast(queries), col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), col("rvec")))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** IVF-PQ composite ANN — the FAISS `IndexIVFPQ` shape re-expressed on
    * Spark: the corpus is routed ONCE into IVF buckets (map-only codegen'd
    * literal-argmax over the driver-held k-means centroids, as in
    * [[ivfTopK]]) and in the same pass product-quantized to m small ints
    * ([[pqEncode]] over literal codebooks); each query probes its `nprobe`
    * nearest buckets ([[ivfProbeTopK]]'s exploded equi-join — never an
    * `array_contains` theta-join) and scores only those buckets' members by
    * reconstruction-based asymmetric distance (query exact, candidate
    * reconstructed from its codes).
    *
    * The two index structures compose multiplicatively at 100 TB: IVF cuts
    * the scanned FRACTION to ~nprobe/nlist, PQ cuts the BYTES per scanned
    * candidate from 4·d to m — so the serving scan is one generated-code
    * map over an index that fits in RAM, and the only shuffle anywhere is
    * the bounded top-k aggregate (≤ k rows per query per mapper).
    *
    * Cosine geometry throughout (spherical k-means centroids and
    * codebooks), so candidates are encoded directly rather than as coarse
    * residuals: FAISS's L2 residual encoding has no cosine analogue — the
    * angle, unlike the squared distance, does not decompose around the
    * assigned centroid.
    */
  def ivfPqTopK(corpus0: DataFrame, queries0: DataFrame, centroids: DataFrame,
      codebooks: Array[Array[Array[Float]]], k: Int, nprobe: Int): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val queries = wf(queries0, "qvec")
    val centers = collectCenters(centroids)
    require(nprobe >= 1 && nprobe <= centers.length,
      s"nprobe must be in [1, ${centers.length}], got $nprobe")

    def nearestCid(vec: Column): Column = {
      val sims = array(centers.map { case (_, cvec) => cosine(vec, typedlit(cvec)) }: _*)
      val pos = array_position(sims, array_max(sims)).cast("int")
      element_at(typedlit(centers.map(_._1)), pos)
    }
    def probeCids(vec: Column): Column = {
      val entries = array(centers.map { case (cid, cvec) =>
        struct((-cosine(vec, typedlit(cvec))).as("negs"), lit(cid).as("c"))
      }: _*)
      slice(sort_array(entries), 1, nprobe)
    }

    // one map pass builds BOTH index structures for a corpus row. The PQ
    // decode stays in the JOIN projection here — the OPPOSITE of pqTopK's
    // below-the-join placement, deliberately: this bucket equi-join is
    // SELECTIVE (a corpus row in a bucket no query probes matches
    // nothing), so decoding below the join would reconstruct EVERY corpus
    // row including the never-probed majority — measured +15-25% on the
    // x33 check at sf1 when tried. pqTopK's id =!= qid join matches every
    // row |queries| times, which is why the trade flips there.
    val corpusB = corpus.select(col("id"),
      nearestCid(col("vec")).as("bucket"),
      pqEncode(col("vec"), codebooks).as("codes"))
    val queriesB = queries
      .select(col("qid"), col("qvec"), explode(probeCids(col("qvec"))).as("probe"))
      .select(col("qid"), col("qvec"), col("probe.c").as("qbucket"))
    explodeRanked(
      corpusB.join(broadcast(queriesB),
          col("bucket") === col("qbucket") && col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), pqReconstruct(col("codes"), codebooks)))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** ANN via random-hyperplane LSH: bucket corpus and queries by
    * [[hyperplaneBucket]] sign bits (vectors with small angles collide),
    * then exact top-k within each query's bucket. Scans ~corpus/2^nBits
    * per query; same broadcast + bounded-aggregate shape as [[ivfTopK]]
    * but with zero side data (the hyperplanes are hash-derived).
    */
  def hyperplaneTopK(corpus0: DataFrame, queries0: DataFrame, nBits: Int, dim: Int,
      k: Int): DataFrame =
    explodeRanked(
      wf(corpus0, "vec").withColumn("bucket", hyperplaneBucket(col("vec"), nBits, dim))
        .join(broadcast(wf(queries0, "qvec")
            .select(col("qid"), col("qvec"),
              hyperplaneBucket(col("qvec"), nBits, dim).as("bucket"))),
          Seq("bucket"))
        .filter(col("id") =!= col("qid"))
        .withColumn("sim", cosine(col("qvec"), col("vec")))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))

  /** ADC-style brute-force top-k over the INT8-QUANTIZED corpus — the
    * serving-side payoff of [[graft.functions.QuantizeInt8]]'s 4× storage
    * cut: the corpus is scanned as (mn, sc, codes) and NEVER dequantized.
    * cos(q, mn + sc·c) expands algebraically to
    * `(mn·Σq + sc·⟨q,c⟩) / (‖q‖ · sqrt(n·mn² + 2·mn·sc·Σc + sc²·Σc²))`,
    * so the per-candidate work is ONE native codegen'd dot product over
    * the int codes plus O(1) arithmetic on per-row constants. Σc and Σc²
    * are computed once per CORPUS row in the quantization projection
    * (below the join — never per pair); the interpreted `aggregate` HOF
    * there is a build-side cost, like the k-means trainer's.
    *
    * Exactly equal (to fp rounding) to scoring the dequantized vectors,
    * which is what the DuckDB oracle does; same broadcast + bounded top-k
    * shape as [[bruteForceTopK]]. In a persisted index the (mn, sc,
    * codes) projection is written once and this becomes a pure scan of
    * ~n+16 bytes per vector instead of 4·d.
    */
  def quantizedTopK(corpus0: DataFrame, queries0: DataFrame, k: Int): DataFrame = {
    val corpus = wf(corpus0, "vec")
    val queries = wf(queries0, "qvec")
    val mn0 = array_min(col("vec")).cast("double")
    val mx0 = array_max(col("vec")).cast("double")
    def codesD = col("codes").cast("array<double>")
    // the int→double code cast happens ONCE per corpus row (kept as the
    // `codesd` column riding the broadcast join), not once per
    // (candidate, query) pair in the scoring projection — |queries|× less
    // array re-materialization for the same bit-identical scores
    val coded = corpus
      .select(col("id"), mn0.as("mn"), ((mx0 - mn0) / 255.0).as("sc"),
        QuantizeInt8(col("vec")).as("codes"))
      .select(col("id"), col("mn"), col("sc"), codesD.as("codesd"),
        size(col("codes")).cast("double").as("n"),
        aggregate(codesD, lit(0.0), (a, c) => a + c).as("sc1"),
        DotProduct(codesD, codesD).as("sc2"))
    val qs = queries.select(col("qid"),
      col("qvec"),
      aggregate(col("qvec").cast("array<double>"), lit(0.0), (a, x) => a + x).as("sq"),
      sqrt(DotProduct(col("qvec"), col("qvec"))).as("qnorm"))
    explodeRanked(
      coded.join(broadcast(qs), col("id") =!= col("qid"))
        .withColumn("sim",
          (col("mn") * col("sq") + col("sc") * DotProduct(col("qvec"), col("codesd"))) /
            (col("qnorm") * sqrt(col("n") * col("mn") * col("mn")
              + lit(2.0) * col("mn") * col("sc") * col("sc1")
              + col("sc") * col("sc") * col("sc2"))))
        .groupBy("qid")
        .agg(TopKByScore(k)(col("sim"), col("id")).as("hits")))
  }

  /** k-NN GRAPH over the corpus itself — every vector's k nearest
    * neighbors as directed out-edges: the input structure for graph-based
    * clustering, SemDeDup variants, hubness diagnostics and
    * connectivity-based curation. Candidates come from an OR-amplified
    * hyperplane-LSH self-join: `bands` independent hash tables (disjoint
    * plane ranges of the same deterministic stream), a pair collides if
    * ANY band buckets it together — miss probability for a pair with
    * collision rate p per band is (1-p^1)^bands, the recall knob that a
    * single table lacks. The exploded (band, bucket) key keeps candidate
    * generation ONE equi-join on ONE reused exchange (never all-pairs,
    * never `array_contains`); pairs found by several bands collapse
    * through a (src, dst) hash aggregate BEFORE the bounded per-source
    * top-k, so OR-amplification costs shuffle volume proportional to
    * true collisions, not to bands × corpus².
    *
    * HOT-BUCKET CAP: `nBits` bounds bucket population only
    * probabilistically — a degenerate embedding distribution (many
    * near-identical vectors) lands one bucket with O(corpus) members and
    * the self-join goes quadratic. So the CANDIDATE (dst) side of every
    * (band, bucket) over `capPerBucket` members is thinned to ~cap by a
    * deterministic hash gate (`xxhash64(id, band, bucket) mod pop < cap`
    * — no RNG, no Window, same graph on every run/engine), while the
    * source side keeps ALL members: every vector still probes its
    * buckets, against at most ~cap candidates, so worst-case pair count
    * is corpus × cap × bands — LINEAR in the corpus — and no vector
    * loses graph coverage. Members of an over-cap bucket are
    * near-interchangeable by construction (that is what made the bucket
    * hot), so top-k quality degrades gracefully, not catastrophically.
    * The population aggregate and the gate join both ride the same
    * (band, bucket) exchange the self-join already needs.
    *
    * SCALE-DERIVED nBits: pass `nBits = 0` and the bucket-key width is
    * derived from the corpus itself — `ceil(log2(N / 64))` clamped to
    * [4, 20], i.e. one cheap columnar count() sizes the tables so MEAN
    * bucket population stays ~64 regardless of corpus size. A fixed
    * nBits makes bucket population grow linearly with N and the
    * self-join quadratically (measured 23× time for 10× rows at
    * nBits=4 in the sf1 rehearsal); the derived width keeps candidate
    * volume ~N × 64 × bands — linear by construction, before the
    * hot-bucket cap even engages. This is the knob a 1000-executor run
    * over 100 TB would set exactly this way.
    */
  def knnGraph(corpus0: DataFrame, nBits: Int, dim: Int, k: Int,
      bands: Int = 1, capPerBucket: Int = 1024): DataFrame = {
    val corpus = wf(corpus0, "vec")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(capPerBucket >= 1, s"capPerBucket must be >= 1, got $capPerBucket")
    require(nBits >= 0, s"nBits must be >= 0 (0 = derive from corpus size), got $nBits")
    val bits =
      if (nBits > 0) nBits
      else {
        // raw count for width derivation — see [[embeddingDupPairs]]
        val n = corpus0.count()
        math.min(20, math.max(4,
          math.ceil(math.log(math.max(1.0, n.toDouble / 64.0)) / math.log(2.0)).toInt))
      }
    val buckets = array((0 until bands).map(b =>
      hyperplaneBucket(col("vec"), bits, dim, firstPlane = b * bits)): _*)
    val exploded = corpus
      .select(col("id"), col("vec"), posexplode(buckets))
      .select(col("id"), col("vec"), col("pos").as("band"), col("col").as("bucket"))
      .repartition(col("band"), col("bucket")) // one exchange, both join sides
    val pops = exploded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__pop"))
    val cand = exploded.join(pops, Seq("band", "bucket"))
      .filter(col("__pop") <= capPerBucket ||
        pmod(xxhash64(col("id"), col("band"), col("bucket")), col("__pop"))
          < capPerBucket)
      .drop("__pop")
    val edges = exploded.as("l")
      .join(cand.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("src"), col("r.id").as("dst"),
        cosine(col("l.vec"), col("r.vec")).as("sim"))
      .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
    edges.groupBy(col("src"))
      .agg(TopKByScore(k)(col("sim"), col("dst")).as("hits"))
      .select(col("src"), posexplode(col("hits")))
      .select(col("src"), (col("pos") + 1).cast("int").as("rank"),
        col("col").getField("id").as("dst"), col("col").getField("score").as("sim"))
  }
}
