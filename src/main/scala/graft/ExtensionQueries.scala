package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.functions.L2Normalize
import graft.ops.{Classifier, Clustering, Dedup, Graph, Multimodal, Pca, Search, Similarity, TextAnalysis, Texts}

/** Extension operators (SURVEY.md §2.6 X1-X4 + the large-scale training-data
  * pipeline surface): deduplication, similarity search, text analysis,
  * multimodal plumbing. Registered alongside the reference-parity queries.
  */
object ExtensionQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.documents(s, dir)

  /** DuckDB body of the x55 per-document Gopher stats (one definition,
    * shared by the x55 oracle and the v5 composition's gate — no drift).
    * Columns: doc_id, source, n_words, mean_word_len, alpha_ratio,
    * symbol_ratio, stop_hits — the exact mirrors of
    * [[graft.ops.TextAnalysis.gopherRules]]'s expressions.
    */
  private def gopherStatsSql: String = {
    val stopChain = Texts.enStopwords
      .map(w => s"(CASE WHEN contains(' ' || text || ' ', ' $w ') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""SELECT doc_id, source,
       |    len(string_split(text, ' ')) AS n_words,
       |    round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |      / len(string_split(text, ' ')), 4) AS mean_word_len,
       |    round(CAST(len(regexp_extract_all(' ' || text, ' [^ ]*[a-zA-Z][^ ]*')) AS DOUBLE)
       |      / len(string_split(text, ' ')), 4) AS alpha_ratio,
       |    round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
       |      / len(string_split(text, ' ')), 4) AS symbol_ratio,
       |    CAST($stopChain AS BIGINT) AS stop_hits
       |  FROM documents""".stripMargin
  }

  /** Shared oracle CTE chain producing the DF-cut 3-shingle Jaccard pairs
    * (`jp(a, b, jaccard)`), mirrored by `Dedup.ngramJaccardPairs(..., 1000)`.
    * Used by both the pairs query and the canonicalization closure.
    */
  private[graft] val ngramPairsCte: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |ex AS (SELECT DISTINCT doc_id,
      |         unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                 for i in range(1, len(toks) - 1)]) AS s
      |       FROM toks WHERE len(toks) >= 3),
      |kept AS (SELECT doc_id, s FROM ex
      |         QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
      |sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
      |          FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jp AS (SELECT p.a, p.b,
      |         CAST(p.common AS DOUBLE) / CAST(sa.sz + sb.sz - p.common AS DOUBLE) AS jaccard
      |       FROM pairs p
      |       JOIN sz sa ON sa.doc_id = p.a
      |       JOIN sz sb ON sb.doc_id = p.b
      |       WHERE CAST(p.common AS DOUBLE) / CAST(sa.sz + sb.sz - p.common AS DOUBLE) >= 0.3)""".stripMargin

  /** Deterministic PQ codebooks for the catalog query: 4 subvectors of
    * dim 16 over the 64-dim embeddings, each codebook = the matching
    * slices of vec_id 0..7 (the same planner-side seed-vector role as
    * x3b's IVF centroids — in production these are k-means output).
    */
  private[graft] def pqCodebooks(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Array[Float]]] = {
    val seeds = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(seeds.nonEmpty, "pq codebooks need seed vectors")
    val sub = seeds.head.length / 4
    Array.tabulate(4)(j => seeds.map(v => v.slice(j * sub, (j + 1) * sub)))
  }

  /** One trained k-means model per sf dir: an ANN index is trained once
    * and then served by many queries, so the catalog mirrors that — the
    * `x7_kmeans_train` entry pays the full training cost every call (it IS
    * the trainer benchmark), while the trained-index consumers (`x3f_*`,
    * the check queries) share this memo. Training is deterministic
    * (md5-seeded, fixed iteration count/tolerance), so memoization does
    * not change any result.
    */
  private val kmeansMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Clustering.KMeansModel]()
  private[graft] def trainedModel(s: org.apache.spark.sql.SparkSession,
      dir: String): Clustering.KMeansModel =
    kmeansMemo.computeIfAbsent(dir, _ =>
      Clustering.trainKMeans(Tables.embeddings(s, dir),
        col("vec_id"), col("embedding"), k = 8, maxIter = 10))

  /** SemDeDup's OWN clustering, k scale-derived as ~sqrt(N) (clamped to
    * [8, 2048]): SemDeDup's cost is Σ|cluster|² ≈ N²/k, so a FIXED k
    * makes the per-cluster pairwise pass quadratic in the corpus
    * (measured 16× time for 10× rows at k=8 in the sf1 rehearsal) while
    * k ~ sqrt(N) holds both the assignment cost (N·k) and the pairwise
    * cost (N²/k) at N^1.5 — the regime the SemDeDup paper runs (its
    * 100M-scale config keeps clusters near-constant size). Memoized per
    * dir like [[trainedModel]]; the 8-center model stays the shared
    * index for the IVF/mixture consumers whose nprobe/rebalance math
    * expects a small nlist.
    */
  private val semdedupMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Clustering.KMeansModel]()
  private[graft] def semdedupModel(s: org.apache.spark.sql.SparkSession,
      dir: String): Clustering.KMeansModel =
    semdedupMemo.computeIfAbsent(dir, _ => {
      val emb = Tables.embeddings(s, dir)
      val k = math.min(2048L, math.max(8L,
        math.ceil(math.sqrt(emb.count().toDouble)).toLong)).toInt
      Clustering.trainKMeans(emb, col("vec_id"), col("embedding"),
        k = k, maxIter = 10)
    })

  /** Trained PQ codebooks, memoized like [[trainedModel]] (train once,
    * serve many): 4 subvectors of dim 16, 16 entries each, spherical
    * k-means per slice — the in-engine replacement for the seed-slice
    * [[pqCodebooks]] (which stays as the deterministic twin for x3e).
    */
  /** Driver-held eval-set embeddings for x16 (vec_id < 50 plays the
    * benchmark, as in x8) — memoized per sf dir like [[trainedModel]]:
    * an eval set is loaded once and screened against for the life of the
    * pipeline, so per-query re-collection would charge every plan build
    * an extra Spark job. No ordering: max-of-cosines is order-insensitive.
    */
  private val evalVecMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()
  private[graft] def evalVectors(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Float]] =
    evalVecMemo.computeIfAbsent(dir, _ =>
      Tables.embeddings(s, dir).filter(col("vec_id") < 50)
        .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray))

  /** One trained BPE merge table per sf dir, memoized like [[trainedModel]]
    * (a tokenizer is trained once per corpus and applied everywhere).
    * Training is deterministic (count-desc/lex tie-breaks all the way
    * down), so memoization changes no result.
    */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private[graft] def trainedBpe(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] =
    bpeMemo.computeIfAbsent(dir, _ =>
      TextAnalysis.bpeTrain(col("text"), numMerges = 200)(docs(s, dir)))

  /** One trained quality classifier per sf dir (teacher labels = the x4c
    * heuristic at its corpus median ~0.47 — the public distill-a-heuristic
    * pattern), memoized like [[trainedModel]]. 40 full-gradient steps at
    * lr 0.1 — the rate is sized to the unscaled mean_token_len feature
    * (~5), where 0.5 visibly oscillates on the fixture.
    */
  /** The x8/x25 decontamination oracle, shared verbatim so the Bloom-planned
    * variant is checked against EXACTLY the exact plan's contract: mirror
    * of Texts.explodedShingles at n=8 (1-indexed starts 1..len-7,
    * space-joined; docs shorter than 8 tokens have no shingles and are
    * trivially clean); doc_id < 50 plays the benchmark set.
    */
  private[graft] val decontOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest([array_to_string(toks[i:i+7], ' ')
      |                 for i in range(1, len(toks) - 6)]) AS s
      |       FROM toks WHERE len(toks) >= 8),
      |bs AS (SELECT DISTINCT s FROM sh WHERE doc_id < 50),
      |bad AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bs USING (s)
      |        WHERE sh.doc_id >= 50)
      |SELECT doc_id, lang, source FROM documents
      |WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin

  /** One benchmark-shingle Bloom filter per sf dir, memoized like
    * [[trainedModel]] (an eval-set index is built once per release and
    * probed by every ingest batch). Deterministic build, so memoization
    * changes no result.
    */
  private val bloomMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.util.sketch.BloomFilter]()
  private[graft] def benchBloom(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.util.sketch.BloomFilter =
    bloomMemo.computeIfAbsent(dir, _ =>
      Dedup.buildBenchBloom(col("doc_id"), col("text"), 8, fpp = 0.01)(
        docs(s, dir).filter(col("doc_id") < 50)))

  /** One corpus token count-min sketch (plus the exact total-token count
    * that sizes the heavy-hitter threshold) per sf dir, memoized like
    * [[trainedModel]]. Seeded build — deterministic. The memo holds the
    * raw sketch: the codegen probe ([[graft.functions.CmsEstimateCount]])
    * ships it with the stage's broadcast task binary, so the session
    * never allocates a `SparkContext.broadcast` handle for it at all
    * (per-call broadcasts only free on driver GC and accumulated across
    * a 140-query catalog run twice by Bench).
    */
  private val cmsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.util.sketch.CountMinSketch, Long)]()
  private[graft] def tokenCms(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.util.sketch.CountMinSketch, Long) =
    cmsMemo.computeIfAbsent(dir, _ => {
      val d = docs(s, dir)
      val total = d.select(sum(size(Texts.tokens(col("text")))).cast("long"))
        .head().getLong(0)
      (TextAnalysis.buildTokenCms(col("text"), eps = 1e-4, confidence = 0.99)(d),
        math.ceil(total * 0.02).toLong)
    })

  /** One PCA model per sf dir over the embeddings table, memoized like
    * [[trainedModel]] (fit once, project everywhere). The fit is
    * deterministic: one exact moment pass + cyclic Jacobi with canonical
    * sign fix.
    */
  private val pcaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Pca.PcaModel]()
  private[graft] def pcaModel(s: org.apache.spark.sql.SparkSession,
      dir: String): Pca.PcaModel =
    pcaMemo.computeIfAbsent(dir, _ =>
      Pca.fit(Tables.embeddings(s, dir), col("embedding"), k = 4))

  private val lrMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Classifier.LogRegModel]()
  private[graft] def trainedLr(s: org.apache.spark.sql.SparkSession,
      dir: String): Classifier.LogRegModel =
    lrMemo.computeIfAbsent(dir, _ => {
      val q = TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir))
      Classifier.trainLogReg(
        Seq(col("diversity"), col("stop_ratio"), col("mean_token_len")),
        col("quality") >= 0.47, iters = 40, lr = 0.1)(q)
    })

  /** Symmetrized part co-purchase graph: distinct part pairs sharing an
    * order, both directions. The orderkey self-join rides ONE reused
    * exchange (both sides repartitioned identically); pair fan-out is
    * bounded by items-per-order (≤ 7 in the fixture, so ≤ 21 pairs/order).
    */
  private[graft] def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(col("o"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The x24 rank vector, memoized per sf dir for its consumers (the
    * check query): like the k-means index, a rank vector is computed once
    * per graph and served — `x24_pagerank` itself pays the full iteration
    * cost every call (it IS the PageRank benchmark). Deterministic (fixed
    * iteration count, deterministic edge build), so memoization changes
    * no result.
    *
    * The memo holds the COLLECTED (id, rank) array — |V|-sized, two words
    * per node — and rebuilds a DataFrame per call via `createDataset`.
    * Never a checkpointed Dataset: a `localCheckpoint` is unrecoverable
    * once any housekeeping (Bench/Verify inter-query unpersist) drops its
    * blocks, whereas a parallelized local array is always rebuildable.
    */
  private val prMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Double)]]()
  private[graft] def pagerankRanks(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ranks = prMemo.computeIfAbsent(dir, _ =>
      Graph.pageRank(coPurchaseEdges(s, dir), iters = 8)
        .select(col("id").cast("long"), col("rank").cast("double"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))))
    import s.implicits._
    s.createDataset(ranks.toIndexedSeq).toDF("id", "rank")
  }

  /** Near-dup pair set of the documents corpus (x2's generator with the
    * catalog's canonical parameters), memoized per dir: the pair set is
    * the shared input artifact of the whole dedup-downstream family —
    * canonicalization (x2e), the leakage audit (x38), the leakage-free
    * split (x42), recall checks — and a real pipeline computes it ONCE
    * and serves every consumer, exactly like the k-means/pagerank memos
    * above ("train once, serve many"). `x2_ngram_jaccard` itself does
    * NOT ride the memo — it IS the pair-generation benchmark and pays
    * the full pipeline every call.
    *
    * Driver-side values only (same rationale as [[pagerankRanks]]):
    * the memo holds the collected (a, b, jaccard) array — sized by the
    * DUPLICATE count, not the corpus (near-dup pairs are a small
    * fraction by construction; the same edge-bounded argument as
    * [[graft.ops.Dedup.canonicalize]]'s driver path) — and rebuilds a
    * frame per call. A corpus whose pair set exceeds `maxDriverPairs`
    * skips the memo and hands consumers the distributed pipeline
    * unmaterialized (correct, just uncached), so the memo can never
    * become a driver-heap hazard at scale.
    */
  private val pairsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Long, Double)]]()
  private val maxDriverPairs = 4000000
  private[graft] def nearDupPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    def pipeline = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3,
      maxShingleDf = 1000L)(docs(s, dir))
    val cached = pairsMemo.get(dir)
    val arr = if (cached != null) cached else {
      val taken = pipeline
        .select(col("a").cast("long"), col("b").cast("long"), col("jaccard"))
        .limit(maxDriverPairs + 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      if (taken.length > maxDriverPairs) null
      else { pairsMemo.putIfAbsent(dir, taken); taken }
    }
    if (arr == null) pipeline
    else {
      import s.implicits._
      s.createDataset(arr.toIndexedSeq).toDF("a", "b", "jaccard")
    }
  }

  private val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Float]]]]()
  private[graft] def trainedPqCodebooks(s: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Array[Float]]] =
    pqMemo.computeIfAbsent(dir, _ =>
      Clustering.trainPqCodebooks(Tables.embeddings(s, dir),
        col("vec_id"), col("embedding"), m = 4, k = 16, dim = 64, maxIter = 5))

  /** Shared oracle CTE chain for the UniMax water-filling derivation
    * (mirrors `TextAnalysis.unimaxWeights` at E = 2, budget = 1.5× total):
    * expects a prior CTE `toks(doc_id, lang, n_tokens)`; yields `cp(doc_id,
    * lang, n_copies)` consumed by [[unimaxSelect]]. Cap decision in BIGINT,
    * uncapped weight = two fixed-order IEEE divisions, copy thresholds on
    * the same md5 grid as `epochsByWeight` — all engine-identical.
    */
  private[graft] val unimaxChainCte: String =
    """tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total
      |        FROM toks GROUP BY 1 HAVING sum(n_tokens) > 0),
      |b AS (SELECT CAST(floor(1.5 * CAST(sum(total) AS DOUBLE)) AS BIGINT) AS budget,
      |             count(*) AS n FROM tot),
      |ord AS (SELECT lang, total, 2 * total AS c,
      |          row_number() OVER (ORDER BY 2 * total, lang) AS i,
      |          coalesce(sum(2 * total) OVER (ORDER BY 2 * total, lang
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |        FROM tot),
      |pref AS (SELECT ord.*, bool_and(c * (b.n - i + 1) + cum <= b.budget)
      |                 OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
      |                       AND CURRENT ROW) AS capped
      |         FROM ord, b),
      |agg AS (SELECT coalesce(sum(CASE WHEN capped THEN c END), 0) AS cumcap,
      |               count(*) FILTER (WHERE NOT capped) AS nun FROM pref),
      |w AS (SELECT p.lang,
      |        CASE WHEN p.capped THEN CAST(2 AS DOUBLE)
      |             ELSE CAST(b.budget - a.cumcap AS DOUBLE)
      |                  / CAST(a.nun AS DOUBLE) / CAST(p.total AS DOUBLE)
      |        END AS w
      |      FROM pref p, agg a, b),
      |cp AS (SELECT d.doc_id, d.lang,
      |         CAST(floor(w.w) AS INT)
      |         + CASE WHEN CAST(floor((w.w - floor(w.w)) * 16777216) AS BIGINT) > 0
      |                 AND md5(CAST(d.doc_id AS VARCHAR) || ':epoch')
      |                   < lower(lpad(to_hex(CAST(floor((w.w - floor(w.w))
      |                                  * 16777216) AS BIGINT)), 6, '0'))
      |                THEN 1 ELSE 0 END AS n_copies
      |       FROM toks d JOIN w ON d.lang = w.lang)""".stripMargin

  private[graft] val unimaxSelect: String =
    """SELECT doc_id, lang AS part, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
      |FROM cp WHERE n_copies >= 1""".stripMargin

  val all: Seq[Q] = Seq(

    // ================= X1/X2 deduplication =================

    Q("x1_dedup_exact",
      (s, dir) => Dedup.exact(Seq(col("lang"), col("source")), col("doc_id"))(docs(s, dir))
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""SELECT doc_id, lang, source FROM documents
             |QUALIFY row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1""".stripMargin),
      "X1 exact dedup with deterministic survivor (hash-groupBy per key)"),

    Q("x2_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3,
        maxShingleDf = 1000L)(docs(s, dir)),
      // The DF cut (1000) is mirrored in the shared CTE: both engines prune
      // hot shingles before pairing and compute sizes from the PRUNED sets,
      // so the emitted Jaccard is self-consistent. Pairs are generated from
      // exploded shingles (no NaN possible for shingle-less docs — they
      // simply produce no rows).
      Some(s"WITH $ngramPairsCte\nSELECT a, b, jaccard FROM jp"),
      "X2 n-gram (3-token shingle) Jaccard near-dup pairs with hot-shingle DF cut, all-integer until final division"),

    Q("x2e_dedup_canonical",
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = nearDupPairs(s, dir) // shared pair artifact (see memo)
        Dedup.canonicalize(d.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("canonical"))
      },
      // Oracle: transitive closure of the near-dup graph via recursive CTE;
      // canonical = min id reachable (or self for singletons).
      Some(s"""WITH RECURSIVE $ngramPairsCte,
              |edges AS (SELECT a AS x, b AS y FROM jp UNION SELECT b, a FROM jp),
              |reach AS (SELECT x, y FROM edges
              |          UNION
              |          SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x)
              |SELECT d.doc_id, least(d.doc_id, coalesce(min(r.y), d.doc_id)) AS canonical
              |FROM documents d LEFT JOIN reach r ON r.x = d.doc_id
              |GROUP BY d.doc_id""".stripMargin),
      "X1/X2 duplicate-cluster canonicalization: connected components by min-label propagation"),

    Q("x21_incremental_dedup",
      (s, dir) => {
        // doc_id >= 400 plays the incoming ingest batch; the rest is the
        // accumulated corpus, represented at the join only by its distinct
        // content fingerprints (the side table a streaming ingest keeps)
        val d = docs(s, dir)
        Dedup.exactIncremental(Seq(md5(col("text"))), col("doc_id"),
            d.filter(col("doc_id") < 400))(d.filter(col("doc_id") >= 400))
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some("""SELECT doc_id, lang, source FROM (
             |  SELECT doc_id, lang, source, md5(text) AS fp
             |  FROM documents WHERE doc_id >= 400) i
             |WHERE fp NOT IN (SELECT DISTINCT md5(text)
             |                 FROM documents WHERE doc_id < 400)
             |QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1""".stripMargin),
      "X1 incremental exact dedup: anti join of the ingest batch against the " +
        "corpus's distinct-fingerprint side table, then in-batch dedup — " +
        "history is never re-scanned"),

    Q("x21b_lsh_incremental",
      (s, dir) => {
        // the near-dup half of the x21 ingest story: the corpus (< 400)
        // is represented ONLY by its two persisted derivatives — the LSH
        // bucket index and the shingle side table; signatures are computed
        // for the ingest batch alone. Sketch-based → no_oracle;
        // x21b_lsh_incr_check pins equality with the full recompute.
        val d = docs(s, dir)
        val corpus = d.filter(col("doc_id") < 400)
        Dedup.minhashLshIncremental(col("doc_id"), col("text"), 3, 16, 4, 0.3,
            Dedup.lshIndex(col("doc_id"), col("text"), 3, 16, 4)(corpus),
            Dedup.shingleTable(col("doc_id"), col("text"), 3)(corpus))(
            d.filter(col("doc_id") >= 400))
      },
      None,
      "X2 incremental MinHash-LSH: ingest batch screened against the " +
        "corpus's persisted bucket index + shingle table — history is " +
        "never re-hashed"),

    Q("x8_decontaminate",
      (s, dir) => {
        val d = docs(s, dir)
        // doc_id < 50 plays the benchmark/eval set; the rest is the corpus
        Dedup.decontaminate(col("doc_id"), col("text"), 8)(
            d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50))
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(decontOracleSql),
      "X1/X2 benchmark decontamination: drop corpus docs sharing any 8-token " +
        "shingle with the eval set (broadcast semi-join, corpus never shuffled)"),

    Q("x2b_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(col("doc_id"), col("text"), 3, 16, 4, 0.3)(docs(s, dir)),
      None, // xxhash64-based signatures are not reproducible in DuckDB SQL
      "X2 MinHash(64)+LSH(16 bands x 4) candidates, verified with exact Jaccard"),

    Q("x2c_simhash",
      (s, dir) => Dedup.simhashByDoc(col("doc_id"), col("text"))(docs(s, dir))
        .withColumnRenamed("id", "doc_id"),
      None, // xxhash64-based fingerprint
      "X2 SimHash 64-bit LSH fingerprint per document (explode + one hash-groupBy, codegen'd)"),

    Q("x2d_simhash_pairs",
      (s, dir) => Dedup.simhashPairs(col("doc_id"), col("text"), 3)(docs(s, dir)),
      None, // xxhash64-based fingerprint
      "X2 SimHash near-dup pairs: pigeonhole chunk buckets (Hamming<=3), equi-join candidates, exact verify"),

    // ================= X2 similarity search =================

    Q("x3_cosine_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(corpus, queries, 3)
          .select(col("qid"), col("rank"), col("id"), col("sim"))
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
             |q AS (SELECT id AS qid, vec AS qvec FROM v WHERE id < 5)
             |SELECT qid, rank, id, sim FROM (
             |  SELECT qid, id, list_cosine_similarity(qvec, vec) AS sim,
             |         row_number() OVER (PARTITION BY qid
             |                            ORDER BY list_cosine_similarity(qvec, vec) DESC, id) AS rank
             |  FROM q JOIN v ON id <> qid)
             |WHERE rank <= 3""".stripMargin),
      "X2 exact brute-force cosine top-k (broadcast queries, map-only corpus scan)"),

    Q("x3b_ann_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Similarity.ivfTopK(corpus, queries, centroids, 3)
          .select(col("qid"), col("rank"), col("id"), col("sim"))
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
             |c AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < 8),
             |va AS (SELECT id, vec, cid AS bucket FROM (
             |  SELECT v.id, v.vec, c.cid,
             |         row_number() OVER (PARTITION BY v.id
             |                            ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
             |  FROM v CROSS JOIN c) WHERE rn = 1),
             |q AS (SELECT id AS qid, vec AS qvec, bucket AS qbucket FROM va WHERE id < 5)
             |SELECT qid, rank, id, sim FROM (
             |  SELECT q.qid, va.id, list_cosine_similarity(q.qvec, va.vec) AS sim,
             |         row_number() OVER (PARTITION BY q.qid
             |                            ORDER BY list_cosine_similarity(q.qvec, va.vec) DESC, va.id) AS rank
             |  FROM q JOIN va ON va.bucket = q.qbucket AND va.id <> q.qid)
             |WHERE rank <= 3""".stripMargin),
      "X2 IVF-style ANN: route query to nearest centroid, search only that bucket"),

    Q("x3b2_ann_ivf_probe",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Similarity.ivfProbeTopK(corpus, queries, centroids, 3, nprobe = 2)
          .select(col("qid"), col("rank"), col("id"), col("sim"))
      },
      Some("""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
             |c AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < 8),
             |va AS (SELECT id, vec, cid AS bucket FROM (
             |  SELECT v.id, v.vec, c.cid,
             |         row_number() OVER (PARTITION BY v.id
             |                            ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
             |  FROM v CROSS JOIN c) WHERE rn = 1),
             |qp AS (SELECT id AS qid, vec AS qvec, cid AS qbucket FROM (
             |  SELECT v.id, v.vec, c.cid,
             |         row_number() OVER (PARTITION BY v.id
             |                            ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
             |  FROM v CROSS JOIN c WHERE v.id < 5) WHERE rn <= 2)
             |SELECT qid, rank, id, sim FROM (
             |  SELECT qp.qid, va.id, list_cosine_similarity(qp.qvec, va.vec) AS sim,
             |         row_number() OVER (PARTITION BY qp.qid
             |                            ORDER BY list_cosine_similarity(qp.qvec, va.vec) DESC, va.id) AS rank
             |  FROM qp JOIN va ON va.bucket = qp.qbucket AND va.id <> qp.qid)
             |WHERE rank <= 3""".stripMargin),
      "X2 multi-probe IVF ANN (nprobe=2): query searches its 2 nearest " +
        "centroid buckets — the recall knob, still equi-join-shaped"),

    Q("x3c_ann_hyperplane",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.hyperplaneTopK(corpus, queries, 4, 64, 3)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      None, // xxhash64-derived hyperplanes are not reproducible in DuckDB SQL
      "X2 random-hyperplane LSH ANN: sign-bit buckets, exact top-k within bucket"),

    Q("x3e_ann_pq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.pqTopK(corpus, queries, ExtensionQueries.pqCodebooks(s, dir), 3)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      None, // float-argmin cell assignment is not practically reproducible in SQL
      "X2 PQ ANN: corpus as m small codes, reconstruction-based asymmetric scoring, codegen'd throughout"),

    Q("x6e_pack_sequences",
      (s, dir) => TextAnalysis.packSequences(col("doc_id"), col("text"),
        col("source"), 2048)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, source,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |         md5(CAST(doc_id AS VARCHAR)) AS ord
             |       FROM documents),
             |o AS (SELECT doc_id, source, n_tokens,
             |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
             |      FROM t)
             |SELECT doc_id, source AS part, n_tokens, start_offset,
             |       CAST(floor(start_offset / 2048) AS BIGINT) AS bin
             |FROM o""".stripMargin),
      "X3 sequence packing: concat-and-chunk manifest (md5-deterministic " +
        "order, per-part running offsets, context-window bin)"),

    Q("x6f_repeat_mixture",
      (s, dir) => TextAnalysis.repeatByWeight(col("doc_id"), col("source"),
        Map("src0" -> 2.3, "src1" -> 1.0, "src2" -> 0.5, "src3" -> 3.0))(docs(s, dir)),
      Some {
        val t = TextAnalysis.rateThresholdHex _
        s"""WITH c AS (SELECT doc_id, source,
           |  CASE source
           |    WHEN 'src0' THEN CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':epoch') < '${t(0.3)}' THEN 3 ELSE 2 END
           |    WHEN 'src1' THEN 1
           |    WHEN 'src2' THEN CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':epoch') < '${t(0.5)}' THEN 1 ELSE 0 END
           |    WHEN 'src3' THEN 3
           |    ELSE 0 END AS n_copies
           |  FROM documents)
           |SELECT doc_id, source AS part, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
           |FROM c WHERE n_copies >= 1""".stripMargin
      },
      "X3 fractional epoch weighting: mixture spec -> physical training list " +
        "(floor(w) copies + md5-salted extra epoch), map-only"),

    Q("x7_kmeans_train",
      (s, dir) => {
        // fresh training every call — this entry benchmarks the TRAINER
        val m = Clustering.trainKMeans(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), k = 8, maxIter = 10)
        Tables.embeddings(s, dir)
          .select(col("vec_id"), L2Normalize(col("embedding")).as("unit"))
          .withColumn("sims", Clustering.simsToCenters(col("unit"), m.centers))
          .select(col("vec_id"),
            (array_position(col("sims"), array_max(col("sims"))) - 1)
              .cast("int").as("cid"),
            array_max(col("sims")).as("bsim"))
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("size"), round(avg(col("bsim")), 3).as("avg_sim"))
      },
      None, // Lloyd's iterations are not reproducible in one DuckDB SQL;
            // invariants oracle-checked by x7_kmeans_check
      "X2 distributed spherical k-means trainer (Lloyd's rounds as one-job " +
        "groupBy-aggregates, driver-held centers, codegen'd literal argmax) " +
        "— per-cluster size and mean cosine of the trained index"),

    Q("x3f_ann_ivf_trained",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val centroids = Clustering.centroidsDf(s, trainedModel(s, dir))
        Similarity.ivfTopK(corpus, queries, centroids, 3)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      None, // centroids come from in-engine k-means (not SQL-reproducible);
            // sims re-verified by x3f_ann_check
      "X2 IVF ANN over TRAINED k-means centroids — end-to-end in-engine " +
        "index build + serve (x3b stays as the seeded deterministic twin)"),

    Q("x3g_ann_pq_trained",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.pqTopK(corpus, queries, trainedPqCodebooks(s, dir), 3)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      None, // codebooks come from in-engine k-means (not SQL-reproducible);
            // re-verified by x3g_pq_check
      "X2 PQ ANN over TRAINED codebooks (per-slice spherical k-means) — " +
        "the full in-engine quantized-index build + serve"),

    // ================= X3 text analysis =================

    Q("x4_token_stats",
      (s, dir) => TextAnalysis.tokenStats(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
             |  list_max(list_transform(string_split(text, ' '), t -> length(t))) AS max_token_len,
             |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len
             |FROM documents""".stripMargin),
      "X3 per-document token statistics (all-integer, map-only)"),

    Q("x4b_lang_id",
      (s, dir) => TextAnalysis.langIdEn(col("doc_id"), col("text"))(docs(s, dir)),
      Some(s"""SELECT doc_id,
              |  len(list_filter(string_split(text, ' '), t -> t IN ${Texts.enStopwordsSql})) AS en_hits,
              |  len(string_split(text, ' ')) AS n_tokens,
              |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE)
              |            / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              |       THEN 'en' ELSE 'other' END AS lang_guess
              |FROM documents""".stripMargin),
      "X3 language-ID heuristic via stopword-profile hit ratio"),

    Q("x4c_quality_score",
      (s, dir) => TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir)),
      Some(s"""SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS diversity,
              |  CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
              |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin),
      "X3 quality scoring: diversity + stopword ratio + mean token length"),

    Q("x4d_fingerprint",
      (s, dir) => TextAnalysis.fingerprints(col("doc_id"), col("text"), 10)(docs(s, dir)),
      Some("""SELECT doc_id, md5(text) AS fp,
             |  md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS prefix_fp
             |FROM documents""".stripMargin),
      "X3 document fingerprinting: full digest + token-prefix digest"),

    Q("x3d_embedding_dups",
      (s, dir) => {
        val corpus = Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        // 0.35 ≈ the 99.9th percentile of pairwise cosine on this synthetic
        // corpus — "near-dup" relative to its random baseline. nBits = 0:
        // scale-derived bucket width (fixed 4 bits = 16 buckets made the
        // self-join quadratic in N); bands = 2 OR-amplifies recall back.
        Similarity.embeddingDupPairs(corpus, 0, 64, 0.35, bands = 2)
          .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
      },
      None, // LSH buckets are hash-derived; unit test bounds recall/precision
      "X2 embedding-cosine near-dup pairs: scale-derived hyperplane bucket " +
        "self-join (2-band OR-amplified, hot-bucket capped), exact cosine verify"),

    Q("x4g_rolling_fp",
      (s, dir) => TextAnalysis.rollingFingerprints(col("doc_id"), col("text"), 8)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |             WHERE len(string_split(text, ' ')) >= 8)
             |SELECT doc_id, CAST(i AS INT) AS pos,
             |       md5(array_to_string(toks[i:i+7], ' ')) AS window_fp
             |FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM toks)""".stripMargin),
      "X3 rolling window fingerprints (8-token sliding md5) for partial-overlap detection"),

    Q("x4e_bpeish_count",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(Texts.bpeishTokens(col("text"))).cast("long").as("n_bpeish"),
        size(Texts.tokens(col("text"))).cast("long").as("n_ws")),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS n_bpeish,
             |  len(string_split(text, ' ')) AS n_ws
             |FROM documents""".stripMargin),
      "X3 BPE-ish token counting (pretokenizer split) vs whitespace count, same regex both engines"),

    Q("x4f_normalize",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("norm"))
        .withColumn("n_tokens", size(split(col("norm"), " ")).cast("long")),
      Some("""SELECT doc_id, norm, len(string_split(norm, ' ')) AS n_tokens
             |FROM (SELECT doc_id,
             |        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             |      FROM documents)""".stripMargin),
      "X3 text normalization: lowercase, strip punctuation, squeeze spaces — same regexes both engines"),

    Q("x4h_repetition",
      (s, dir) => TextAnalysis.repetitionRatio(col("doc_id"), col("text"), 2)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |           WHERE len(string_split(text, ' ')) >= 2),
             |g AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS gs
             |      FROM t)
             |SELECT doc_id, len(gs) AS n_ngrams, len(list_distinct(gs)) AS n_distinct,
             |       1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE) AS rep_ratio
             |FROM g""".stripMargin),
      "X3 repeated-bigram fraction (boilerplate / keyword-stuffing / loop filter), one keyed aggregate"),

    Q("x4i_redact_pii",
      (s, dir) => {
        val red = TextAnalysis.redactPii(col("text"))
        docs(s, dir).select(col("doc_id"), red.as("red"),
          regexp_count(red, lit("<EMAIL>|<URL>|<PHONE>")).as("n_tags"))
      },
      Some {
        // build the oracle replace chain from the SAME pattern literals
        val chain = TextAnalysis.piiPatterns.foldLeft("text") {
          case (e, (p, t)) => s"regexp_replace($e, '$p', '$t', 'g')"
        }
        s"""SELECT doc_id, $chain AS red,
           |  len(regexp_extract_all($chain, '<EMAIL>|<URL>|<PHONE>')) AS n_tags
           |FROM documents""".stripMargin
      },
      "X3 PII-shaped span redaction (emails, URLs, phone runs) — same regex literals both engines"),

    Q("x6_curation_pipeline",
      (s, dir) => {
        // The end-to-end curation pass this engine exists for, as ONE
        // declarative plan: normalize → quality-filter → exact-dedup on
        // the normalized fingerprint → deterministic hash sample.
        // Single scan: `qualityExpr` is a scalar computed NEXT TO the
        // passthrough columns (round 2 re-derived norm on both sides of a
        // doc_id self-join just to recover it), so the only exchange in the
        // plan is the dedup window's hash partitioning on the fingerprint.
        // The quality filter runs AFTER the dedup window, which is exact:
        // rows in one fingerprint group share `norm`, hence share `quality`
        // — the whole group passes or fails together, so filtering before
        // or after picking the min-doc_id survivor yields the same set.
        // Placed before, Catalyst would push the predicate below the norm
        // projection and inline the 3-regex normalize chain once per
        // quality term (6×/row, round 2's interpreted-HOF sin in codegen'd
        // form); placed after the window it cannot cross the partition
        // boundary, so normalize runs exactly once per row.
        val normed = docs(s, dir)
          .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("norm"))
        Dedup.exact(Seq(md5(col("norm"))), col("doc_id"))(normed)
          .withColumn("quality", TextAnalysis.qualityExpr(col("norm")))
          .filter(col("quality") >= 0.45 &&
            TextAnalysis.deterministicSample(col("doc_id"), "c0"))
          .select(col("doc_id"), md5(col("norm")).as("norm_fp"), col("quality"))
      },
      Some(s"""WITH normed AS (SELECT doc_id,
              |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
              |       FROM documents),
              |t AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM normed),
              |q AS (SELECT doc_id, norm,
              |        CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |      + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |      + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |      FROM t),
              |kept AS (SELECT * FROM q WHERE quality >= 0.45),
              |deduped AS (SELECT doc_id, norm, quality FROM kept
              |            QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1)
              |SELECT doc_id, md5(norm) AS norm_fp, quality
              |FROM deduped
              |WHERE md5(CAST(doc_id AS VARCHAR)) < 'c0'""".stripMargin),
      "X1-X3 curation composite: normalize -> quality filter -> fingerprint dedup -> deterministic 75% sample"),

    Q("x6b_split_assign",
      (s, dir) => docs(s, dir).select(col("doc_id"),
        TextAnalysis.assignSplit(col("doc_id"),
          Seq(0.8, 0.1, 0.1), Seq("train", "val", "test")).as("split")),
      Some {
        val Seq(t1, t2) = TextAnalysis.splitThresholds(Seq(0.8, 0.1, 0.1))
        s"""SELECT doc_id,
           |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$t1' THEN 'train'
           |       WHEN md5(CAST(doc_id AS VARCHAR)) < '$t2' THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents""".stripMargin
      },
      "deterministic train/val/test split via md5 thresholds — identical routing in both engines"),

    Q("x6c_stratified_sample",
      (s, dir) => docs(s, dir)
        .filter(TextAnalysis.stratifiedSample(col("doc_id"), col("lang"),
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.25, "zh" -> 0.1)))
        .select(col("doc_id"), col("lang"), col("source")),
      Some {
        val t = TextAnalysis.rateThresholdHex _
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE CASE lang
           |  WHEN 'en' THEN TRUE
           |  WHEN 'de' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.5)}'
           |  WHEN 'fr' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.5)}'
           |  WHEN 'es' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.25)}'
           |  WHEN 'zh' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.1)}'
           |  ELSE FALSE END""".stripMargin
      },
      "deterministic stratified sampling by language — the training-mixture reweighting primitive, identical routing both engines"),

    Q("x6d_cap_per_source",
      (s, dir) => graft.ops.Relational.capPerKey(col("source"), col("doc_id"), 10)(
          docs(s, dir))
        .select(col("key").as("source"), col("id").as("doc_id")),
      // the oracle's QUALIFY-rank spelling is the semantics; the Spark plan
      // is the bounded-aggregate form of the same selection
      Some("""SELECT source, doc_id FROM documents
             |QUALIFY row_number() OVER (PARTITION BY source
             |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) DESC, doc_id) <= 10""".stripMargin),
      "cap per-source cardinality at 10: deterministic survivors via the bounded top-k aggregate, no per-key window sort"),

    // ============ X5 retrieval / corpus-level curation ============

    Q("x9_bm25_search",
      (s, dir) => Search.bm25TopK(col("doc_id"), col("text"),
        Seq("spark", "vector", "hash"), 20)(docs(s, dir)),
      Some("""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             |                 avg(dl) AS avgdl FROM d),
             |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
             |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
             |       WHERE term IN ('spark', 'vector', 'hash')
             |       GROUP BY doc_id, dl, term),
             |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY term),
             |sc AS (SELECT doc_id,
             |         round(sum(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
             |           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 4)
             |           AS score
             |       FROM tf JOIN dfreq USING (term) CROSS JOIN stats
             |       GROUP BY doc_id)
             |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      "X5 BM25 top-20 retrieval: inverted-index semi-join (postings of query " +
        "terms only), broadcast df/corpus stats, TakeOrdered top-k"),

    Q("x10_dup_ngrams",
      (s, dir) => Dedup.dupNgramStats(col("doc_id"), col("text"), 5)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |         unnest([array_to_string(toks[i:i+4], ' ')
             |                 for i in range(1, len(toks) - 3)]) AS s
             |       FROM toks WHERE len(toks) >= 5),
             |dfreq AS (SELECT s, count(*) >= 2 AS in_others FROM sh GROUP BY s)
             |SELECT doc_id, count(*) AS n_shingles,
             |       CAST(sum(CASE WHEN in_others THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |       CAST(sum(CASE WHEN in_others THEN 1 ELSE 0 END) AS DOUBLE)
             |             / CAST(count(*) AS DOUBLE) AS dup_frac
             |FROM sh JOIN dfreq USING (s) GROUP BY doc_id""".stripMargin),
      "X1/X2 corpus-duplication profile: per-doc fraction of 5-gram shingles " +
        "shared with other docs (one shuffle on s, aggregate-then-join, no pair blowup)"),

    Q("x11_semdedup",
      (s, dir) => Similarity.semDedup(
        Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        semdedupModel(s, dir).centers, 0.35),
      None, // cluster ids come from in-engine k-means (not SQL-reproducible);
            // the keep/drop rule is re-verified by x11_semdedup_check
      "X2 SemDeDup: drop vectors with a lower-id cluster-mate above cosine " +
        "0.35 — per-cluster pairwise only, one reused exchange on cid, " +
        "k ~ sqrt(N) clustering so the pairwise pass stays near-linear"),

    Q("x12_unigram_lm",
      (s, dir) => TextAnalysis.unigramLogProb(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |c AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c)
             |SELECT doc_id, count(*) AS n_tokens,
             |       round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (t_tokens + vocab))), 4) AS avg_logp
             |FROM tok JOIN c USING (term) CROSS JOIN t
             |GROUP BY doc_id""".stripMargin),
      "X3 corpus-trained unigram-LM score (CCNet-style perplexity filter " +
        "stand-in): add-1-smoothed mean token log-prob, count-side pre-aggregated"),

    Q("x59_ccnet_buckets",
      // CCNet's published head/middle/tail split by corpus-trained LM
      // score (the downstream contract is "train on head+middle"):
      // x12's scoring pass + one tertile-threshold row broadcast back —
      // the x18 tiers play on the LM axis.
      (s, dir) => TextAnalysis.lmBuckets(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |c AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c),
             |sc AS (SELECT doc_id,
             |         round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (t_tokens + vocab))), 4) AS avg_logp
             |       FROM tok JOIN c USING (term) CROSS JOIN t
             |       GROUP BY doc_id),
             |q AS (SELECT quantile_cont(avg_logp, 1.0/3) AS t1,
             |             quantile_cont(avg_logp, 2.0/3) AS t2 FROM sc)
             |SELECT doc_id, avg_logp,
             |       CASE WHEN avg_logp >= t2 THEN 'head'
             |            WHEN avg_logp >= t1 THEN 'middle'
             |            ELSE 'tail' END AS bucket
             |FROM sc CROSS JOIN q""".stripMargin),
      "X3 CCNet head/middle/tail buckets by the corpus-trained unigram " +
        "LM score: x12's scoring pass + an in-plan tertile broadcast " +
        "(two passes, zero driver round-trips) — the published CCNet " +
        "shard split downstream mixtures consume"),

    Q("x13_hybrid_search",
      (s, dir) => {
        val lex = Search.bm25(col("doc_id"), col("text"),
          Seq("spark", "vector", "hash"))(docs(s, dir))
        val e = Tables.embeddings(s, dir)
        // limit(1) makes the one-row bound STATIC (a GlobalLimit 1 is a
        // scalar side to the cartesian guardrail); the filter alone is
        // only one row by data knowledge the planner can't see
        val qv = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec")).limit(1)
        // raw cosine: bit-identical to list_cosine_similarity (probed at
        // sf0.1 — 9995/9995 exact), so ranks need no rounding mask here
        val sem = e.crossJoin(broadcast(qv))
          .select(col("vec_id").as("doc_id"),
            Similarity.cosine(col("embedding"), col("qvec")).as("score"))
        Search.rrfFuseTopK(lex, sem, candidates = 50, k = 10)
      },
      Some("""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
             |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d),
             |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
             |       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
             |       WHERE term IN ('spark', 'vector', 'hash')
             |       GROUP BY doc_id, dl, term),
             |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df_t FROM tf GROUP BY term),
             |sc AS (SELECT doc_id,
             |         round(sum(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
             |           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 4)
             |           AS score
             |       FROM tf JOIN dfreq USING (term) CROSS JOIN stats GROUP BY doc_id),
             |lexr AS (SELECT doc_id,
             |           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
             |         FROM sc QUALIFY lex_rank <= 50),
             |sem AS (SELECT vec_id AS doc_id,
             |          list_cosine_similarity(embedding::DOUBLE[],
             |            (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) AS score
             |        FROM embeddings),
             |semr AS (SELECT doc_id,
             |           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS sem_rank
             |         FROM sem QUALIFY sem_rank <= 50),
             |f AS (SELECT coalesce(l.doc_id, r.doc_id) AS doc_id, l.lex_rank, r.sem_rank,
             |        round(coalesce(CAST(1.0 AS DOUBLE)/(60 + l.lex_rank), 0.0)
             |              + coalesce(CAST(1.0 AS DOUBLE)/(60 + r.sem_rank), 0.0), 6) AS rrf
             |      FROM lexr l FULL JOIN semr r ON l.doc_id = r.doc_id)
             |SELECT doc_id, lex_rank, sem_rank, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin),
      "X5 hybrid retrieval: BM25 + embedding-cosine rankings fused by " +
        "reciprocal-rank fusion over top-50 candidates (ranks, not scores — " +
        "no calibration; global window only after the TakeOrdered cut)"),

    Q("x14_bpe_merges",
      (s, dir) => TextAnalysis.mergeCandidates(col("doc_id"), col("text"), 20)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
             |                      for i in range(1, len(toks))]) AS pair
             |       FROM toks WHERE len(toks) >= 2)
             |SELECT pair, count(*) AS cnt FROM sh
             |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),
      "X3 BPE merge-candidate mining: top-20 adjacent-token pairs (the " +
        "counting pass of a tokenizer-training round; hash-agg + TakeOrdered)"),

    Q("x14b_bpe_apply",
      (s, dir) => {
        // the other half of the x14 story: merges trained in-engine
        // (driver loop over the ONE distributed word-count pass), applied
        // corpus-wide by the native BpeEncode expression — map-only, the
        // literal-model play. No SQL engine can express the greedy merge
        // loop → no_oracle; x14b_bpe_check pins reconstruction + bounds.
        val enc = graft.functions.BpeEncode(trainedBpe(s, dir))(col("text"))
        docs(s, dir).select(
          col("doc_id"),
          size(enc).cast("long").as("n_bpe"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          (length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
            .cast("long").as("n_chars"))
      },
      None,
      "X3 BPE tokenizer application: 200 in-engine-trained merges applied " +
        "per word via the native codegen expression (subword token counts)"),

    Q("x16_semantic_decon",
      (s, dir) => Similarity.semanticDecontaminate(
          Tables.embeddings(s, dir).filter(col("vec_id") >= 50)
            .select(col("vec_id").as("id"), col("embedding").as("vec")),
          evalVectors(s, dir), 0.35)
        .select(col("id")),
      // FP-safe oracle: the nearest corpus-eval cosine sits 2.3e-5 from the
      // 0.35 threshold at sf0.1 (4.8e-4 at sf0.01) — 10 orders above any
      // cross-engine double noise
      Some("""SELECT vec_id AS id FROM embeddings e
             |WHERE vec_id >= 50 AND NOT EXISTS (
             |  SELECT 1 FROM embeddings b WHERE b.vec_id < 50
             |  AND list_cosine_similarity(e.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35)""".stripMargin),
      "X2 semantic benchmark decontamination: drop corpus vectors within " +
        "cosine 0.35 of any eval vector — driver-held eval literals, " +
        "map-only corpus pass, zero shuffle"),

    Q("x15_trending",
      (s, dir) => {
        // two-level shape: windowed count first (hash-agg, shuffles
        // (window, type) cells — bounded by |types| per window), THEN a
        // rank window over the tiny aggregated groups. The no-Window rule
        // targets per-row windows over raw data; post-aggregation rank
        // over |event_type| rows per window is the cheap, standard finish.
        val counted = Tables.events(s, dir)
          .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.start")).as("window_start"),
            col("event_type"), col("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_start"))
          .orderBy(col("cnt").desc, col("event_type"))
        counted.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
      },
      Some("""WITH c AS (SELECT epoch_us(ts) // 3600000000 * 3600 AS window_start,
             |                  event_type, count(*) AS cnt
             |           FROM events GROUP BY 1, 2)
             |SELECT window_start, event_type, cnt,
             |       CAST(row_number() OVER (PARTITION BY window_start
             |                               ORDER BY cnt DESC, event_type) AS INT) AS rnk
             |FROM c QUALIFY rnk <= 3""".stripMargin),
      "X5 trending per tumbling hour: top-3 event types per window — " +
        "windowed hash-agg first, rank only over the aggregated cells"),

    Q("x23_quality_lr",
      (s, dir) => {
        // model-based quality scoring with FIXED literal weights — the
        // oracle-checkable half of the classifier story (training is
        // pinned by x23_lr_check): z accumulates bias-first left-to-right
        // in both engines, so the raw doubles hash-compare bit-exactly.
        // pred avoids exp() entirely (z > 0 ⇔ sigmoid > 0.5).
        val q = TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir))
        val feats = Seq(col("diversity"), col("stop_ratio"), col("mean_token_len"))
        val w = Seq(-6.0, 6.0, 3.0, 0.6)
        q.select(col("doc_id"),
          Classifier.linearScore(feats, w).as("z"),
          (Classifier.linearScore(feats, w) > 0).as("pred"))
      },
      Some(s"""WITH f AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS diversity,
              |  CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
              |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_token_len
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
              |SELECT doc_id,
              |  CAST(-6.0 AS DOUBLE) + diversity * CAST(6.0 AS DOUBLE)
              |    + stop_ratio * CAST(3.0 AS DOUBLE)
              |    + mean_token_len * CAST(0.6 AS DOUBLE) AS z,
              |  CAST(-6.0 AS DOUBLE) + diversity * CAST(6.0 AS DOUBLE)
              |    + stop_ratio * CAST(3.0 AS DOUBLE)
              |    + mean_token_len * CAST(0.6 AS DOUBLE) > 0 AS pred
              |FROM f""".stripMargin),
      "X3 model-based quality scoring: logistic-regression linear score " +
        "with literal weights — map-only, codegen'd, bit-exact vs the oracle"),

    Q("x24_pagerank",
      (s, dir) => Graph.pageRank(coPurchaseEdges(s, dir), iters = 8)
        .orderBy(col("rank").desc, col("id"))
        .limit(20)
        .select(col("id").as("part_id"), col("rank")),
      None,
      "X5 PageRank over the part co-purchase graph: 8 power iterations, " +
        "edges partitioned once, |V|-sized rank vector broadcast per round " +
        "(iterative floats → no_oracle; x24_pagerank_check pins the invariants)"),

    Q("x18_quality_tiers",
      (s, dir) => TextAnalysis.qualityTiers(col("doc_id"), col("text"))(docs(s, dir)),
      // quality arithmetic mirrored from the (green) x4c oracle; quartile
      // thresholds via quantile_cont = Spark's exact `percentile` (the
      // interpolation conventions agree — proven by o11)
      Some(s"""WITH sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              |q AS (SELECT quantile_cont(quality, 0.25) AS q1,
              |             quantile_cont(quality, 0.5) AS q2,
              |             quantile_cont(quality, 0.75) AS q3 FROM sc)
              |SELECT doc_id, quality,
              |       CAST(CASE WHEN quality < q1 THEN 0
              |                 WHEN quality < q2 THEN 1
              |                 WHEN quality < q3 THEN 2
              |                 ELSE 3 END AS INT) AS tier
              |FROM sc CROSS JOIN q""".stripMargin),
      "X3 quality-tier assignment: in-plan quartile thresholds broadcast " +
        "into the scoring pass (approx-sketch variant for the 100 TB path)"),

    Q("x6g_curation_v2",
      (s, dir) => {
        // round-5 ops COMPOSED: corpus-relative quality gate (top two
        // tiers) → cross-doc duplication cut (dup_frac < 0.5, which also
        // drops sub-shingle docs) → deterministic sequence packing. Each
        // stage is the catalog operator unchanged — the pipeline is three
        // joins on doc_id, no re-derivation.
        val d = docs(s, dir)
        val tiers = TextAnalysis.qualityTiers(col("doc_id"), col("text"))(d)
          .filter(col("tier") >= 2).select("doc_id")
        // exact integer form of dup_frac < 0.5 (dup_frac is emitted
        // rounded; 2*n_dup < n_shingles has no rounding boundary)
        val nondup = Dedup.dupNgramStats(col("doc_id"), col("text"), 5)(d)
          .filter(col("n_dup") * 2 < col("n_shingles")).select("doc_id")
        val kept = d.join(tiers, "doc_id").join(nondup, "doc_id")
        TextAnalysis.packSequences(col("doc_id"), col("text"),
          col("source"), 2048)(kept)
      },
      Some(s"""WITH sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              |qq AS (SELECT quantile_cont(quality, 0.5) AS q2 FROM sc),
              |t AS (SELECT doc_id FROM sc CROSS JOIN qq WHERE quality >= q2),
              |toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              |sh AS (SELECT DISTINCT doc_id,
              |         unnest([array_to_string(toks[i:i+4], ' ')
              |                 for i in range(1, len(toks) - 3)]) AS s
              |       FROM toks WHERE len(toks) >= 5),
              |dfreq AS (SELECT s, count(*) >= 2 AS in_others FROM sh GROUP BY s),
              |dd AS (SELECT doc_id FROM sh JOIN dfreq USING (s) GROUP BY doc_id
              |       HAVING 2 * sum(CASE WHEN in_others THEN 1 ELSE 0 END) < count(*)),
              |kept AS (SELECT d.doc_id, d.source,
              |           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
              |           md5(CAST(d.doc_id AS VARCHAR)) AS ord
              |         FROM documents d JOIN t USING (doc_id) JOIN dd USING (doc_id)),
              |o AS (SELECT doc_id, source, n_tokens,
              |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
              |      FROM kept)
              |SELECT doc_id, source AS part, n_tokens, start_offset,
              |       CAST(floor(start_offset / 2048) AS BIGINT) AS bin
              |FROM o""".stripMargin),
      "X3 curation v2 — the round-5 ops composed: corpus-relative quality " +
        "tiering, cross-doc duplication cut, deterministic packing; three " +
        "doc_id joins, every stage the unchanged catalog operator"),

    Q("x17_transitions",
      (s, dir) => graft.ops.Sequences.transitionCounts(
        col("user_id"), Seq(col("ts_us"), col("event_id")), col("event_type"))(
        Tables.events(s, dir)),
      Some("""WITH o AS (SELECT user_id, event_type,
             |            lead(event_type) OVER (PARTITION BY user_id
             |                                   ORDER BY epoch_us(ts), event_id) AS next
             |          FROM events)
             |SELECT event_type AS from_state, next AS to_state, count(*) AS cnt
             |FROM o WHERE next IS NOT NULL GROUP BY 1, 2""".stripMargin),
      "X5 user-journey transition matrix: per-key ordered lookahead " +
        "(key-partitioned window, parallel across users), |states|^2 hash-agg"),

    Q("x20_resample_ffill",
      (s, dir) => graft.ops.Timeseries.resampleFfill(
          col("user_id"), col("ts_us"), col("value"), 21600000000L)(
          Tables.events(s, dir))
        .select(col("k").as("user_id"), col("grid_us"), col("v").as("value")),
      // floor-aligned modulo (((x % s) + s) % s) matches the engine's pmod
      // for negative (pre-1970) epochs too; DuckDB's bare % follows the
      // dividend's sign and would misalign those buckets
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
             |g AS (SELECT user_id,
             |        unnest(generate_series(mn - ((mn % 21600000000) + 21600000000) % 21600000000,
             |                               mx, 21600000000)) AS grid_us
             |      FROM (SELECT user_id, min(us) AS mn, max(us) AS mx FROM b GROUP BY 1)),
             |o AS (SELECT user_id,
             |        us - ((us % 21600000000) + 21600000000) % 21600000000 AS bucket, value
             |      FROM b
             |      QUALIFY row_number() OVER (
             |        PARTITION BY user_id,
             |                     us - ((us % 21600000000) + 21600000000) % 21600000000
             |        ORDER BY us DESC, value DESC) = 1)
             |SELECT g.user_id, g.grid_us,
             |       last_value(o.value IGNORE NULLS) OVER (
             |         PARTITION BY g.user_id ORDER BY g.grid_us
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
             |FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.grid_us = o.bucket""".stripMargin),
      "X5 time-series resample + forward fill: per-key 6h grid from one agg, " +
        "explode(sequence) bounded by range/step, last-per-bucket as an aggregate " +
        "(not a window over raw events), one key-partitioned fill window"),

    Q("x22_chunk_sliding",
      (s, dir) => TextAnalysis.chunkSliding(col("doc_id"), col("text"), 32, 24)(
        docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1),
             |e AS (SELECT doc_id, t, n,
             |        unnest(range(0, CASE WHEN n <= 32 THEN 1
             |                             ELSE 1 + (n - 32 + 24 - 1) // 24 END)) AS k
             |      FROM nn)
             |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
             |       array_to_string(t[CAST(k*24+1 AS INT):CAST(k*24+32 AS INT)], ' ')
             |         AS chunk_text,
             |       CAST(least(32, n - k*24) AS BIGINT) AS n_tokens
             |FROM e""".stripMargin),
      "X3 sliding-window chunking (RAG ingestion): overlapping 32-token " +
        "windows at stride 24, map-only explode sized by arithmetic, " +
        "slice/concat_ws reassembly — no shuffle"),

    Q("x19_token_mixture",
      (s, dir) => TextAnalysis.mixToTokenBudget(
          col("doc_id"), col("source"), size(Texts.tokens(col("text"))),
          Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2), 2000L)(docs(s, dir))
        .select(col("doc_id"), col("source")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total
             |        FROM toks GROUP BY 1),
             |tgt AS (SELECT * FROM (VALUES
             |          ('src1', CAST(0.5 AS DOUBLE)),
             |          ('src2', CAST(0.3 AS DOUBLE)),
             |          ('src3', CAST(0.2 AS DOUBLE))) t(source, w)),
             |rates AS (
             |  SELECT tot.source,
             |         CAST(2000 AS DOUBLE) * w / CAST(total AS DOUBLE) AS raw,
             |         CAST(floor(CAST(2000 AS DOUBLE) * w / CAST(total AS DOUBLE)
             |                    * 16777216) AS BIGINT) AS bucket
             |  FROM tot JOIN tgt ON tot.source = tgt.source)
             |SELECT d.doc_id, d.source
             |FROM toks d JOIN rates r ON d.source = r.source
             |WHERE r.raw >= 1.0
             |   OR (r.bucket > 0 AND
             |       md5(CAST(d.doc_id AS VARCHAR)) < lower(lpad(to_hex(r.bucket), 6, '0')))""".stripMargin),
      "X3 token-budget data mixture: per-source keep-rates from one stats pass " +
        "(budget*weight/total, floor-quantized to the md5 sampling grid), then a " +
        "deterministic map-only stratified sample — the corpus is never shuffled"),

    Q("x43_temperature_mix",
      // x19 with the weights DERIVED from the data: w_s = sqrt(tokens_s) /
      // sum sqrt(tokens) (temperature sampling at alpha = 0.5 — flattens
      // the skew so small sources are up-weighted relative to their
      // natural share). alpha = 0.5 on purpose: IEEE requires sqrt to be
      // correctly rounded, so Spark and DuckDB derive bit-identical
      // weights (pow(x, 0.7) carries no such guarantee, and a last-ulp
      // difference can flip the floor-quantized keep bucket); the z sum
      // is ORDER BY source on both sides for the same reason. Same plan
      // shape as x19: one K-row stats aggregate, then a map-only
      // deterministic keep filter; the corpus is never shuffled.
      (s, dir) => TextAnalysis.mixByTemperature(
          col("doc_id"), col("source"), size(Texts.tokens(col("text"))),
          0.5, 2000L)(docs(s, dir))
        .select(col("doc_id"), col("source")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total
             |        FROM toks GROUP BY 1 HAVING sum(n_tokens) > 0),
             |z AS (SELECT sum(sqrt(CAST(total AS DOUBLE)) ORDER BY source) AS z
             |      FROM tot),
             |rates AS (
             |  SELECT tot.source,
             |         CAST(2000 AS DOUBLE) * (sqrt(CAST(total AS DOUBLE)) / z.z)
             |           / CAST(total AS DOUBLE) AS raw,
             |         CAST(floor(CAST(2000 AS DOUBLE)
             |                    * (sqrt(CAST(total AS DOUBLE)) / z.z)
             |                    / CAST(total AS DOUBLE) * 16777216) AS BIGINT) AS bucket
             |  FROM tot, z)
             |SELECT d.doc_id, d.source
             |FROM toks d JOIN rates r ON d.source = r.source
             |WHERE r.raw >= 1.0
             |   OR (r.bucket > 0 AND
             |       md5(CAST(d.doc_id AS VARCHAR)) < lower(lpad(to_hex(r.bucket), 6, '0')))""".stripMargin),
      "X3 temperature-sampled data mixture: per-source weights tokens^alpha / " +
        "sum(tokens^alpha) from one stats pass, then the same deterministic " +
        "map-only stratified sample as x19 — zero corpus shuffle"),

    Q("x44_dsir_score",
      // src0 plays the in-domain seed set; every doc (target rows
      // included) gets the log-ratio score. Rounded to 4 decimals like
      // x12: both engines sum tf-weighted doubles in arbitrary order, and
      // the rounding absorbs the ~1e-12 reassociation noise.
      (s, dir) => TextAnalysis.dsirScore(
        col("doc_id"), col("text"), col("source") === lit("src0"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, source = 'src0' AS tgt,
             |               unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, tgt, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
             |c AS (SELECT term, sum(tf) AS c,
             |        sum(CASE WHEN tgt THEN tf ELSE 0 END) AS ct
             |      FROM tf GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_all,
             |             CAST(sum(ct) AS DOUBLE) AS t_tgt,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c)
             |SELECT doc_id, sum(tf) AS n_tokens,
             |       round(sum(CAST(tf AS DOUBLE)
             |               * (ln((CAST(ct AS DOUBLE) + 1.0) / (t_tgt + vocab))
             |                  - ln((CAST(c AS DOUBLE) + 1.0) / (t_all + vocab))))
             |             / CAST(sum(tf) AS DOUBLE), 4) AS dsir
             |FROM tf JOIN c USING (term) CROSS JOIN t
             |GROUP BY doc_id""".stripMargin),
      "X3 DSIR importance score: tf-weighted mean log-ratio of target-domain " +
        "vs corpus add-1 unigram LMs from one tokenize pass — the " +
        "importance-resampling ranking key for tilting a crawl toward a " +
        "domain given a small seed set"),

    Q("x45_token_entropy",
      // rounded to 4 decimals like x12/x44: Σ c·ln c accumulates in
      // engine-dependent order (row-local HashMap here, group aggregate
      // there) and ln differs by ulps across libm/JVM — the rounding
      // absorbs the ~1e-12 reassociation noise
      (s, dir) => docs(s, dir).select(col("doc_id"),
        size(Texts.tokens(col("text"))).cast("long").as("n_tokens"),
        round(graft.functions.TokenEntropy(col("text")), 4).as("entropy")),
      Some("""WITH tf AS (
             |  SELECT doc_id, term, count(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |        FROM documents)
             |  GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |       round(ln(CAST(sum(c) AS DOUBLE))
             |             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
             |               / CAST(sum(c) AS DOUBLE), 4) AS entropy
             |FROM tf GROUP BY doc_id""".stripMargin),
      "X3 token-distribution Shannon entropy per doc (information-density " +
        "quality signal) as a native codegen expression: one map-only pass " +
        "over the documents scan, zero shuffle — where the SQL form must " +
        "explode the corpus into tokens and aggregate it twice"),

    Q("x46_curriculum_order",
      // x18's tier oracle verbatim, plus the rank: best tier first,
      // seeded-hash shuffle inside each tier, dense 0-based position
      (s, dir) => TextAnalysis.curriculumOrder(
        col("doc_id"), col("text"), "cur")(docs(s, dir)),
      Some(s"""WITH sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              |q AS (SELECT quantile_cont(quality, 0.25) AS q1,
              |             quantile_cont(quality, 0.5) AS q2,
              |             quantile_cont(quality, 0.75) AS q3 FROM sc),
              |t AS (SELECT doc_id,
              |        CAST(CASE WHEN quality < q1 THEN 0
              |                  WHEN quality < q2 THEN 1
              |                  WHEN quality < q3 THEN 2
              |                  ELSE 3 END AS INT) AS tier
              |      FROM sc CROSS JOIN q)
              |SELECT doc_id, tier,
              |       row_number() OVER (
              |         ORDER BY 3 - tier,
              |                  md5('cur:' || CAST(doc_id AS VARCHAR)),
              |                  doc_id) - 1 AS position
              |FROM t""".stripMargin),
      "X3 curriculum ordering: quality-tier-descending training order with " +
        "a deterministic seeded shuffle inside each tier, dense global " +
        "position via the range-partition rank play — no single-reducer " +
        "sort, reproducible across engines/runs/retries"),

    Q("x50_containment_pairs",
      // directed near-superset detection at C >= 0.5 over 3-shingles,
      // same DF cut as x2; containment = common/sz_src is one exact IEEE
      // division of two ints — engine-identical, no rounding needed
      (s, dir) => Dedup.containmentPairs(col("doc_id"), col("text"), 3, 0.5,
        maxShingleDf = 1000L)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |ex AS (SELECT DISTINCT doc_id,
             |         unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             |                 for i in range(1, len(toks) - 1)]) AS s
             |       FROM toks WHERE len(toks) >= 3),
             |kept AS (SELECT doc_id, s FROM ex
             |         QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
             |sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
             |dp AS (SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS common
             |       FROM kept a JOIN kept b
             |         ON a.s = b.s AND a.doc_id <> b.doc_id
             |       GROUP BY 1, 2)
             |SELECT src, dst,
             |       CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment
             |FROM dp JOIN sz sa ON sa.doc_id = dp.src
             |WHERE CAST(common AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= 0.5""".stripMargin),
      "X2 directed near-superset pairs (containment |A∩B|/|A|): catches a " +
        "doc quoted whole inside a larger one, where the size imbalance " +
        "drags Jaccard below any symmetric threshold — asymmetric " +
        "source-prefix filter against the full fingerprint index, exact " +
        "two-pointer verification"),

    Q("x54_unimax_mixture",
      // UniMax (epoch-capped water-filling) over the LANG axis — the
      // skewed stratum in this corpus: budget = 1.5× total tokens at cap
      // 2 epochs takes every small language whole (2 copies each) and
      // water-fills the big one (en) with the remainder. The capped set
      // is decided in all-long arithmetic and the uncapped weight is two
      // IEEE divisions of exact longs, so both engines derive the same
      // md5-grid copy thresholds; the corpus pass is the same map-only
      // copy expansion as x6f.
      (s, dir) => TextAnalysis.mixByUnimax(
        col("doc_id"), col("lang"), size(Texts.tokens(col("text"))),
        maxEpochs = 2, budgetFraction = 1.5)(docs(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, lang,
              |               len(string_split(text, ' ')) AS n_tokens FROM documents),
              |$unimaxChainCte
              |$unimaxSelect""".stripMargin),
      "X3 UniMax mixture: epoch-capped water-filling allocation — small " +
        "sources taken whole up to the epoch cap, the rest share the " +
        "remaining budget equally; all-long cap decision + fixed-order " +
        "IEEE divisions so both engines derive identical copy thresholds"),

    Q("x52_cross_source_dups",
      // data-card-level cross-corpus duplication exposure: for each
      // (unordered) source pair, how many near-dup pairs straddle them —
      // the mixing/licensing diagnostic ("src3 is mostly src0
      // re-crawled") that x37's per-source card cannot see. Pure
      // composition over the shared pair artifact; the |docs|-sized
      // source map joins onto the (tiny by construction) pair set.
      (s, dir) => {
        val src = docs(s, dir).select(col("doc_id"), col("source"))
        nearDupPairs(s, dir)
          .join(src.select(col("doc_id").as("a"), col("source").as("src_a")), "a")
          .join(src.select(col("doc_id").as("b"), col("source").as("src_b")), "b")
          .select(least(col("src_a"), col("src_b")).as("source_a"),
            greatest(col("src_a"), col("src_b")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some(s"""WITH $ngramPairsCte
              |SELECT least(sa.source, sb.source) AS source_a,
              |       greatest(sa.source, sb.source) AS source_b,
              |       count(*) AS n_pairs
              |FROM jp
              |JOIN documents sa ON sa.doc_id = jp.a
              |JOIN documents sb ON sb.doc_id = jp.b
              |GROUP BY 1, 2""".stripMargin),
      "X2/X3 cross-source duplication matrix: near-dup pairs bucketed by " +
        "the unordered source pair — which corpora duplicate EACH OTHER; " +
        "composition over the shared near-dup pair artifact, all-integer"),

    Q("x53_freq_spectrum",
      // frequency-of-frequencies: how many distinct terms occur exactly f
      // times in the corpus — the Good-Turing smoothing input and the
      // vocabulary-curve diagnostic (a fat f=1 head = long OOV tail; a
      // missing low-f band = template/boilerplate corpus). Two chained
      // hash aggregates, both map-side combined; the second runs over
      // |vocab| rows, not the corpus. All-integer (hash-safe).
      (s, dir) => docs(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("f"))
        .groupBy("f").agg(count(lit(1)).as("n_terms"))
        .select(col("f"), col("n_terms")),
      Some("""SELECT f, count(*) AS n_terms
             |FROM (SELECT term, count(*) AS f
             |      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
             |      GROUP BY term)
             |GROUP BY f""".stripMargin),
      "X3 token frequency-of-frequencies spectrum (Good-Turing input, " +
        "vocabulary-curve diagnostic): two chained map-side-combined " +
        "aggregates, second pass over vocab grain only"),

    Q("x51_winnow_fp",
      // robust winnowing (MOSS) over 8-token grams, window 4: the sparse
      // position-robust fingerprint set — same md5 grain as x4g's dense
      // stream, ~2/(w+1) the rows; rightmost-min tie rule is encoded in
      // the comparison key so both engines select identically
      (s, dir) => TextAnalysis.winnowFingerprints(
        col("doc_id"), col("text"), 8, 4)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |           WHERE len(string_split(text, ' ')) >= 8),
             |g AS (SELECT doc_id, len(toks) - 7 AS n_grams,
             |             unnest(range(1, len(toks) - 6)) AS pos, toks
             |      FROM t),
             |h AS (SELECT doc_id, n_grams, CAST(pos AS INT) AS pos,
             |             md5(array_to_string(toks[pos:pos+7], ' ')) AS fp
             |      FROM g),
             |m AS (SELECT doc_id, n_grams, pos,
             |             min(fp || lpad(CAST(9999999 - pos AS VARCHAR), 7, '0'))
             |               OVER (PARTITION BY doc_id ORDER BY pos
             |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel_key
             |      FROM h)
             |SELECT DISTINCT doc_id,
             |       CAST(9999999 - CAST(substr(sel_key, 33, 7) AS INT) AS INT) AS pos,
             |       substr(sel_key, 1, 32) AS fp
             |FROM m WHERE pos <= greatest(1, n_grams - 3)""".stripMargin),
      "X2/X3 robust winnowing fingerprints (MOSS): per 4-gram window keep " +
        "the min 8-token md5, rightmost on ties — every shared 11-token " +
        "run still collides, at ~40% of the dense rolling-stream volume; " +
        "one per-doc ROWS frame, parallel across docs"),

    Q("x47_fixed_sample",
      // exact-size uniform sample: the k lowest seeded doc hashes — the
      // deterministic way to carve a fixed-size eval/holdout set (x6c's
      // rate sampling gives binomial sizes; this gives EXACTLY k). Plans
      // as TakeOrderedAndProject: per-partition top-k then one k-row
      // merge, never a global sort
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          md5(concat(lit("fs:"), col("doc_id").cast("string"))).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(200),
      Some("""SELECT doc_id, md5('fs:' || CAST(doc_id AS VARCHAR)) AS h
             |FROM documents ORDER BY h, doc_id LIMIT 200""".stripMargin),
      "X3 deterministic exact-k uniform sample (k lowest seeded hashes): " +
        "fixed-size eval-set carving as a TakeOrdered top-k, no global sort"),

    Q("x48_interleave_sources",
      (s, dir) => TextAnalysis.interleaveSources(
        col("doc_id"), col("source"), "il")(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, source,
             |            md5('il:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
             |          AS source_pos
             |      FROM t)
             |SELECT doc_id, source, source_pos,
             |       row_number() OVER (ORDER BY source_pos, source, doc_id) - 1
             |         AS position
             |FROM r""".stripMargin),
      "X3 source-interleaved training order: strict round-robin across " +
        "sources via two range-partition ranks and a |sources|-row offset " +
        "broadcast — no per-source window sort, no single-reducer stage"),

    Q("x49_compression_ratio",
      // no SQL oracle can deflate — paired with the oracle-checked
      // x49_compression_check invariant twin (CheckQueries)
      (s, dir) => docs(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        graft.functions.DeflateRatio(col("text")).as("ratio")),
      None,
      "X3 DEFLATE compression-ratio quality signal (Gopher-style " +
        "repetitiveness filter: LZ77 catches phrase/block repeats that " +
        "token entropy misses) — native codegen scalar over the scan, " +
        "zero shuffle, thread-local zlib state"),

    Q("x37b_vocab_stats",
      // x37's data card extended with corpus-linguistics stats: per-source
      // vocabulary size and type-token ratio (Heaps-law style vocabulary
      // growth diagnostic — a source whose TTR collapses as it grows is
      // template/boilerplate-heavy). Two-phase distinct aggregate: the
      // token stream collapses to (source, term) cells map-side first
      (s, dir) => docs(s, dir)
        .select(col("source"), explode(Texts.tokens(col("text"))).as("term"))
        .groupBy(col("source"))
        .agg(countDistinct(col("term")).as("vocab"),
          count(lit(1)).as("total_tokens"))
        .select(col("source"), col("vocab"), col("total_tokens"),
          round(col("vocab").cast("double") / col("total_tokens"), 6).as("ttr")),
      Some("""SELECT source, count(DISTINCT term) AS vocab,
             |       count(*) AS total_tokens,
             |       round(CAST(count(DISTINCT term) AS DOUBLE) / count(*), 6) AS ttr
             |FROM (SELECT source, unnest(string_split(text, ' ')) AS term
             |      FROM documents)
             |GROUP BY source""".stripMargin),
      "X3 per-source vocabulary stats (vocab size, type-token ratio): the " +
        "Heaps-law vocabulary-growth diagnostic for the data card"),

    Q("x6i_curation_v4",
      // the continuation-2 ops COMPOSED into the MOSS/Dolma-style
      // partial-overlap curation pass: winnowed fingerprints (x51) →
      // fp-grain first-occurrence ownership → drop any doc with ≥ half
      // its selected fps owned by an earlier doc (catches quotes /
      // near-containment that whole-doc hashing misses, at ~40% of the
      // dense-stream index volume) → UniMax mixture (x54) re-derived on
      // the SURVIVORS (weights follow the gated totals, like v3's
      // re-quantiled tiers). Aggregate-then-join on one fp-keyed
      // exchange; the drop rule is an all-integer comparison.
      (s, dir) => {
        val d = docs(s, dir)
        // materialize the winnow stream ONCE: both the ownership aggregate
        // and the per-doc rollup consume it, and the broadcast build side
        // would otherwise re-run the whole per-doc window pipeline
        // (measured 2x the entry at sf3). Blocks reclaimed by the
        // harness's scoped cleanup.
        val fps = TextAnalysis.winnowFpSets(col("doc_id"), col("text"), 8, 4)(d)
          .localCheckpoint()
        val owner = fps.groupBy("fp").agg(min(col("doc_id")).as("owner"))
        val flagged = fps.join(owner, "fp")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sel"),
            sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L)).as("n_foreign"))
          .filter(col("n_foreign") * 2 >= col("n_sel"))
          .select(col("doc_id"))
        // short docs (< k tokens) have no fingerprints — no duplication
        // evidence, so they survive (anti join, not semi)
        val survivors = d.join(flagged, Seq("doc_id"), "left_anti")
        TextAnalysis.mixByUnimax(
          col("doc_id"), col("lang"), size(Texts.tokens(col("text"))),
          maxEpochs = 2, budgetFraction = 1.5)(survivors)
      },
      Some(s"""WITH wt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              |           WHERE len(string_split(text, ' ')) >= 8),
              |wg AS (SELECT doc_id, len(toks) - 7 AS n_grams,
              |              unnest(range(1, len(toks) - 6)) AS pos, toks
              |       FROM wt),
              |wh AS (SELECT doc_id, n_grams, CAST(pos AS INT) AS pos,
              |              md5(array_to_string(toks[pos:pos+7], ' ')) AS fp
              |       FROM wg),
              |wm AS (SELECT doc_id, n_grams, pos,
              |              min(fp || lpad(CAST(9999999 - pos AS VARCHAR), 7, '0'))
              |                OVER (PARTITION BY doc_id ORDER BY pos
              |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel_key
              |       FROM wh),
              |fps AS (SELECT DISTINCT doc_id, substr(sel_key, 1, 32) AS fp
              |        FROM wm WHERE pos <= greatest(1, n_grams - 3)),
              |own AS (SELECT fp, min(doc_id) AS owner FROM fps GROUP BY fp),
              |flagged AS (SELECT f.doc_id FROM fps f JOIN own o ON f.fp = o.fp
              |            GROUP BY f.doc_id
              |            HAVING 2 * sum(CASE WHEN o.owner < f.doc_id THEN 1 ELSE 0 END)
              |                   >= count(*)),
              |surv AS (SELECT d.* FROM documents d
              |         WHERE NOT EXISTS (SELECT 1 FROM flagged f
              |                           WHERE f.doc_id = d.doc_id)),
              |toks AS (SELECT doc_id, lang,
              |               len(string_split(text, ' ')) AS n_tokens FROM surv),
              |$unimaxChainCte
              |$unimaxSelect""".stripMargin),
      "X1-X3 curation pipeline v4: winnowed-fingerprint partial-overlap " +
        "dedup (first-occurrence fp ownership, >=50% foreign cut) feeding " +
        "a UniMax mixture re-derived on the survivors — one fp-keyed " +
        "exchange, all-integer drop rule, map-only copy expansion"),

    Q("x6h_curation_v3",
      // the round-7 signals COMPOSED: information-density gate (x45's
      // rounded entropy >= 3.0 — the round-4 value is engine-exact, so
      // the keep set cannot flip) → curriculum ordering of the survivors
      // (x46 unchanged; tiers re-quantiled on the gated subset)
      (s, dir) => TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "v3")(
        docs(s, dir).filter(
          round(graft.functions.TokenEntropy(col("text")), 4) >= 3.0)),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, term, count(*) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              |        FROM documents)
              |  GROUP BY 1, 2),
              |ent AS (
              |  SELECT doc_id,
              |         round(ln(CAST(sum(c) AS DOUBLE))
              |               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
              |                 / CAST(sum(c) AS DOUBLE), 4) AS entropy
              |  FROM tf GROUP BY doc_id),
              |kept AS (SELECT d.doc_id, d.text FROM documents d
              |         JOIN ent USING (doc_id) WHERE ent.entropy >= 3.0),
              |sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM kept)),
              |q AS (SELECT quantile_cont(quality, 0.25) AS q1,
              |             quantile_cont(quality, 0.5) AS q2,
              |             quantile_cont(quality, 0.75) AS q3 FROM sc),
              |t AS (SELECT doc_id,
              |        CAST(CASE WHEN quality < q1 THEN 0
              |                  WHEN quality < q2 THEN 1
              |                  WHEN quality < q3 THEN 2
              |                  ELSE 3 END AS INT) AS tier
              |      FROM sc CROSS JOIN q)
              |SELECT doc_id, tier,
              |       row_number() OVER (
              |         ORDER BY 3 - tier,
              |                  md5('v3:' || CAST(doc_id AS VARCHAR)),
              |                  doc_id) - 1 AS position
              |FROM t""".stripMargin),
      "X3 curation pipeline v3: round-7 ops composed unchanged — entropy " +
        "gate (map-only native expression) feeding curriculum ordering of " +
        "the survivors, all oracle-exact"),

    // ================= X4 multimodal =================

    Q("x5_multimodal_features",
      (s, dir) => {
        val payloads = Multimodal.attachPayload("doc_id", "text")(docs(s, dir))
        Multimodal.extractFeatures(s, payloads).toDF()
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  ord(substring(text, 1, 1)) AS feature0,
             |  1 + octet_length(encode(text)) % 64 AS width,
             |  octet_length(encode(text)) // (1 + octet_length(encode(text)) % 64) AS height
             |FROM documents""".stripMargin),
      "X4 multimodal: binary payload + metadata struct + partition-wise (stub) decode"),

    Q("x5b_frame_sample",
      (s, dir) => Multimodal.sampleFrames(col("doc_id"), col("text"), 32, 2)(docs(s, dir))
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"), length(col("frame")).as("n_chars")),
      Some("""WITH p AS (SELECT doc_id, text FROM documents WHERE len(text) >= 1),
             |e AS (SELECT doc_id, text,
             |        unnest(range(0, CAST(ceil(len(text)/32.0) AS BIGINT))) AS frame_idx
             |      FROM p)
             |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             |       md5(substring(text, CAST(frame_idx*32+1 AS INT), 32)) AS frame_md5,
             |       len(substring(text, CAST(frame_idx*32+1 AS INT), 32)) AS n_chars
             |FROM e WHERE frame_idx % 2 = 0""".stripMargin),
      "X4 frame sampling over opaque payloads: fixed grid, every-k stride, no decode, no lambda boundary"),

    // ====== sketch-accelerated curation (Bloom / count-min) + PCA ======

    Q("x25_bloom_decon",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.decontaminateBloom(col("doc_id"), col("text"), 8, benchBloom(s, dir))(
            d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50))
          .select(col("doc_id"), col("lang"), col("source"))
      },
      Some(decontOracleSql),
      "x8's decontamination re-planned through a broadcast Bloom prefilter: " +
        "the map-side sketch probe drops clean shingles before the semi join, " +
        "so join traffic is bounded by contamination + fpp, not corpus size; " +
        "no false negatives + exact confirm = same oracle as x8"),

    Q("x26_heavy_hitters",
      (s, dir) => {
        val (cms, thr) = tokenCms(s, dir)
        TextAnalysis.heavyHitters(col("text"), thr, cms)(docs(s, dir))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
             |            FROM documents),
             |thr AS (SELECT CAST(ceil(count(*) * 0.02) AS BIGINT) AS t FROM toks)
             |SELECT token, count(*) AS cnt FROM toks
             |GROUP BY token HAVING count(*) >= (SELECT t FROM thr)""".stripMargin),
      "exact corpus heavy hitters (tokens at >= 2% of the stream) behind a " +
        "count-min prefilter: CMS never underestimates, so the map-side cut " +
        "keeps every true heavy hitter and the exact groupBy confirm shuffles " +
        "only candidates — the vocabulary long tail dies before the exchange"),

    Q("x27_boilerplate",
      (s, dir) => TextAnalysis.removeBoilerplate(
        col("doc_id"), col("text"), blockTokens = 8, minDocs = 3)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |e AS (SELECT doc_id, t,
             |        unnest(range(0, CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
             |      FROM toks),
             |blk AS (SELECT doc_id, CAST(i AS INT) AS idx,
             |          array_to_string(t[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS b
             |        FROM e),
             |hot AS (SELECT b FROM blk GROUP BY b HAVING count(DISTINCT doc_id) >= 3),
             |kept AS (SELECT * FROM blk WHERE b NOT IN (SELECT b FROM hot))
             |SELECT d.doc_id,
             |       coalesce(string_agg(k.b, ' ' ORDER BY k.idx), '') AS clean_text
             |FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
             |GROUP BY d.doc_id""".stripMargin),
      "C4-style boilerplate cut at 8-token-block granularity: blocks recurring " +
        "in >= 3 distinct docs are dropped corpus-wide and survivors reassemble " +
        "in order — one block-keyed aggregate, one anti-join against the " +
        "(small by construction) hot set, one doc-keyed reassembly aggregate"),

    Q("x28_pca_project",
      // one projection array per row, unpacked to SCALAR columns: the
      // driver's comparer hashes column values and an array<double> cell
      // is unhashable there — and codegen subexpression elimination
      // computes the 4-dot projection once per row either way
      (s, dir) => {
        val p = Pca.project(col("embedding"), pcaModel(s, dir), 4)
        Tables.embeddings(s, dir).select(
          col("vec_id") +: (0 until 4).map(i =>
            element_at(p, i + 1).as(s"proj_$i")): _*)
      },
      None, // eigensolve not expressible in DuckDB SQL; invariants in x28_pca_check
      "PCA dimensionality reduction for the embedding pipeline: one exact " +
        "distributed moment pass + driver Jacobi eigensolve (planner-side, " +
        "like k-means centers), then map-only codegen'd literal-dot projection " +
        "— zero corpus shuffle to project"),

    Q("x29_bigram_lm",
      (s, dir) => TextAnalysis.bigramLogProb(col("doc_id"), col("text"),
        col("doc_id") % 2 === 0)(docs(s, dir)),
      // mirror of bigramLogProb: train slice doc_id % 2 = 0, stupid backoff
      // cb/c_prev for seen bigrams, 0.4 * add-1 unigram for unseen; docs
      // shorter than 2 tokens produce no bigrams and no row
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pe AS (SELECT doc_id, pc.prev AS prev, pc.cur AS cur
             |       FROM (SELECT doc_id,
             |               unnest([struct_pack(prev := t[i], cur := t[i+1])
             |                       for i in range(1, len(t))]) AS pc
             |             FROM toks WHERE len(t) >= 2)),
             |c AS (SELECT term, count(*) AS c
             |      FROM (SELECT unnest(t) AS term FROM toks WHERE doc_id % 2 = 0)
             |      GROUP BY term),
             |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |               CAST(count(*) AS DOUBLE) AS vocab FROM c),
             |tb AS (SELECT prev, cur, count(*) AS cb FROM pe
             |       WHERE doc_id % 2 = 0 GROUP BY prev, cur),
             |cells AS (SELECT doc_id, prev, cur, count(*) AS tf FROM pe
             |          GROUP BY doc_id, prev, cur)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             |       round(sum(tf * ln(CASE WHEN tb.cb IS NOT NULL
             |                   THEN CAST(tb.cb AS DOUBLE) / CAST(cp.c AS DOUBLE)
             |                   ELSE 0.4 * (coalesce(cc.c, 0) + 1.0) / (t_tokens + vocab) END))
             |             / sum(tf), 4) AS avg_logp
             |FROM cells
             |LEFT JOIN tb USING (prev, cur)
             |LEFT JOIN c cp ON cp.term = cells.prev
             |LEFT JOIN c cc ON cc.term = cells.cur
             |CROSS JOIN tot
             |GROUP BY doc_id""".stripMargin),
      "X3 bigram LM with stupid backoff (KenLM-shaped perplexity filter): " +
        "counts trained on the even-doc_id half, scored corpus-wide — seen " +
        "bigrams score cb/c_prev, unseen back off to the add-1 unigram; the " +
        "bigram stream collapses to (doc,prev,cur,tf) cells before the " +
        "count-keyed scoring joins"),

    Q("x30_dedup_blocks",
      // blockTokens=2 is the granularity at which the fixture's docs
      // actually repeat (174/500 docs trim at sf0.001) — the op must
      // demonstrably cut, not just round-trip
      (s, dir) => TextAnalysis.dedupBlocksWithinDoc(
        col("doc_id"), col("text"), blockTokens = 2)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |e AS (SELECT doc_id, t,
             |        unnest(range(0, CAST(ceil(len(t)/2.0) AS BIGINT))) AS i
             |      FROM toks),
             |blk AS (SELECT doc_id, CAST(i AS INT) AS idx,
             |          array_to_string(t[CAST(i*2+1 AS INT):CAST(i*2+2 AS INT)], ' ') AS b
             |        FROM e),
             |firsts AS (SELECT doc_id, b, min(idx) AS idx FROM blk
             |           GROUP BY doc_id, b)
             |SELECT doc_id, string_agg(b, ' ' ORDER BY idx) AS clean_text
             |FROM firsts GROUP BY doc_id""".stripMargin),
      "X1 intra-document repeated-block trim: first occurrence of each " +
        "distinct 2-token block survives, in order — the within-doc cut for " +
        "looping/template pages; per-doc aggregates only, no join, no window"),

    Q("x60_clean_blocks",
      // the C4 "line without common words" cut adapted to 8-token
      // blocks: nav/keyword/tag-soup spans carry no stopwords and are
      // trimmed; docs whose every block fails emit no row
      (s, dir) => TextAnalysis.cleanBlocks(
        col("doc_id"), col("text"), blockTokens = 8)(docs(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              |e AS (SELECT doc_id, t,
              |        unnest(range(0, CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
              |      FROM toks),
              |blk AS (SELECT doc_id, CAST(i AS INT) AS idx,
              |          array_to_string(t[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS b
              |        FROM e),
              |kept AS (SELECT * FROM blk
              |         WHERE len(list_filter(string_split(b, ' '),
              |                 x -> x IN ${Texts.enStopwordsSql})) >= 1)
              |SELECT doc_id, count(*) AS n_kept,
              |       string_agg(b, ' ' ORDER BY idx) AS clean_text
              |FROM kept GROUP BY doc_id""".stripMargin),
      "X3 block-level content cleaning (C4's no-stopword-span cut at " +
        "8-token blocks): codegen'd stopword-count gate per block, " +
        "in-order reassembly — per-doc work only, no join, no window"),

    Q("x63_temporal_split",
      // leakage-free temporal train/eval split with an EMBARGO gap (the
      // forecasting-eval protocol: events inside [cut, cut+gap) are
      // dropped so label windows that straddle the cut can't leak
      // future information into training). Cut = in-plan 0.8 quantile
      // of the event time, one scalar broadcast, map-only labeling; at
      // 100 TB swap percentile for percentile_approx as in x18.
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_id"), col("ts_us"))
        val cut = ev.agg(percentile(col("ts_us"), lit(0.8)).as("t_cut"))
        ev.crossJoin(broadcast(cut))
          .select(col("event_id"),
            when(col("ts_us") < col("t_cut"), lit("train"))
              .when(col("ts_us") < col("t_cut") + lit(300000000L), lit("embargo"))
              .otherwise(lit("eval")).as("split"))
      },
      Some("""WITH c AS (SELECT quantile_cont(epoch_us(ts), 0.8) AS t_cut FROM events)
             |SELECT event_id,
             |       CASE WHEN epoch_us(ts) < t_cut THEN 'train'
             |            WHEN epoch_us(ts) < t_cut + 300000000 THEN 'embargo'
             |            ELSE 'eval' END AS split
             |FROM events CROSS JOIN c""".stripMargin),
      "X3 leakage-free temporal split with a 5-minute embargo gap at the " +
        "0.8 time quantile: the forecasting-eval protocol as one scalar " +
        "broadcast + a map-only labeling pass"),

    Q("x62_concat_chunks",
      // GPT-style concat-and-chunk: global token offsets via the
      // distributed prefix-sum (scan twin of the range-rank play), one
      // row per (doc, training sequence) span — long docs split across
      // sequence boundaries, every token lands exactly once. The oracle
      // states the single-reducer window form; the engine never plans it.
      (s, dir) => TextAnalysis.concatChunks(
        col("doc_id"), col("text"), seqLen = 512)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
             |          FROM documents
             |          WHERE len(string_split(text, ' ')) > 0),
             |sp AS (SELECT doc_id, n,
             |         CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS o
             |       FROM t),
             |e AS (SELECT doc_id, n, o,
             |        unnest(range(o // 512, (o + n - 1) // 512 + 1)) AS seq_id
             |      FROM sp)
             |SELECT doc_id, seq_id,
             |       CAST(greatest(0, seq_id * 512 - o) AS BIGINT) AS doc_tok_start,
             |       CAST(least((seq_id + 1) * 512, o + n)
             |            - greatest(seq_id * 512, o) AS BIGINT) AS n_toks
             |FROM e""".stripMargin),
      "X3 GPT-style concat-and-chunk packing (fixed 512-token training " +
        "sequences, docs split at boundaries): distributed prefix-sum " +
        "for the global token offset — no sum() OVER global window, no " +
        "single-reducer stage; map-only span emission after the scan"),

    Q("x62b_shuffled_chunks",
      // x62 in the epoch's actual training order: seeded-md5 document
      // permutation, then cut every 512 tokens — the layout a training
      // run streams; same prefix-sum plan, different total order
      (s, dir) => TextAnalysis.concatChunksShuffled(
        col("doc_id"), col("text"), seqLen = 512, seed = "e0")(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
             |            md5('e0:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents
             |          WHERE len(string_split(text, ' ')) > 0),
             |sp AS (SELECT doc_id, n,
             |         CAST(sum(n) OVER (ORDER BY h, doc_id) - n AS BIGINT) AS o
             |       FROM t),
             |e AS (SELECT doc_id, n, o,
             |        unnest(range(o // 512, (o + n - 1) // 512 + 1)) AS seq_id
             |      FROM sp)
             |SELECT doc_id, seq_id,
             |       CAST(greatest(0, seq_id * 512 - o) AS BIGINT) AS doc_tok_start,
             |       CAST(least((seq_id + 1) * 512, o + n)
             |            - greatest(seq_id * 512, o) AS BIGINT) AS n_toks
             |FROM e""".stripMargin),
      "X3 concat-and-chunk in the seeded epoch order (md5 permutation " +
        "before the cut): the layout a training run actually streams — " +
        "reproducible, new seed = new epoch; same distributed prefix-sum " +
        "plan as x62"),

    Q("x61_mergeable_card",
      // the INCREMENTAL data card: per-shard stats whose merge is exact
      // (integer sums) or sketch-mergeable (HLL vocab registers union by
      // per-register max, so merged == single-pass BIT-EXACTLY) — the
      // pattern a 100 TB corpus needs to keep its card current without
      // re-scanning history: each new shard contributes one card row,
      // the merge touches |shards| rows. Shards simulated as doc_id%4.
      (s, dir) => {
        val base = docs(s, dir).select((col("doc_id") % 4).as("shard"),
          col("source"), Texts.tokens(col("text")).as("t"))
        val docCards = base.groupBy(col("shard"), col("source"))
          .agg(count(lit(1)).as("nd"), sum(size(col("t")).cast("long")).as("nt"))
        val vocabCards = base
          .select(col("shard"), col("source"), explode(col("t")).as("term"))
          .groupBy(col("shard"), col("source"))
          .agg(hll_sketch_agg(col("term")).as("sk"))
        docCards.join(vocabCards, Seq("shard", "source"))
          .groupBy(col("source"))
          .agg(sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("vocab_est"))
      },
      None, // HLL registers are not DuckDB-reproducible; exactness of the
            // merge + sums and the estimate's error are x61_card_check
      "X3 mergeable per-shard data card (incremental corpus stats): " +
        "integer sums + HLL vocab sketches per (shard, source), merged " +
        "per source — shard-local scans, |shards| x |sources|-row merge, " +
        "history never re-scanned"),

    Q("x31_quantize_int8",
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("vec_id"),
          array_min(col("embedding")).cast("double").as("qmin"),
          array_max(col("embedding")).cast("double").as("qmax"),
          array_join(graft.functions.QuantizeInt8(col("embedding")), " ")
            .as("codes")),
      // codes as a space-joined string so the driver's value hash sees a
      // plain varchar; CASTs to DOUBLE keep DuckDB out of float32
      // arithmetic (the expression computes in double throughout)
      Some("""WITH e AS (SELECT vec_id, embedding,
             |  CAST(list_min(embedding) AS DOUBLE) AS qmin,
             |  CAST(list_max(embedding) AS DOUBLE) AS qmax FROM embeddings)
             |SELECT vec_id, qmin, qmax,
             |  CASE WHEN qmax > qmin THEN array_to_string(
             |    [CAST(round((CAST(x AS DOUBLE) - qmin)
             |                / ((qmax - qmin) / 255.0)) AS INT)
             |     for x in embedding], ' ')
             |  ELSE array_to_string([0 for x in embedding], ' ') END AS codes
             |FROM e""".stripMargin),
      "X2 per-vector int8 scalar quantization of the embedding store (4x " +
        "storage/scan cut before ANN serving): map-only native codegen, " +
        "round-half-up codes 0..255 with per-vector min/max for exact " +
        "dequantization — no shuffle, no state"),

    Q("x32_cluster_mixture",
      (s, dir) => {
        val m = trainedModel(s, dir)
        // one embedding-keyed join attaches each doc's semantic cluster
        // (codegen literal-argmax over the driver-held trained centers —
        // zero shuffle to assign), then the token-budget mixture routes on
        // cluster exactly as x19 routes on source
        val assigned = docs(s, dir).join(
          Tables.embeddings(s, dir).select(col("vec_id"),
            Clustering.assignTo(L2Normalize(col("embedding")), m)
              .cast("string").as("cluster")),
          col("doc_id") === col("vec_id"))
        val targets = m.centers.indices
          .map(i => i.toString -> 1.0 / m.centers.length).toMap
        TextAnalysis.mixToTokenBudget(col("doc_id"), col("cluster"),
          size(Texts.tokens(col("text"))), targets, 2000L)(assigned)
          .select(col("doc_id"), col("cluster").cast("int").as("cluster"))
      },
      None, // cluster assignments come from the driver-trained model;
            // invariants in x32_mixture_check
      "cluster-balanced token mixture (semantic diversity balancing): " +
        "uniform per-cluster token budgets over trained k-means assignments " +
        "— over-represented semantic clusters are down-sampled by the same " +
        "deterministic md5 routing as x19, so the training mix is balanced " +
        "by MEANING, not just by source label"),

    Q("x33_ann_ivfpq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfPqTopK(corpus, queries,
          Clustering.centroidsDf(s, trainedModel(s, dir)),
          trainedPqCodebooks(s, dir), k = 3, nprobe = 2)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      None, // both index structures come from in-engine k-means (not
            // SQL-reproducible); invariants in x33_ivfpq_check
      "X2 IVF-PQ composite ANN (the FAISS IndexIVFPQ shape): trained coarse " +
        "routing cuts the scanned fraction to nprobe/nlist, trained PQ codes " +
        "cut bytes per scanned candidate from 4*dim to m — both index " +
        "structures built in-engine and applied in one map pass"),

    Q("x34_dedup_spans",
      (s, dir) => TextAnalysis.dedupSpansAcrossDocs(
        col("doc_id"), col("text"), spanTokens = 3)(docs(s, dir)),
      // mirror of dedupSpansAcrossDocs: sliding 3-token spans, a span in
      // >= 2 distinct docs is cut everywhere except min(doc_id); DuckDB
      // slices are 1-based inclusive, range() is exclusive-end
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |occ AS (SELECT doc_id, CAST(i AS INT) AS i,
             |          array_to_string(t[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS sp
             |        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
             |              FROM toks WHERE len(t) >= 3)),
             |owners AS (SELECT sp, min(doc_id) AS owner FROM occ
             |           GROUP BY sp HAVING count(DISTINCT doc_id) >= 2),
             |cut AS (SELECT DISTINCT o.doc_id, o.i + j.r AS pos
             |        FROM occ o JOIN owners w USING (sp)
             |        CROSS JOIN (SELECT unnest(range(0, 3)) AS r) j
             |        WHERE o.doc_id <> w.owner),
             |alltok AS (SELECT doc_id, CAST(p AS INT) AS pos, t[CAST(p AS INT)] AS tok
             |           FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM toks)),
             |kept AS (SELECT a.doc_id, a.pos, a.tok FROM alltok a
             |         LEFT JOIN cut c ON a.doc_id = c.doc_id AND a.pos = c.pos
             |         WHERE c.pos IS NULL)
             |SELECT t.doc_id,
             |       coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS clean_text
             |FROM toks t LEFT JOIN kept k USING (doc_id)
             |GROUP BY t.doc_id""".stripMargin),
      "X1 cross-document exact-substring dedup (the ExactSubstr cut of Lee " +
        "et al. ACL 2022, at shingle granularity): any 3-token span " +
        "appearing verbatim in >= 2 docs survives only in its min-doc_id " +
        "owner — sliding spans catch duplicated passages at any alignment, " +
        "overlaps merge by position union, and exactly one copy survives " +
        "the corpus; ownership is one hash aggregate, never a pair join"),

    Q("x35_ann_int8",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.quantizedTopK(corpus, queries, 3)
          .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
      },
      // mirror of quantizedTopK: the oracle scores the same algebraic ADC
      // expansion over the same int8 codes (x31 proved code parity), so
      // both engines agree to fp rounding; sims rounded to 4 on output
      Some("""WITH c AS (SELECT vec_id AS id,
             |    CAST(list_min(embedding) AS DOUBLE) AS mn,
             |    (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS sc,
             |    (CASE WHEN list_max(embedding) > list_min(embedding)
             |      THEN [CAST(round((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
             |            / ((CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0)) AS INT)
             |            for x in embedding]
             |      ELSE [0 for x in embedding] END)::DOUBLE[] AS codes
             |  FROM embeddings),
             |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 5),
             |s AS (SELECT qid, id,
             |        (mn * list_sum(qvec) + sc * list_dot_product(qvec, codes))
             |        / (sqrt(list_dot_product(qvec, qvec))
             |           * sqrt(len(codes) * mn * mn + 2 * mn * sc * list_sum(codes)
             |                  + sc * sc * list_dot_product(codes, codes))) AS simx
             |      FROM c JOIN q ON id <> qid)
             |SELECT qid, rank, id, round(simx, 4) AS sim FROM (
             |  SELECT qid, id, simx,
             |         row_number() OVER (PARTITION BY qid ORDER BY simx DESC, id) AS rank
             |  FROM s)
             |WHERE rank <= 3""".stripMargin),
      "X2 ANN serving over the int8-quantized store (x31's 4x cut made " +
        "queryable): ADC scoring never dequantizes — one codegen dot over " +
        "the codes plus O(1) per-row constants, exact DuckDB oracle"),

    Q("x36_knn_graph",
      (s, dir) => {
        val corpus = Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        Similarity.knnGraph(corpus, nBits = 0, dim = 64, k = 3, bands = 2)
          .select(col("src"), col("rank"), col("dst"), round(col("sim"), 4).as("sim"))
      },
      None, // hash-derived hyperplanes are not SQL-reproducible;
            // invariants in x36_knn_check
      "X2 k-NN graph over the whole corpus (input to graph clustering / " +
        "SemDeDup variants): OR-amplified 2-band hyperplane LSH self-join " +
        "on one reused (band, bucket) exchange, band-deduped pairs, " +
        "bounded per-source top-k — never all-pairs; nBits=0 derives the " +
        "bucket width from corpus size so candidate volume stays linear"),

    Q("x37_data_card",
      (s, dir) => TextAnalysis.dataCard(
        col("source"), col("lang"), col("text"))(docs(s, dir)),
      Some("""WITH pd AS (SELECT source, lang, md5(text) AS fp,
             |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |            FROM documents),
             |fc AS (SELECT fp, count(*) AS fp_c FROM pd GROUP BY fp)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
             |       count(DISTINCT lang) AS n_langs,
             |       CAST(sum(CASE WHEN fp_c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
             |FROM pd JOIN fc USING (fp)
             |GROUP BY source""".stripMargin),
      "X3 per-source data card (the release report of a curated corpus): " +
        "doc/token counts, token extremes, language breadth, corpus-wide " +
        "exact-dup exposure — one fp-keyed exchange reused by aggregate and " +
        "join, map-side-combined source rollup, all-integer (hash-safe)"),

    Q("x38_split_leakage",
      // leakage audit: near-dup pairs that STRADDLE the train/val/test
      // boundary — the contamination a random doc-level split bakes into
      // held-out loss. Pure composition of x2's pair generator and x6b's
      // deterministic split; the |docs|-sized split frame broadcasts into
      // the (tiny by construction) near-dup pair set.
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = nearDupPairs(s, dir) // shared pair artifact (see memo)
        val split = d.select(col("doc_id"),
          TextAnalysis.assignSplit(col("doc_id"),
            Seq(0.8, 0.1, 0.1), Seq("train", "val", "test")).as("split"))
        pairs
          .join(split.select(col("doc_id").as("a"), col("split").as("split_a")), "a")
          .join(split.select(col("doc_id").as("b"), col("split").as("split_b")), "b")
          .filter(col("split_a") =!= col("split_b"))
          .select(col("a"), col("b"), col("split_a"), col("split_b"), col("jaccard"))
      },
      Some {
        val Seq(t1, t2) = TextAnalysis.splitThresholds(Seq(0.8, 0.1, 0.1))
        s"""WITH $ngramPairsCte,
           |sp AS (SELECT doc_id,
           |         CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$t1' THEN 'train'
           |              WHEN md5(CAST(doc_id AS VARCHAR)) < '$t2' THEN 'val'
           |              ELSE 'test' END AS split
           |       FROM documents)
           |SELECT jp.a, jp.b, sa.split AS split_a, sb.split AS split_b, jaccard
           |FROM jp
           |JOIN sp sa ON sa.doc_id = jp.a
           |JOIN sp sb ON sb.doc_id = jp.b
           |WHERE sa.split <> sb.split""".stripMargin
      },
      "X2/X3 cross-split leakage audit: near-dup pairs straddling the " +
        "train/val/test boundary (held-out contamination a doc-level " +
        "random split admits) — x2 pair generation composed with x6b's " +
        "md5 split, split frame broadcast onto the near-dup graph"),

    Q("x39_length_batches",
      (s, dir) => TextAnalysis.lengthBatches(col("doc_id"), col("text"), 8)(
        docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id,
             |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |          FROM documents)
             |SELECT doc_id, n_tokens,
             |       (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 8 AS batch_id
             |FROM t""".stripMargin),
      "X3 length-bucketed inference batching (minimal padding waste): " +
        "batch_id = global (n_tokens, doc_id) rank div 8, computed WITHOUT " +
        "a single-reducer sort — range repartition + per-range local rank " +
        "+ driver prefix-summed |partitions|-sized offsets"),

    Q("x40_contamination_score",
      // graded contamination, where x8 is a boolean drop: per corpus doc,
      // the fraction of its DISTINCT 8-token shingles present in the eval
      // set — the audit that decides between dropping a doc and trimming
      // the contaminated span. Docs with < 8 tokens have no shingles and
      // no row (x2's convention). Integer counts + one final IEEE double
      // division, bit-equal in both engines.
      (s, dir) => {
        val d = docs(s, dir)
        val docSh = Texts.explodedShingles(
          d.filter(col("doc_id") >= 50), col("doc_id"), col("text"), 8).distinct()
        val benchSh = Texts.explodedShingles(
            d.filter(col("doc_id") < 50), col("doc_id"), col("text"), 8)
          .select(col("s")).distinct()
        docSh.join(broadcast(benchSh.withColumn("hit", lit(1L))), Seq("s"), "left")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
          .select(col("id").as("doc_id"), col("n_shingles"), col("n_contaminated"),
            (col("n_contaminated").cast("double") / col("n_shingles"))
              .as("contamination"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh0 AS (SELECT doc_id,
             |          unnest([array_to_string(toks[i:i+7], ' ')
             |                  for i in range(1, len(toks) - 6)]) AS s
             |        FROM toks WHERE len(toks) >= 8),
             |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE doc_id >= 50),
             |bs AS (SELECT DISTINCT s FROM sh0 WHERE doc_id < 50)
             |SELECT sh.doc_id, count(*) AS n_shingles,
             |       CAST(sum(CASE WHEN bs.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_contaminated,
             |       CAST(sum(CASE WHEN bs.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |         / count(*) AS contamination
             |FROM sh LEFT JOIN bs ON sh.s = bs.s
             |GROUP BY sh.doc_id""".stripMargin),
      "X2 graded contamination score (x8's boolean drop refined to a " +
        "fraction): per corpus doc, share of its distinct 8-token shingles " +
        "in the eval set — broadcast hit-set onto the corpus shingle " +
        "stream, integer counts, one final IEEE division"),

    Q("x41_seeded_shuffle",
      (s, dir) => TextAnalysis.seededShuffle(col("doc_id"), "s42", 8)(
        docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id,
             |            md5('s42:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents),
             |r AS (SELECT doc_id,
             |        row_number() OVER (ORDER BY h, doc_id) - 1 AS p FROM t)
             |SELECT doc_id, p AS shuffle_pos, p % 8 AS shard,
             |       p // 8 AS shard_pos FROM r""".stripMargin),
      "deterministic seeded global shuffle for training-data ordering: " +
        "total order by md5(seed||id) with round-robin shard + " +
        "within-shard position — reproducible across engines/runs/" +
        "retries, ranked by the range-partition play (no single-reducer " +
        "sort, no RNG state)"),

    Q("x42_cluster_split",
      // leakage-free split assignment — the FIX for what x38 audits:
      // near-dup docs must land in the SAME split or eval leaks train
      // data, so the split key is the doc's dup-cluster canonical id
      // (x2e), not the doc id (x6b). Every member of a cluster routes
      // together; singletons reduce to x6b's per-doc md5 routing.
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = nearDupPairs(s, dir) // shared pair artifact (see memo)
        Dedup.canonicalize(d.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("canonical"),
            TextAnalysis.assignSplit(col("canonical"),
              Seq(0.8, 0.1, 0.1), Seq("train", "val", "test")).as("split"))
      },
      Some {
        val Seq(t1, t2) = TextAnalysis.splitThresholds(Seq(0.8, 0.1, 0.1))
        s"""WITH RECURSIVE $ngramPairsCte,
           |edges AS (SELECT a AS x, b AS y FROM jp UNION SELECT b, a FROM jp),
           |reach AS (SELECT x, y FROM edges
           |          UNION
           |          SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
           |canon AS (SELECT d.doc_id,
           |            least(d.doc_id, coalesce(min(r.y), d.doc_id)) AS canonical
           |          FROM documents d LEFT JOIN reach r ON r.x = d.doc_id
           |          GROUP BY d.doc_id)
           |SELECT doc_id, canonical,
           |  CASE WHEN md5(CAST(canonical AS VARCHAR)) < '$t1' THEN 'train'
           |       WHEN md5(CAST(canonical AS VARCHAR)) < '$t2' THEN 'val'
           |       ELSE 'test' END AS split
           |FROM canon""".stripMargin
      },
      "leakage-free train/val/test split: route each doc by its " +
        "dup-cluster canonical id so near-dups always share a split " +
        "(x2e canonicalization + x6b md5 routing, composed)"),

    Q("x6j_curation_v5",
      // the round-7 ops COMPOSED: Gopher hard gate (x55 pass
      // conjunction) → exact dedup (deterministic min-doc_id survivor
      // per text fingerprint) → per-source eval carve (first 3 in the
      // seeded per-source order = 'eval', rest 'train' — x58's rank,
      // unfiltered). Each stage is the catalog operator unchanged;
      // map-only gate, one fingerprint window, one range-rank.
      (s, dir) => {
        val d = docs(s, dir)
        // gopherPassExpr, not gopherRules+filter: the boolean conjunction
        // short-circuits in codegen (cheap split/contains rules first, the
        // two regex scans only for rows still alive), and the gate fuses
        // into the scan as one filter — no join, no second scan
        val gated = d.filter(TextAnalysis.gopherPassExpr(
          col("text"), Texts.enStopwords))
        // NO localCheckpoint before the rank, deliberately: the range
        // sample and offsets jobs column-prune to (doc_id, source), so
        // the heavy gate expressions don't re-run for them (DevV5Probe:
        // checkpoint was neutral at sf3, ~2x at sf0.1)
        val surv = Dedup.exact(Seq(md5(col("text"))), col("doc_id"))(gated)
          .select(col("doc_id"), col("source"))
        TextAnalysis.perSourceRank(col("doc_id"), col("source"), "v5")(surv)
          .select(col("doc_id"), col("source"),
            when(col("source_pos") < 3, lit("eval")).otherwise(lit("train"))
              .as("split"))
      },
      Some {
        s"""WITH gs AS ($gopherStatsSql),
           |gate AS (SELECT doc_id FROM gs
           |         WHERE n_words BETWEEN 50 AND 100000
           |           AND mean_word_len BETWEEN 3.0 AND 10.0
           |           AND alpha_ratio >= 0.8 AND symbol_ratio <= 0.1
           |           AND stop_hits >= 2),
           |surv AS (SELECT doc_id, source FROM (
           |           SELECT d.doc_id, d.source,
           |             row_number() OVER (PARTITION BY md5(d.text)
           |                                ORDER BY d.doc_id) AS rn
           |           FROM documents d JOIN gate USING (doc_id))
           |         WHERE rn = 1),
           |r AS (SELECT doc_id, source,
           |        row_number() OVER (PARTITION BY source
           |          ORDER BY md5('v5:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
           |          AS pos
           |      FROM surv)
           |SELECT doc_id, source,
           |       CASE WHEN pos < 3 THEN 'eval' ELSE 'train' END AS split
           |FROM r""".stripMargin
      },
      "X3 curation v5: Gopher hard gate -> exact-dedup survivor -> " +
        "per-source exact-k eval carve (x55 + x1 + x58 composed); the " +
        "split is seeded, leakage-free at the exact-dup grain, and " +
        "every stage is the catalog operator unchanged"),

    Q("x55_gopher_rules",
      // the published Gopher hard-gate rule set (word-count bounds, mean
      // word length band, symbol + alpha-word ratios, required-stopword
      // minimum) as 0/1 flags + conjunction; the stopword list is the
      // corpus's own (Texts.enStopwords) per the rule's "common words"
      // definition. Every rule a codegen'd expression over one scan.
      (s, dir) => TextAnalysis.gopherRules(
        col("doc_id"), col("text"), Texts.enStopwords)(docs(s, dir)),
      Some {
        s"""WITH t AS ($gopherStatsSql),
           |f AS (
           |  SELECT *,
           |    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_word_count,
           |    CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS r_mean_len,
           |    CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS r_alpha,
           |    CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS r_symbol,
           |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop
           |  FROM t)
           |SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
           |       stop_hits, r_word_count, r_mean_len, r_alpha, r_symbol, r_stop,
           |       r_word_count * r_mean_len * r_alpha * r_symbol * r_stop AS pass
           |FROM f""".stripMargin
      },
      "X3 Gopher-style hard rule gate (Rae et al. 2021 A1.1): per-rule " +
        "0/1 flags + conjunction, every rule a plain codegen'd expression " +
        "over the single scan — the boolean pre-filter complement of " +
        "x4c's soft quality score; map-only, zero shuffle"),

    Q("x56_fertility",
      // tokenizer-fertility stats per source — the data-card measure of
      // tokenizer fit: BPE-ish subword tokens per whitespace word
      // (fertility ~1 = vocabulary matches the register; >>1 = the
      // tokenizer shreds this source) and chars per subword token
      // (compression). Integer sums per source (map-side combine over
      // |sources| keys), two IEEE divisions at the end — scan-bound at
      // any scale, same regex both engines.
      (s, dir) => docs(s, dir)
        .select(col("source"),
          size(Texts.bpeishTokens(col("text"))).cast("long").as("nb"),
          size(Texts.tokens(col("text"))).cast("long").as("nw"),
          length(col("text")).cast("long").as("nc"))
        .groupBy(col("source"))
        .agg(sum(col("nb")).as("n_bpeish"), sum(col("nw")).as("n_words"),
          sum(col("nc")).as("n_chars"))
        .select(col("source"), col("n_bpeish"), col("n_words"), col("n_chars"),
          round(col("n_bpeish").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars").cast("double") / col("n_bpeish"), 6).as("chars_per_token")),
      Some("""SELECT source,
             |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_bpeish,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
             |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |  round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS DOUBLE)
             |    / sum(len(string_split(text, ' '))), 6) AS fertility,
             |  round(CAST(sum(length(text)) AS DOUBLE)
             |    / sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))), 6) AS chars_per_token
             |FROM documents
             |GROUP BY source""".stripMargin),
      "X3 per-source tokenizer fertility (subword tokens per word, chars " +
        "per token) for the data card: x4e's pretokenizer counts rolled " +
        "up per source — integer sums, one tiny keyed aggregate"),

    Q("x57_embedding_outliers",
      // embedding-side quality filter over the shared trained index:
      // flag rows whose cosine to their assigned centroid falls > 2
      // cluster sigmas below the cluster mean (mojibake / truncation /
      // wrong-modality vectors). Cluster stats over integer-quantized
      // sims — exact sums, so the flag boundary is bit-deterministic
      // across runs/partitionings.
      (s, dir) => Clustering.embeddingOutliers(
        Tables.embeddings(s, dir), col("vec_id"), col("embedding"),
        trainedModel(s, dir)),
      None, // trained centers are not SQL-reproducible; arithmetic,
            // assignment and the Chebyshev bound verified by x57_outlier_check
      "X2 embedding outlier detection vs the trained k-means index " +
        "(SemDeDup's complement: prune the too-DISSIMILAR): one map-only " +
        "assignment scan + k-row integer stats + broadcast threshold join"),

    Q("x58_source_sample",
      // fixed-size per-stratum carving: exactly k docs per source by the
      // seeded md5 order — the eval-set shape x6c (rate, binomial sizes)
      // and x47 (global k) don't give. Range-rank play, no per-source
      // window funnel.
      (s, dir) => TextAnalysis.samplePerSource(
        col("doc_id"), col("source"), "sE", 5)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, source,
             |            md5('sE:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
             |          AS source_pos
             |      FROM t)
             |SELECT doc_id, source, source_pos FROM r WHERE source_pos < 5""".stripMargin),
      "X3 per-source exact-k sample (fixed-size per-stratum eval carving, " +
        "seeded md5 order): per-source rank via the global range-rank + " +
        "|sources|-row offset broadcast — no row_number() OVER (PARTITION " +
        "BY source) hot-source funnel; exact window-form oracle")
  )
}
