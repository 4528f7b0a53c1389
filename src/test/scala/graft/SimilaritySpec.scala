package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.functions.{GraftFunctions, TopKByScore}

/** Similarity-search tests: the native cosine expression against the HOF
  * formulation and hand values, the bounded top-k aggregate against the
  * window-rank formulation, and the ANN paths' agreement with brute force.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.6f, 0.8f, 0.0f))).toDF("id", "vec")

  test("native cosine matches hand values: orthogonal=0, identical=1, opposite=-1") {
    val pairs = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)).toDF("a", "b", "expected")
    val out = pairs.select(Similarity.cosine(col("a"), col("b")).as("sim"), col("expected"))
    out.collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("native cosine is bit-identical to the HOF formulation (same fold order)") {
    val cross = vecs.as("l").crossJoin(vecs.as("r"))
    val out = cross.select(
      Similarity.cosine(col("l.vec"), col("r.vec")).as("native"),
      Similarity.cosineHof(col("l.vec"), col("r.vec")).as("hof"))
    out.collect().foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
  }

  test("TopKByScore equals window-rank top-k, including tiebreaks") {
    val scored = Seq(
      ("q", 0.9, 10L), ("q", 0.9, 7L), ("q", 0.8, 1L), ("q", 0.95, 3L), ("q", 0.1, 2L),
      ("p", 0.5, 1L)).toDF("qid", "sim", "id")
    val viaAgg = scored.groupBy("qid")
      .agg(TopKByScore(3)(col("sim"), col("id")).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"), col("col.score").as("sim"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
    assert(rowsOf(viaAgg) === rowsOf(viaWindow))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak, excludes self") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(vecs, queries, 2)
      .select(col("qid"), col("rank"), col("id"))
    // nearest to (1,0,0) excluding itself: id2 (cos≈.707) then id4 (cos=.6)
    assert(rowsOf(out) === Set(Seq(0L, 1, 2L), Seq(0L, 2, 4L)))
  }

  test("ivfTopK with one centroid per region agrees with brute force inside the bucket") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    // centroids: x-axis and y-axis → corpus split by nearest axis
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val out = Similarity.ivfTopK(vecs, queries, centroids, 2)
      .select(col("qid"), col("rank"), col("id"))
    // bucket(x-axis) = {0, 2(tie→lower cid=0), 3? cos(-1,x)= -1 vs y 0 → bucket 1}
    // corpus bucket0 = {0, 2}; query 0 routed to bucket0; top-2 excl self = {2}
    assert(rowsOf(out) === Set(Seq(0L, 1, 2L)))
  }

  test("ivfTopK centroid assignment plans no shuffle for the corpus side") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val plan = Similarity.ivfTopK(vecs, queries, centroids, 2)
      .queryExecution.executedPlan.toString
    // exactly one exchange: the final top-k aggregation shuffle on qid;
    // assignment itself is a map-only projection (round 1 had a
    // corpus×centroids join + per-id window = two more exchanges)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("SQL registration exposes cosine_similarity, dot_product and l2_normalize to spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |       l2_normalize(array(3.0D, 4.0D)) AS n""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 23.0)
    assert(r.getSeq[Double](2) === Seq(0.6, 0.8))
  }

  test("SQL registration exposes the text ops: quality_score, redact_pii, normalize_text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quality_score('the cat is on the mat') AS q,
        |       redact_pii('mail a@b.co now') AS red,
        |       normalize_text('  Hello,   WORLD!! ') AS norm""".stripMargin)
      .collect()(0)
    // same value as the Column API (differentially checked in TextAnalysisSpec)
    // 6 tokens, 5 distinct, 4 stopword hits, summed token length 16
    assert(math.abs(r.getDouble(0) -
      ((5.0 / 6.0) * 0.5 + (4.0 / 6.0) * 0.25 + (16.0 / 6.0) * 0.05)) < 1e-12)
    assert(r.getString(1) === "mail <EMAIL> now")
    assert(r.getString(2) === "hello world")
  }

  test("SQL registration exposes the native counters: hamming_distance + char-class counts") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT hamming_distance('karolin', 'kathrin') AS h,
        |       alpha_word_count('abc 123 x9 !!') AS a,
        |       symbol_mark_count('a#b...c....') AS s,
        |       stopword_hits('the cat and the hat') AS w""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 2) // 'abc', 'x9'
    assert(r.getInt(2) === 3) // '#', '...', '...' (fourth dot unmatched)
    assert(r.getInt(3) === 3) // 'the' twice + 'and'
  }

  test("SQL registration exposes stopword_presence and gopher_pass, bit-equal to the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT stopword_presence('the cat and the hat and more') AS p,
        |       gopher_pass('the cat') AS g""".stripMargin).collect()(0)
    assert(r.getInt(0) === 2) // 'the' + 'and' present; repeats don't add
    assert(!r.getBoolean(1)) // 2 words — fails the word-count rule
    // differential on the corpus: per-doc SQL verdicts must equal the
    // Column API's exactly (shared kernels + identical literal trees)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("gopher_sql_docs")
    val sqlSide = spark.sql(
      """SELECT doc_id, gopher_pass(text) AS pass,
        |       stopword_presence(text) AS sp FROM gopher_sql_docs""".stripMargin)
    val colSide = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.gopherPassExpr(col("text")).as("pass"),
      graft.functions.StopwordPresence(col("text"), graft.ops.Texts.enStopwords).as("sp"))
    assert(sqlSide.exceptAll(colSide).isEmpty && colSide.exceptAll(sqlSide).isEmpty)
    // the differential is over a non-trivial corpus with BOTH verdicts
    // represented at the sub-rule level (sf0.001 docs are all shorter than
    // the 50-word gate, so assert on stopword presence, which varies)
    assert(sqlSide.count() > 0)
    assert(sqlSide.select(countDistinct(col("sp"))).collect()(0).getLong(0) > 1)
    spark.catalog.dropTempView("gopher_sql_docs")
  }

  test("PQ: encode picks nearest codebook cells, reconstruction round-trips, ANN ranks by cell") {
    import graft.ops.Similarity
    // m=2 subvectors of dim 2; per-subvector codebook = the two unit axes
    val codebooks: Array[Array[Array[Float]]] = Array(
      Array(Array(1f, 0f), Array(0f, 1f)),
      Array(Array(1f, 0f), Array(0f, 1f)))
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f, 0.1f, 0.9f)), // cells (0, 1) — query's cell
      (20L, Array(0.1f, 0.9f, 0.9f, 0.1f)), // cells (1, 0) — opposite
      (30L, Array(1f, 0f, 0f, 1f))          // exactly the (0, 1) centroids
    ).toDF("id", "vec")
    val queries = Seq((1L, Array(1f, 0f, 0f, 1f))).toDF("qid", "qvec")

    val codes = corpus.select(col("id"),
        Similarity.pqEncode(col("vec"), codebooks).as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(10L) === Seq(0, 1))
    assert(codes(20L) === Seq(1, 0))
    assert(codes(30L) === Seq(0, 1))

    // a vector that IS a concatenation of entries reconstructs exactly
    val recon = corpus.filter(col("id") === 30L)
      .select(Similarity.pqReconstruct(
        Similarity.pqEncode(col("vec"), codebooks), codebooks).as("r"))
      .collect()(0).getSeq[Float](0)
    assert(recon === Seq(1f, 0f, 0f, 1f))

    // ANN: same-cell docs score 1.0 against the reconstructed centroids,
    // the opposite-cell doc scores below — quantized ranking is by cell
    val top = Similarity.pqTopK(corpus, queries, codebooks, 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(top.map(_._2).toSeq === Seq(10L, 30L, 20L)) // tie on sim=1 → lower id
    assert(top.take(2).forall(t => math.abs(t._3 - 1.0) < 1e-9))
    assert(top.last._3 < 0.1)
  }

  test("l2_normalize yields unit vectors; cosine of normalized = dot; zero vector stays zero") {
    import graft.functions.{DotProduct, L2Normalize}
    val df = Seq(
      (Array(3.0f, 4.0f), Array(1.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val out = df.select(
      DotProduct(L2Normalize(col("a")), L2Normalize(col("a"))).as("selfdot"),
      L2Normalize(col("a")).as("na"))
    val rows = out.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12) // unit norm
    assert(rows(1).getDouble(0) === 0.0) // zero vector → zeros, not NaN
    assert(rows(1).getSeq[Double](1) === Seq(0.0, 0.0))
  }

  test("embeddingDupPairs: only true pairs emitted; near-identical vectors found") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val out = Similarity.embeddingDupPairs(corpus, 2, 3, 0.99)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // near-identical vectors collide and verify
    // every emitted pair genuinely clears the threshold (verify step)
    out.collect().foreach(r => assert(r.getDouble(2) >= 0.99))
    // no pair involving the orthogonal/opposite vectors
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L || a == 4L || b == 4L })
  }

  test("embeddingDupPairs: cap bounds a degenerate corpus, bands dedup to one row per pair") {
    // 600 near-identical vectors: one hot bucket in every band. The gate
    // must hold the candidate side to ~cap so the pair join is linear in
    // the corpus, and a pair colliding in both bands must emit ONE row.
    val n = 600
    val degenerate = (0L until n.toLong)
      .map(i => (i, Array(1.0f, 1e-6f * i, 0.0f)))
      .toDF("id", "vec")
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      val p = Similarity.embeddingDupPairs(degenerate, 2, 3, 0.99,
        bands = 2, capPerBucket = 16)
      val rows = p.collect()
      val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.distinct.length === pairs.length, "band duplicates not folded")
      assert(pairs.forall { case (a, b) => a < b })
      rows.foreach(r => assert(r.getDouble(2) >= 0.99))
      val joinRows = p.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.condition.nonEmpty =>
          j.metrics("numOutputRows").value
      }.max
      assert(joinRows > 0, "pair-join metric not found")
      assert(joinRows < 4L * n * 16 * 2,
        s"hot bucket went quadratic: $joinRows pairs")
    } finally spark.conf.set(aqe, prev)
  }

  test("hyperplaneTopK returns correctly-ranked results within buckets") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.hyperplaneTopK(vecs, queries, 2, 3, 3)
    // bucket membership is hash-derived; just require: no self-match,
    // ranks contiguous from 1, sims non-increasing
    val rows = out.orderBy("rank").collect()
    assert(rows.forall(_.getLong(2) != 0L))
    val ranks = rows.map(_.getInt(1)).toSeq
    assert(ranks === (1 to rows.length))
    val sims = rows.map(_.getDouble(3)).toSeq
    assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b })
  }

  test("ivfProbeTopK with nprobe = nlist searches everything: equals brute force") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val probed = Similarity.ivfProbeTopK(vecs, queries, centroids, 3, nprobe = 2)
    val brute = Similarity.bruteForceTopK(vecs, queries, 3)
    assert(rowsOf(probed) === rowsOf(brute))
  }

  test("ivfProbeTopK recall grows with nprobe (nprobe=1 reduces to ivfTopK)") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val one = Similarity.ivfProbeTopK(vecs, queries, centroids, 3, nprobe = 1)
    val ivf = Similarity.ivfTopK(vecs, queries, centroids, 3)
    assert(rowsOf(one) === rowsOf(ivf))
    val two = Similarity.ivfProbeTopK(vecs, queries, centroids, 3, nprobe = 2)
    assert(two.count() >= one.count())
  }

  test("ivfTopK rejects centroid sets beyond the janino-realistic 4096 bound") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val tooMany = spark.range(4097)
      .select(col("id").as("cid"),
        array(lit(1.0f), lit(0.0f), lit(0.0f)).as("cvec"))
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, queries, tooMany, 3)
    }
    assert(err.getMessage.contains("4096"))
  }

  test("semanticDecontaminate keeps exactly the vectors far from every eval vector") {
    val corpus = Seq(
      (10L, Array(0.99f, 0.14f, 0.0f)), // close to eval A → dropped
      (11L, Array(0.0f, 0.0f, 1.0f)), // far from both → kept
      (12L, Array(0.1f, 0.99f, 0.0f))) // close to eval B → dropped
      .toDF("id", "vec")
    val evalVecs = Array(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
    val kept = Similarity.semanticDecontaminate(corpus, evalVecs, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L))
  }

  test("semanticDecontaminate guards the driver-held eval-set bound") {
    val corpus = Seq((0L, Array(1.0f))).toDF("id", "vec")
    val err = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, Array.empty, 0.5)
    }
    assert(err.getMessage.contains("1..4096"))
  }

  test("semDedup drops exactly the vectors with a closer lower-id cluster-mate") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f)), // near-dup of 0 → dropped
      (2L, Array(0.0f, 0.0f, 1.0f)), // alone in cluster 1
      (3L, Array(0.98f, 0.2f, 0.0f))) // cos to 0/1 < 0.99 → kept
      .toDF("id", "vec")
    val centers = Array(Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0))
    val out = rowsOf(Similarity.semDedup(corpus, centers, 0.99))
    assert(out === Set(
      Seq(0L, 0, false),
      Seq(1L, 0, true),
      Seq(2L, 1, false),
      Seq(3L, 0, false)))
  }

  test("semDedup survivors are pairwise far apart within every cluster") {
    // a chain 0~1~2 where cos(0,2) < θ: 1 and 2 both have a lower-id mate
    // above θ (the min-id rule drops by ANY mate, surviving or not), so
    // only 0 survives — and survivor pairs are trivially below θ
    val a = Array(1.0f, 0.0f)
    val b = Array(0.995f, 0.0998f) // cos(a,b) ≈ 0.995
    val c = Array(0.980f, 0.198f) // cos(b,c) ≈ 0.995, cos(a,c) ≈ 0.980
    val corpus = Seq((0L, a), (1L, b), (2L, c)).toDF("id", "vec")
    val centers = Array(Array(1.0, 0.0))
    val out = Similarity.semDedup(corpus, centers, 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> false, 1L -> true, 2L -> true))
  }

  test("ivfPqTopK with nprobe = nlist equals pqTopK: a full probe sweep is PQ brute force") {
    val queries = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val cbs = Array(Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f),
      Array(0.707f, 0.707f, 0.0f), Array(-1.0f, 0.0f, 0.0f)))
    val cols = Seq("qid", "rank", "id", "sim").map(col)
    val full = Similarity.ivfPqTopK(vecs, queries, centroids, cbs, 2, nprobe = 2)
    val pq = Similarity.pqTopK(vecs, queries, cbs, 2)
    assert(rowsOf(full.select(cols: _*)) === rowsOf(pq.select(cols: _*)))
  }

  test("ivfPqTopK with nprobe = 1 draws candidates only from the query's own bucket") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val cbs = Array(Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f),
      Array(0.707f, 0.707f, 0.0f), Array(-1.0f, 0.0f, 0.0f)))
    // bucket0 = {0, 2 (tie → lower cid)}; bucket1 = {1, 3 (cos −1 vs 0), 4}
    // query on the x-axis probes only bucket0 → sole candidate besides self is 2
    val out = Similarity.ivfPqTopK(vecs, queries, centroids, cbs, 3, nprobe = 1)
    assert(out.select(col("id")).collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("ivfPqTopK plans one exchange: index build is map-only, top-k is the sole shuffle") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val cbs = Array(Array(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
    val plan = Similarity.ivfPqTopK(vecs, queries, centroids, cbs, 2, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("quantizedTopK: ADC algebra equals cosine of the dequantized vectors, ranks match brute force") {
    import graft.functions.QuantizeInt8
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.quantizedTopK(vecs, queries, 4)
    // identity: sim == cosine(qvec, mn + c*sc) computed the explicit way
    val deq = vecs.select(col("id").as("id2"),
      QuantizeInt8(col("vec")).as("codes"),
      array_min(col("vec")).cast("double").as("mn"),
      ((array_max(col("vec")) - array_min(col("vec"))).cast("double") / 255.0).as("sc"))
      .select(col("id2"),
        expr("transform(codes, c -> mn + cast(c as double) * sc)").as("dvec"))
    out.join(deq, col("id") === col("id2"))
      .join(queries.select(col("qid"), col("qvec").as("qv")), "qid")
      .select(col("sim"), Similarity.cosineHof(col("qv"), col("dvec")).as("ref"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    // the fixture's sim gaps dwarf int8 error → same ids in the same order
    val exact = Similarity.bruteForceTopK(vecs, queries, 4)
      .select(col("qid"), col("rank"), col("id"))
    assert(rowsOf(out.select(col("qid"), col("rank"), col("id"))) === rowsOf(exact))
  }

  test("knnGraph equals the bucket-restricted window-rank formulation, across bands") {
    val g = Similarity.knnGraph(vecs, nBits = 2, dim = 3, k = 2, bands = 2)
    val b = (0 until 2).map(band => vecs.select(col("id"), col("vec"),
        lit(band).as("band"),
        Similarity.hyperplaneBucket(col("vec"), 2, 3, firstPlane = band * 2).as("bucket")))
      .reduce(_ union _)
    val pairs = b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("src"), col("r.id").as("dst"),
        // the HOF twin is bit-identical to the native expression, so the
        // distinct() collapses band duplicates exactly like the op's max()
        Similarity.cosineHof(col("l.vec"), col("r.vec")).as("sim"))
      .distinct()
    val ranked = pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))))
      .filter(col("rank") <= 2)
      .select(col("src"), col("rank"), col("dst"), col("sim"))
    assert(rowsOf(g) === rowsOf(ranked))
    assert(g.filter(col("src") === col("dst")).count() === 0)
  }

  test("knnGraph nBits=0 derives the bucket width from corpus size") {
    // below 1024 vectors the derivation clamps to the 4-bit floor, so
    // auto mode must produce EXACTLY the nBits=4 graph (same hyperplane
    // stream, same buckets); this pins the sentinel's floor and that the
    // derived width feeds the same band layout (firstPlane = band * bits)
    val auto = Similarity.knnGraph(vecs, nBits = 0, dim = 3, k = 2, bands = 2)
    val fixed = Similarity.knnGraph(vecs, nBits = 4, dim = 3, k = 2, bands = 2)
    assert(rowsOf(auto) === rowsOf(fixed))
  }

  test("knnGraph hot-bucket cap: a degenerate corpus stays linear, coverage total") {
    // 1000 near-identical vectors — every one lands in the SAME bucket of
    // every band, the distribution nBits cannot bound. Uncapped, the
    // self-join emits ~1000² × bands = 2M pairs; the cap gate must hold
    // the candidate side to ~capPerBucket so pair count is linear in the
    // corpus, while every source keeps full k coverage.
    val n = 1000
    val degenerate = (0L until n.toLong)
      .map(i => (i, Array(1.0f, 1e-6f * i, 0.0f)))
      .toDF("id", "vec")
    // AQE off so the join node (and its numOutputRows metric) is directly
    // visible in the executed plan
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      val g = Similarity.knnGraph(degenerate, nBits = 2, dim = 3, k = 3,
        bands = 2, capPerBucket = 16)
      val rows = g.collect()
      // total coverage: every vector probes its bucket and gets k edges
      assert(rows.map(_.getLong(0)).distinct.length === n)
      assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 3))
      // no self edges, ranks dense 1..3
      assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
      // the pair stream is bounded by corpus × ~cap × bands, not corpus²:
      // the hash gate keeps ~cap of 1000 per (band, bucket) (binomial,
      // std ~4), so the join emits ~n × kept × bands ≈ 32k pairs. Assert
      // with 4x slack — far below the 2M an uncapped self-join produces.
      val joinRows = g.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.condition.nonEmpty =>
          j.metrics("numOutputRows").value
      }.max
      assert(joinRows > 0, "pair-join metric not found")
      assert(joinRows < 4L * n * 16 * 2,
        s"hot bucket went quadratic: $joinRows pairs")
    } finally spark.conf.set(aqe, prev)
  }

  test("int8 quantization: hand values, constant-vector guard, dequant bound") {
    import graft.functions.QuantizeInt8
    // [0, 1, 2] → mn=0, sc=2/255; codes round((x)/sc): 0, 127.5→128, 255
    val df = Seq(
      (0L, Array(0.0f, 1.0f, 2.0f)),
      (1L, Array(3.0f, 3.0f, 3.0f))). // constant → all-zero codes, not NaN
      toDF("id", "vec")
    val out = df.select(col("id"), QuantizeInt8(col("vec")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(0L) === Seq(0, 128, 255))
    assert(out(1L) === Seq(0, 0, 0))
    // reconstruction: |mn + q*sc - x| <= sc/2 on every element
    val err = vecs.select(
      QuantizeInt8(col("vec")).as("q"),
      array_min(col("vec")).cast("double").as("mn"),
      ((array_max(col("vec")) - array_min(col("vec"))).cast("double") / 255.0).as("sc"),
      col("vec"))
      .select(max(expr(
        "aggregate(zip_with(q, vec, (qi, xi) -> abs(mn + qi * sc - cast(xi as double))), " +
          "0D, (acc, e) -> greatest(acc, e))")).as("worst"),
        max(col("sc") / 2.0).as("bound"))
      .head
    assert(err.getDouble(0) <= err.getDouble(1) + 1e-12)
  }

  test("int8 quantization: codegen and interpreted paths agree") {
    import graft.functions.QuantizeInt8
    val withCodegen = vecs.select(QuantizeInt8(col("vec")).as("q")).collect()
    val interp = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCodegen = vecs.select(QuantizeInt8(col("vec")).as("q")).collect()
      assert(withCodegen.map(_.getSeq[Int](0)).toSeq ===
        noCodegen.map(_.getSeq[Int](0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", interp)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
