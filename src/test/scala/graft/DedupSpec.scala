package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Texts}

/** Dedup-operator tests: hand-computed Jaccard, LSH recall against the
  * exact pairs, scalar-vs-bulk simhash equivalence, pigeonhole Hamming
  * pairs, and the hot-shingle DF cut.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text with no overlap at all here"),
    (4L, "ab"), // shorter than n=3 tokens → no shingles
    (5L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("X1 exact dedup keeps one deterministic survivor per group") {
    val df = Seq((3L, "k1"), (1L, "k1"), (2L, "k2")).toDF("id", "k")
    val out = Dedup.exact(Seq(col("k")), col("id"))(df)
    assert(rowsOf(out) === Set(Seq(1L, "k1"), Seq(2L, "k2")))
  }

  test("explodedShingles matches the scalar HOF shingles formulation") {
    val viaHof = docs.select(col("doc_id").as("id"),
        explode(Texts.shingles(Texts.tokens(col("text")), 3)).as("s"))
      .distinct()
    val viaExplode = Texts.explodedShingles(docs, col("doc_id"), col("text"), 3).distinct()
    assert(rowsOf(viaExplode) === rowsOf(viaHof))
  }

  test("X2 ngram Jaccard: hand-computed near-dup pair, doc shorter than n yields nothing") {
    // doc1/doc2: 7 shingles each, 6 shared → J = 6/8 = 0.75; doc5 ≡ doc1 → J = 1
    val out = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3)(docs)
    assert(rowsOf(out) ===
      Set(Seq(1L, 2L, 0.75), Seq(1L, 5L, 1.0), Seq(2L, 5L, 0.75)))
  }

  test("X2 ngram Jaccard hot-shingle cut prunes and reports sizes on the pruned space") {
    // Shingle "a b c" appears in all 3 docs → cut at maxShingleDf=2 removes it.
    // Pruned sets: d1={b c d, c d e}, d2={b c d, c d f}, d3={} →
    // pair (1,2): common=1, J = 1/(2+2-1) = 1/3
    val tiny = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3,
      maxShingleDf = 2L)(tiny)
    assert(rowsOf(out) === Set(Seq(1L, 2L, 1.0 / 3.0)))
  }

  test("X2 pair self-join reuses one exchange when broadcast is off (the 100TB plan)") {
    // At toy scale AQE broadcasts the kept-shingle side, recomputing the
    // pipeline per join side — harmless there. At corpus scale the side is
    // not broadcastable and the plan MUST degrade to a shuffle self-join
    // whose two identical sides share one exchange; pin that here.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val out = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3,
        maxShingleDf = 1000L)(docs)
      // result first (and unchanged by the join strategy): collect() runs
      // THIS queryExecution, finalizing the adaptive plan in place
      assert(rowsOf(out) ===
        Set(Seq(1L, 2L, 0.75), Seq(1L, 5L, 1.0), Seq(2L, 5L, 0.75)))
      // the static template prints the kept-shingle subtree once per use;
      // AQE's runtime stage cache collapses the identical exchanges, so
      // the FINALIZED plan must show ReusedExchange — the corpus pipeline
      // physically runs once however many times the plan references it
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("ReusedExchange"), plan)
    } finally spark.conf.set(key, prev)
  }

  test("X2 prefix-filtered join equals the naive self-join twin (exact, all corpora)") {
    // the prefix filter must be LOSSLESS: identical pair sets AND
    // bit-identical jaccard values vs the naive Σdf² formulation, on
    //  (a) the hand fixture (exact dups, a sub-threshold doc, a no-shingle doc)
    //  (b) an adversarial corpus saturated with df-ties and shared hot
    //      shingles (the order's tiebreak and the prefix boundary both
    //      get exercised at several set sizes and thresholds)
    //  (c) the real sf0.001 documents corpus with the catalog parameters
    val adversarial = (0L until 60L).map { i =>
      val fam = i % 3 // three families sharing a hot core
      val core = s"core$fam x core$fam y core$fam z w$fam a b"
      val tail = if (i % 2 == 0) s" t${i % 5} u${i % 7}" else ""
      (i, core + tail)
    }.toDF("doc_id", "text")
    val cases = Seq(
      (docs, 3, 0.3, 0L),
      (docs, 3, 0.74, 0L), // threshold right at the 0.75 pair boundary
      (adversarial, 3, 0.3, 0L),
      (adversarial, 3, 0.5, 40L),
      (adversarial, 2, 0.8, 0L),
      (Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.3, 1000L))
    for ((corpus, n, t, cut) <- cases) {
      val fast = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), n, t,
        maxShingleDf = cut)(corpus)
      val naive = Dedup.ngramJaccardPairsNaive(col("doc_id"), col("text"), n, t,
        maxShingleDf = cut)(corpus)
      assert(rowsOf(fast) === rowsOf(naive), s"diverged at n=$n t=$t cut=$cut")
    }
  }

  test("X2 MinHash+LSH finds the same pairs as exact Jaccard on this corpus") {
    val exact = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3)(docs)
    val lsh = Dedup.minhashLshPairs(col("doc_id"), col("text"), 3, 16, 4, 0.3)(docs)
    // LSH emits only exact-verified pairs, so it is always a subset;
    // on high-similarity pairs (≥0.75 here) banding recall is ~1.
    assert(rowsOf(lsh) === rowsOf(exact))
  }

  test("incremental LSH equals the full recompute restricted to the batch") {
    // corpus = docs 1-3; batch = 4 (no shingles), 5 (exact dup of corpus
    // doc 1). Expected: the cross pair (5, 1) found WITHOUT re-hashing the
    // corpus; the corpus-internal pair (1, 2) must NOT appear.
    val corpus = docs.filter(col("doc_id") <= 3)
    val incoming = docs.filter(col("doc_id") >= 4)
    val incr = Dedup.minhashLshIncremental(col("doc_id"), col("text"), 3, 16, 4, 0.3,
      Dedup.lshIndex(col("doc_id"), col("text"), 3, 16, 4)(corpus),
      Dedup.shingleTable(col("doc_id"), col("text"), 3)(corpus))(incoming)
    assert(rowsOf(incr) === Set(Seq(5L, 1L, 1.0), Seq(5L, 2L, 0.75)))
    // and it equals the full-corpus run restricted to batch-touching pairs
    val full = Dedup.minhashLshPairs(col("doc_id"), col("text"), 3, 16, 4, 0.3)(docs)
      .filter(col("b") >= 4)
      .select(col("a"), col("b"), col("jaccard"))
    val norm = incr.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b"), col("jaccard"))
    assert(rowsOf(norm) === rowsOf(full))
  }

  test("canonicalize propagates the min id across chained components") {
    // chain 1-2, 2-3, 3-4 (diameter 3) + singleton 9
    val ids = Seq(1L, 2L, 3L, 4L, 9L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Dedup.canonicalize(ids, pairs)
    assert(rowsOf(out) === Set(
      Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 1L), Seq(9L, 9L)))
  }

  test("canonicalize converges on a long chain well inside the iteration cap") {
    // 41-node path: plain 1-hop propagation would need 40 rounds and stop
    // un-converged at maxIter=20; pointer doubling needs ~log2(40).
    // driverMaxEdges = 0 forces the DISTRIBUTED path — the driver
    // union-find would solve this without iterating at all
    val n = 40L
    val ids = (0L to n).toDF("id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.canonicalize(ids, pairs, maxIter = 12, driverMaxEdges = 0L)
    assert(out.filter(col("canonical") =!= 0L).count() === 0)
    assert(out.count() === n + 1)
  }

  test("exactIncremental drops corpus-known keys, then dedups within the batch") {
    val corpus = Seq((1L, "aa"), (2L, "bb")).toDF("id", "t")
    val batch = Seq((10L, "aa"), (11L, "cc"), (12L, "cc"), (13L, "dd"))
      .toDF("id", "t")
    val out = Dedup.exactIncremental(Seq(col("t")), col("id"), corpus)(batch)
    // "aa" known from the corpus → dropped; "cc" duplicated in-batch →
    // min-id survivor; "dd" fresh → kept
    assert(rowsOf(out.select(col("id"), col("t"))) ===
      Set(Seq(11L, "cc"), Seq(13L, "dd")))
  }

  test("canonicalize driver and distributed paths agree on a multi-component graph") {
    val ids = (0L to 30L).toDF("id")
    // two chains, one star, singletons; unioned out of order
    val pairs = ((0L until 10L).map(i => (i, i + 1)) ++
      Seq((20L, 25L), (21L, 25L), (22L, 25L), (23L, 25L)) ++
      Seq((15L, 12L), (12L, 18L))).toDF("a", "b")
    val viaDriver = Dedup.canonicalize(ids, pairs)
    val viaLoop = Dedup.canonicalize(ids, pairs, driverMaxEdges = 0L)
    assert(rowsOf(viaDriver) === rowsOf(viaLoop))
    // star canonical is the min MEMBER (20), not the hub (25)
    assert(rowsOf(viaDriver.filter(col("id") === 25L)) === Set(Seq(25L, 20L)))
  }

  test("X2 simhashByDoc equals the scalar HOF simhash") {
    val viaHof = docs.withColumn("toks", Texts.tokens(col("text")))
      .select(col("doc_id").as("id"), Dedup.simhash("toks").as("simhash"))
    val viaAgg = Dedup.simhashByDoc(col("doc_id"), col("text"))(docs)
    assert(rowsOf(viaAgg) === rowsOf(viaHof))
  }

  test("X2 simhashPairs finds exact dups (Hamming 0) and respects the bound") {
    val out = Dedup.simhashPairs(col("doc_id"), col("text"), 3)(docs)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 5L && h == 0 })
    assert(pairs.forall(_._3 <= 3))
  }

  test("hamming distance of identical fingerprints is 0, differs by flipped bits") {
    val df = Seq((0L, 0L), (5L, 1L), (-1L, 0L)).toDF("a", "b")
    val out = df.select(Dedup.hamming(col("a"), col("b")).as("h"))
    assert(rowsOf(out) === Set(Seq(0L), Seq(1L), Seq(64L)))
  }

  test("decontaminate drops docs sharing an n-gram with the benchmark, keeps the rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),   // shares "c d e" with the benchmark → dropped
      (2L, "x y z w v"),   // clean → kept
      (3L, "c d")          // 2 tokens < n: no shingles, trivially clean
    ).toDF("id", "text")
    val bench = Seq((100L, "c d e f g")).toDF("id", "text")
    val out = Dedup.decontaminate(col("id"), col("text"), 3)(corpus, bench)
    assert(rowsOf(out.select(col("id"))) === Set(Seq(2L), Seq(3L)))
    // all original columns survive the anti join
    assert(out.columns.toSeq === Seq("id", "text"))
  }

  test("decontaminate with an empty benchmark keeps everything") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c")).toDF("id", "text")
    val bench = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.decontaminate(col("id"), col("text"), 3)(corpus, bench).count() === 1)
  }

  test("dupNgramStats: duplicated docs score 1.0, unique doc 0.0, short doc absent") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d e f"), // 2 distinct 5-gram shingles, both shared with doc 1
      (1L, "a b c d e f"),
      (2L, "u v w x y z"), // 2 shingles, unique
      (3L, "too short")) // < 5 tokens: no shingles, no row
      .toDF("doc_id", "text")
    val out = rowsOf(Dedup.dupNgramStats(col("doc_id"), col("text"), 5)(df))
    assert(out === Set(
      Seq(0L, 2L, 2L, 1.0),
      Seq(1L, 2L, 2L, 1.0),
      Seq(2L, 2L, 0L, 0.0)))
  }

  test("dupNgramStats counts a shingle repeated WITHIN one doc as unique to it") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a b a b"), // shingles {a b, b a} each appear twice in-doc
      (1L, "c d c d c d"))
      .toDF("doc_id", "text")
    val out = rowsOf(Dedup.dupNgramStats(col("doc_id"), col("text"), 2)(df))
    // in-doc repetition must NOT count as cross-doc duplication
    assert(out === Set(Seq(0L, 2L, 0L, 0.0), Seq(1L, 2L, 0L, 0.0)))
  }

  test("X1 Bloom-prefiltered decontamination equals the exact plan") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix words alpha beta gamma delta suffix"), // contaminated
      (11L, "clean document with none of the benchmark grams"),
      (12L, "alpha beta gamma but no full shingle"), // 4-gram absent → clean
      (13L, "x")) // shorter than n → trivially clean
      .toDF("doc_id", "text")
    val bloom = Dedup.buildBenchBloom(col("doc_id"), col("text"), 4, fpp = 0.01)(bench)
    val viaBloom = Dedup.decontaminateBloom(col("doc_id"), col("text"), 4, bloom)(
      corpus, bench)
    val exact = Dedup.decontaminate(col("doc_id"), col("text"), 4)(corpus, bench)
    assert(rowsOf(viaBloom) === rowsOf(exact))
    assert(rowsOf(viaBloom.select(col("doc_id"))) === Set(Seq(11L), Seq(12L), Seq(13L)))
  }

  test("Bloom decontamination stays exact under a deliberately saturated sketch") {
    import spark.implicits._
    // an undersized, high-fpp filter makes nearly every probe positive —
    // the exact confirm join must still remove every false positive, so
    // the RESULT cannot depend on sketch quality (only the plan's traffic)
    val bench = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b c d e"), // contaminated
      (11L, "e f g h i"), (12L, "j k l m n")).toDF("doc_id", "text")
    // keying contract of buildBenchBloom: entries are xxhash64(shingle)
    // longs (Spark's xxhash64, seed 42), probed by might_contain
    val hashes = (Seq("a b c d") ++ (0 until 64).map(i => s"junk $i")).toDF("s")
      .select(xxhash64(col("s"))).collect().map(_.getLong(0))
    val saturated = org.apache.spark.util.sketch.BloomFilter.create(2, 0.5)
    // head = the real bench shingle (membership contract), drowned in noise
    hashes.foreach(saturated.putLong)
    val out = Dedup.decontaminateBloom(col("doc_id"), col("text"), 4, saturated)(
      corpus, bench)
    assert(rowsOf(out.select(col("doc_id"))) === Set(Seq(11L), Seq(12L)))
  }

  test("cluster split routes near-dup docs to ONE split even when per-doc routing differs") {
    import graft.ops.TextAnalysis
    // pick two ids that per-doc md5 routing would send to DIFFERENT
    // splits — the exact leakage x38 audits for and this op prevents
    val t1 = TextAnalysis.splitThresholds(Seq(0.8, 0.1, 0.1)).head
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val a = (1L to 200L).find(i => md5hex(i.toString) < t1).get
    val b = (1L to 200L).find(i => md5hex(i.toString) >= t1).get
    val text = "one two three four five six seven eight nine ten"
    val df = Seq((a, text), (b, text),
      (301L, "completely unrelated words with zero shared shingles at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.3,
      maxShingleDf = 1000L)(df)
    val out = Dedup.canonicalize(df.select(col("doc_id").as("id")), pairs)
      .select(col("id"), col("canonical"),
        TextAnalysis.assignSplit(col("canonical"),
          Seq(0.8, 0.1, 0.1), Seq("train", "val", "test")).as("split"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(a)._1 === out(b)._1, "near-dups must share a canonical")
    assert(out(a)._2 === out(b)._2, "near-dups must share a split")
    assert(out(math.min(a, b))._2 === out(a)._2) // routed by the min id
  }

  test("X2 containment finds a quoted subset that Jaccard misses; asymmetric by design") {
    // doc 1 = 10 tokens quoted WHOLE inside doc 2's 40 tokens:
    // C(1→2) = 1.0 while jaccard = 8/38 ≈ 0.21 — below any useful
    // symmetric threshold
    val small = (1 to 10).map(i => s"q$i").mkString(" ")
    val big = small + " " + (1 to 30).map(i => s"pad$i").mkString(" ")
    val df = Seq((1L, small), (2L, big),
      (3L, "unrelated words that share nothing at all with them")).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(col("doc_id"), col("text"), 3, 0.5)(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((1L, 2L)) === 1.0)          // the subset direction
    assert(!c.contains((2L, 1L)))        // 8/38 < 0.5: big is NOT in small
    assert(!c.keySet.exists(_._1 == 3L) && !c.keySet.exists(_._2 == 3L))
    val j = Dedup.ngramJaccardPairs(col("doc_id"), col("text"), 3, 0.5)(df)
    assert(j.count() === 0, "symmetric jaccard at 0.5 misses the quoted subset")
  }

  test("X2 containment prefix filter equals the naive self-join twin (exact, all corpora)") {
    val adversarial = (0L until 60L).map { i =>
      val fam = i % 3
      val core = s"core$fam x core$fam y core$fam z w$fam a b"
      val tail = if (i % 2 == 0) s" t${i % 5} u${i % 7}" else ""
      (i, core + tail)
    }.toDF("doc_id", "text")
    val cases = Seq(
      (adversarial, 3, 0.3, 0L),
      (adversarial, 3, 0.5, 40L),
      (adversarial, 2, 0.99, 0L), // containment-1.0 pairs at the top edge
      (Tables.documents(spark, "/root/testdata/sf0.001"), 3, 0.5, 1000L))
    for ((corpus, n, t, cut) <- cases) {
      val fast = Dedup.containmentPairs(col("doc_id"), col("text"), n, t,
        maxShingleDf = cut)(corpus)
      val naive = Dedup.containmentPairsNaive(col("doc_id"), col("text"), n, t,
        maxShingleDf = cut)(corpus)
      assert(rowsOf(fast) === rowsOf(naive), s"diverged at n=$n t=$t cut=$cut")
    }
  }

  test("hammingLinkage: hand-computed pairs, length mismatch excluded") {
    val recs = Seq(
      (1L, "abcde"), (2L, "abcdX"), // dist 1
      (3L, "abXdX"),                // dist 2 from 1, dist 1 from 2
      (4L, "abcde"),                // exact dup of 1
      (5L, "abcdef"),               // length differs from all
      (6L, "zzzzz")                 // dist 5 from everything
    ).toDF("id", "name")
    val d1 = Dedup.hammingLinkage(col("id"), col("name"), 1)(recs)
    assert(rowsOf(d1) === Set(
      Seq(1L, 2L, 1), Seq(2L, 3L, 1), Seq(1L, 4L, 0), Seq(2L, 4L, 1)))
    val d2 = Dedup.hammingLinkage(col("id"), col("name"), 2)(recs)
    assert(rowsOf(d2) === Set(
      Seq(1L, 2L, 1), Seq(2L, 3L, 1), Seq(1L, 4L, 0), Seq(2L, 4L, 1),
      Seq(1L, 3L, 2), Seq(3L, 4L, 2)))
  }

  test("hammingLinkage: degenerate corpus — mass exact dups and short keys") {
    // 40 records share ONE key (C(40,2) = 780 dist-0 pairs are the correct
    // output), plus a 1-corruption neighbor, plus keys shorter than
    // maxDist + 1 (empty position classes): the exact-dup pre-collapse
    // must keep blocking on 4 distinct keys while the output still holds
    // every pair the all-pairs definition demands.
    val recs = ((0 until 40).map(i => (i.toLong, "dup_key_x")) ++
      Seq((100L, "dup_key_y"), // dist 1 from the mass key
          (200L, "a"), (201L, "b"))) // len 1 < maxDist+1 → "" class block
      .toDF("id", "name")
    val out = Dedup.hammingLinkage(col("id"), col("name"), 1)(recs)
    val naive = recs.as("l").join(recs.as("r"),
        col("l.id") < col("r.id") &&
          length(col("l.name")) === length(col("r.name")))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        aggregate(zip_with(split(col("l.name"), ""), split(col("r.name"), ""),
          (x, y) => when(x =!= y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("dist"))
      .filter(col("dist") <= 1)
    assert(rowsOf(out) === rowsOf(naive))
    // 780 within-key + 40 cross to the neighbor + the (a, b) short pair
    assert(out.count() === 780 + 40 + 1)
  }

  test("hammingLinkage: hot-block guard fails loudly, not quadratically") {
    // 50 distinct keys varying ONLY in the last character: every key
    // shares the even-position class "ky" verbatim, so that block holds
    // all 50 distinct keys — with maxBlockKeys = 10 the block join must
    // raise, not silently expand
    val recs = (0 until 50).map(i => (i.toLong, "key" + ('0' + i).toChar))
      .toDF("id", "name")
    val guarded = Dedup.hammingLinkage(col("id"), col("name"), 1,
      maxBlockKeys = 10)(recs)
    val e = intercept[Exception] { guarded.count() }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: messages(t.getCause)
    assert(messages(e).exists(_.contains("maxBlockKeys")))
    // same corpus with the default cap is fine and exact
    val ok = Dedup.hammingLinkage(col("id"), col("name"), 1)(recs)
    assert(ok.count() > 0)
  }

  test("hammingLinkage blocking is lossless vs the naive all-pairs twin") {
    // seeded single/double-character corruptions over a shared-prefix key
    // universe (the blocking's hard case: entropy only in the tail)
    val rnd = new scala.util.Random(7)
    val base = (0 until 300).map(i => f"Account#$i%06d")
    val corrupted = (0 until 200).map { j =>
      val s = base(rnd.nextInt(base.size)).toCharArray
      for (_ <- 0 to rnd.nextInt(2)) // 1 or 2 corrupted positions
        s(rnd.nextInt(s.length)) = ('0' + rnd.nextInt(10)).toChar
      new String(s)
    }
    val recs = (base ++ corrupted).zipWithIndex
      .map { case (nm, id) => (id.toLong, nm) }.toDF("id", "name")
    for (maxDist <- Seq(1, 2)) {
      val blocked = Dedup.hammingLinkage(col("id"), col("name"), maxDist)(recs)
      val naive = recs.as("l").join(recs.as("r"),
          col("l.id") < col("r.id") &&
            length(col("l.name")) === length(col("r.name")))
        .select(col("l.id").as("a"), col("r.id").as("b"),
          aggregate(zip_with(split(col("l.name"), ""), split(col("r.name"), ""),
            (x, y) => when(x =!= y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).as("dist"))
        .filter(col("dist") <= maxDist)
      assert(rowsOf(blocked) === rowsOf(naive), s"diverged at maxDist=$maxDist")
    }
  }
}
