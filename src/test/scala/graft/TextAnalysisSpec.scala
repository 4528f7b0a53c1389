package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, Texts}

/** X3 text-analysis tests with hand-computed expectations. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats computes all-integer stats, sum as long") {
    val df = Seq((1L, "aa bb aa c")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenStats(col("doc_id"), col("text"))(df)
    assert(out.schema("sum_token_len").dataType.typeName === "long")
    assert(rowsOf(out) === Set(Seq(1L, 4, 3, 2, 7L)))
  }

  test("langIdEn flags stopword-heavy text as en") {
    val df = Seq(
      (1L, "the cat is on the mat"),  // hits: the,is,on,the = 4/6
      (2L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdEn(col("doc_id"), col("text"))(df)
      .select(col("doc_id"), col("lang_guess"))
    assert(rowsOf(out) === Set(Seq(1L, "en"), Seq(2L, "other")))
  }

  test("qualityScore combines diversity, stopword ratio and mean length") {
    val df = Seq((1L, "a a b b")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(col("doc_id"), col("text"))(df).collect()(0)
    assert(r.getDouble(1) === 0.5) // diversity 2/4
    assert(r.getDouble(2) === 0.5) // stop ratio: "a" is a stopword, 2/4
    assert(r.getDouble(3) === 1.0) // mean token len
    assert(math.abs(r.getDouble(4) - (0.5 * 0.5 + 0.5 * 0.25 + 1.0 * 0.05)) < 1e-12)
  }

  test("stopwordCountPattern counts exactly the stopword tokens (vs interpreted filter HOF)") {
    // adjacent stopwords, prefix-shadowing (that vs the, a vs and), doubled
    // spaces, stopwords at both ends, symbols that are regex metachars
    val texts = Seq(
      "the the the", "to the of", "that theory is a and ab", "a  the  b",
      "", "x", "on", "cat on", "a|b the (a) for", "nothe then the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaRegex = df.select(col("doc_id"),
      regexp_count(col("text"), lit(Texts.stopwordCountPattern)).as("c"))
    val viaHof = df.select(col("doc_id"),
      size(filter(Texts.tokens(col("text")),
        t => t.isInCollection(Texts.enStopwords))).as("c"))
    assert(rowsOf(viaRegex) === rowsOf(viaHof))
  }

  test("qualityExpr equals qualityScore's quality column") {
    val df = Seq((1L, "the cat is on the mat"), (2L, "zzz qqq  www"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id"), TextAnalysis.qualityExpr(col("text")).as("quality"))
    val viaScore = TextAnalysis.qualityScore(col("doc_id"), col("text"))(df)
      .select(col("doc_id"), col("quality"))
    assert(rowsOf(viaExpr) === rowsOf(viaScore))
  }

  test("fingerprints: identical text → identical fp; shared prefix → same prefix_fp") {
    val df = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j different tail"),
      (3L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(col("doc_id"), col("text"), 10)(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) === out(3L))
    assert(out(1L)._1 !== out(2L)._1)
    assert(out(1L)._2 === out(2L)._2) // first 10 tokens equal
  }

  test("rollingFingerprints emits one digest per sliding window; shared windows match") {
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "x b c d e"), // shares the trailing 4-token window with doc 1
      (3L, "a b")        // shorter than the window → nothing
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rollingFingerprints(col("doc_id"), col("text"), 4)(df)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.count(_._1 == 1L) === 2) // positions 1 and 2
    assert(rows.count(_._1 == 3L) === 0)
    val fp1 = rows.filter(t => t._1 == 1L && t._2 == 2).head._3 // "b c d e"
    val fp2 = rows.filter(t => t._1 == 2L && t._2 == 2).head._3 // "b c d e"
    assert(fp1 === fp2) // partial overlap detected via shared window digest
  }

  test("unimaxWeights water-fills: small sources capped whole, rest share equally") {
    // capacities at E=2: A=20, B=200; budget 60 → A taken whole (2 epochs),
    // B gets the remaining 40 tokens = 0.4 epochs
    val w = TextAnalysis.unimaxWeights(Map("A" -> 10L, "B" -> 100L), 60L, 2)
    assert(w("A") === 2.0)
    assert(w("B") === 40.0 / 100.0)
  }

  test("unimaxWeights endpoints: budget >= capacity caps all; tight budget caps none") {
    val tot = Map("A" -> 10L, "B" -> 100L, "C" -> 50L)
    val all = TextAnalysis.unimaxWeights(tot, 1000L, 2) // capacity 320 < 1000
    assert(all.values.toSet === Set(2.0))
    // budget 15: level 5 < min capacity 20 → nobody capped, equal token share
    val none = TextAnalysis.unimaxWeights(tot, 15L, 2)
    assert(none("A") === 5.0 / 10.0 && none("B") === 5.0 / 100.0 && none("C") === 5.0 / 50.0)
  }

  test("unimaxWeights allocation sums to the budget; null/zero sources dropped") {
    val tot = Map("A" -> 37L, "B" -> 911L, "C" -> 205L, "D" -> 13L,
      (null: String) -> 99L, "E" -> 0L)
    val budget = 700L
    val w = TextAnalysis.unimaxWeights(tot, budget, 3)
    assert(!w.contains(null) && !w.contains("E"))
    val allocated = w.map { case (s, ws) => ws * tot(s) }.sum
    assert(math.abs(allocated - budget) < 1e-6)
    assert(w.values.forall(ws => ws > 0 && ws <= 3.0))
  }

  test("mixByUnimax = repeatByWeight with the derived weights; big source never capped") {
    val docs = (1L to 60L).map { i =>
      val src = if (i <= 40) "big" else if (i <= 50) "mid" else "small"
      (i, src, "t " * 9 + "t") // 10 tokens each
    }.toDF("doc_id", "source", "text")
    val tokens = size(split(col("text"), " "))
    val out = TextAnalysis.mixByUnimax(col("doc_id"), col("source"), tokens,
      maxEpochs = 2, budgetFraction = 1.2)(docs)
    // totals: big 400, mid 100, small 100; budget = 720; capacities
    // 800/200/200: mid+small capped (200*3=600<=720; 200*2+200=600<=720),
    // big uncapped at (720-400)/1/400 = 0.8 epochs
    val w = TextAnalysis.unimaxWeights(
      Map("big" -> 400L, "mid" -> 100L, "small" -> 100L), 720L, 2)
    assert(w("mid") === 2.0 && w("small") === 2.0 && w("big") === 0.8)
    val expect = TextAnalysis.repeatByWeight(col("doc_id"), col("source"), w)(docs)
    assert(rowsOf(out) === rowsOf(expect))
    // every capped-source doc appears exactly twice
    val copies = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((41L to 60L).forall(copies(_) === 2L))
  }

  /** Plain-Scala robust winnowing (Schleimer et al.): the differential
    * reference for [[TextAnalysis.winnowFingerprints]].
    */
  private def winnowRef(tokens: Seq[String], k: Int, w: Int): Set[(Int, String)] = {
    if (tokens.size < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = tokens.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
    val starts = 1 to math.max(1, grams.size - w + 1)
    starts.flatMap { j =>
      val frame = grams.zipWithIndex.slice(j - 1, j - 1 + w)
      val minFp = frame.map(_._1).min
      // rightmost occurrence of the minimum within the window
      val pos = frame.filter(_._1 == minFp).map(_._2).max + 1
      Some((pos, minFp))
    }.toSet
  }

  test("winnowFingerprints matches the reference algorithm exactly (incl. ties)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 30L).map { i =>
      val n = 1 + rnd.nextInt(40) // some below k, some below k+w-1
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (99L, "a b c a b c a b c a b c") // forced repeated k-grams → ties
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(col("doc_id"), col("text"), 3, 4)(df)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    val expect = docs.map { case (id, t) =>
      id -> winnowRef(t.split(" ").toSeq, 3, 4)
    }.filter(_._2.nonEmpty).toMap
    assert(out === expect)
  }

  test("winnowFingerprints: every w-window is covered and density beats the dense stream") {
    val text = (1 to 200).map(i => s"t${i % 37}").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val k = 8; val w = 4
    val sel = TextAnalysis.winnowFingerprints(col("doc_id"), col("text"), k, w)(df)
      .collect().map(_.getInt(1)).toSet
    val nGrams = 200 - k + 1
    (1 to nGrams - w + 1).foreach { j =>
      assert((j until j + w).exists(sel.contains), s"window at $j uncovered")
    }
    // sparse: expected ~2/(w+1) of the dense stream, allow generous slack
    assert(sel.size < nGrams * 2 / 3)
  }

  test("winnowFingerprints short-doc edges: below k absent, below one window = global min") {
    val df = Seq(
      (1L, "a b"),            // < k tokens → no fingerprints
      (2L, "a b c d")         // k=3: 2 grams < w → exactly the global min
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(col("doc_id"), col("text"), 3, 4)(df)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(!out.exists(_._1 == 1L))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length === 1)
    assert(d2.head._3 === winnowRef(Seq("a", "b", "c", "d"), 3, 4).head._2)
  }

  test("normalize lowercases, strips punctuation, squeezes spaces") {
    val df = Seq((1L, "  Hello,   WORLD!! (x1) ")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.normalize(col("text")).as("n")).collect()(0).getString(0)
    assert(out === "hello world x1")
  }

  test("deterministicSample is reproducible and threshold-monotone") {
    val df = (1L to 200L).toDF("id")
    val p10 = df.filter(TextAnalysis.deterministicSample(col("id"), "1a")).count()
    val p50 = df.filter(TextAnalysis.deterministicSample(col("id"), "80")).count()
    val p50again = df.filter(TextAnalysis.deterministicSample(col("id"), "80")).count()
    assert(p50 === p50again)   // same rows every run
    assert(p10 < p50)          // monotone in the threshold
    assert(p50 > 60 && p50 < 140) // roughly half
  }

  test("stratifiedSample keeps whole rate-1 strata, drops unlisted strata, samples the rest") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de"
      else if (i % 4 == 2) "zh" else "unknown")).toDF("id", "lang")
    val kept = df.filter(TextAnalysis.stratifiedSample(col("id"), col("lang"),
      Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.0)))
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") === 100L)               // rate 1.0: whole stratum
    assert(counts.get("zh").isEmpty)            // rate 0: dropped
    assert(counts.get("unknown").isEmpty)       // unlisted: dropped (allowlist)
    assert(counts("de") > 25 && counts("de") < 75) // ~half
    // deterministic: identical on re-evaluation
    assert(kept.count() === kept.count())
    val again = df.filter(TextAnalysis.stratifiedSample(col("id"), col("lang"),
      Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.0))).count()
    assert(again === kept.count())
  }

  test("assignSplit partitions keys deterministically with roughly the asked fractions") {
    val df = (1L to 1000L).toDF("id")
    val split = TextAnalysis.assignSplit(col("id"),
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val counts = df.groupBy(split.as("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test")) // total partition
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    // deterministic: same assignment on re-evaluation
    val again = df.groupBy(split.as("s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("repetitionRatio flags repeated bigrams; short docs emit nothing") {
    val df = Seq(
      (1L, "a b a b a b"),  // bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct → 0.6
      (2L, "w x y z"),      // 3 distinct of 3 → 0.0
      (3L, "solo")          // < 2 tokens → no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRatio(col("doc_id"), col("text"), 2)(df)
    assert(rowsOf(out) === Set(
      Seq(1L, 5L, 2L, 1.0 - 2.0 / 5.0),
      Seq(2L, 3L, 3L, 0.0)))
  }

  test("redactPii tags emails, urls and phone runs; email wins over phone on overlap") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "see https://a.example/a?b=1 and http://b.example"),
      (3L, "call +1 555-123 4567 ok"),
      (4L, "clean text with digits 42")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "mail <EMAIL> now")
    assert(out(2L) === "see <URL> and <URL>")
    assert(out(3L) === "call <PHONE> ok")
    assert(out(4L) === "clean text with digits 42")
  }

  test("bpeishTokens splits alnum runs and single symbols, dropping spaces") {
    val df = Seq((1L, "ab1 c-d, e!")).toDF("doc_id", "text")
    val out = df.select(Texts.bpeishTokens(col("text")).as("t")).collect()(0).getSeq[String](0)
    assert(out === Seq("ab1", "c", "-", "d", ",", "e", "!"))
  }

  test("repeatByWeight: floor copies always, salted extra epoch near the fractional rate") {
    val df = (0 until 2000).map(i => (i.toLong, s"s${i % 2}")).toDF("id", "src")
    val out = TextAnalysis.repeatByWeight(col("id"), col("src"),
      Map("s0" -> 2.5, "s1" -> 0.25))(df)
    val byDoc = out.groupBy("doc_id", "part").count().collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // s0 docs appear 2 or 3 times; s1 docs 0 or 1 (absent rows = 0 copies)
    assert(byDoc.filter(_._1 == "s0").forall(c => c._2 == 2L || c._2 == 3L))
    assert(byDoc.filter(_._1 == "s1").forall(_._2 == 1L))
    // realized rates near the fractional weights (md5 is uniform; 1000
    // draws per stratum put 3-sigma well inside these bounds)
    val s0Extra = byDoc.count(c => c._1 == "s0" && c._2 == 3L).toDouble / 1000
    assert(s0Extra > 0.4 && s0Extra < 0.6, s"s0 extra-epoch rate $s0Extra")
    val s1Kept = byDoc.count(_._1 == "s1").toDouble / 1000
    assert(s1Kept > 0.17 && s1Kept < 0.33, s"s1 keep rate $s1Kept")
    // copy index is 1..n per doc
    val copies = out.filter(col("part") === "s0" && col("doc_id") === 0)
      .select(col("copy")).collect().map(_.getInt(0)).sorted
    assert(copies.headOption.contains(1))
    assert(copies === (1 to copies.length).toArray)
    // unlisted strata yield nothing
    val none = TextAnalysis.repeatByWeight(col("id"), col("src"),
      Map("other" -> 2.0))(df)
    assert(none.count() === 0)
  }

  test("packSequences: per-part running offsets with no gaps, bins chunk by window") {
    val df = Seq(
      (1L, "a b c", "s1"),        // 3 tokens
      (2L, "d e f g", "s1"),      // 4
      (3L, "h i", "s1"),          // 2
      (10L, "x y z w v u", "s2")  // 6, alone in its part
    ).toDF("id", "text", "src")
    val out = TextAnalysis.packSequences(col("id"), col("text"), col("src"), 5)(df)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // within each part: offsets start at 0 and advance by exactly the
    // previous doc's token count (back-to-back layout, no gaps/overlaps)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Array((_, n, off, _), (_, _, off2, _)) => assert(off2 === off + n)
        case _ => ()
      }
      // bin is the context-window chunk of the start offset
      sorted.foreach { case (_, _, off, bin) => assert(bin === off / 5) }
    }
    // s1 packs 9 tokens over bins {0, 1}; s2 packs independently from 0
    assert(out.filter(_._1 == "s2").map(_._3).toSeq === Seq(0L))
  }

  test("packSequences is deterministic across invocations (md5 order, no RNG)") {
    val df = (0 until 30).map(i => (i.toLong, ("t " * (i % 7 + 1)).trim, s"s${i % 3}"))
      .toDF("id", "text", "src")
    val a = TextAnalysis.packSequences(col("id"), col("text"), col("src"), 8)(df)
    val b = TextAnalysis.packSequences(col("id"), col("text"), col("src"), 8)(df)
    assert(rowsOf(a) === rowsOf(b))
  }

  test("mergeCandidates counts adjacent pairs with lexicographic tiebreak") {
    val df = Seq((0L, "a b a b"), (1L, "b a c")).toDF("id", "text")
    // pairs: doc0 → "a b","b a","a b"; doc1 → "b a","a c"
    val out = TextAnalysis.mergeCandidates(col("id"), col("text"), 2)(df)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a b", 2L), ("b a", 2L)))
  }

  test("qualityTiers buckets into quartiles with a total assignment") {
    val df = (0 until 16)
      .map(i => (i.toLong, (Seq.fill(i + 1)("w") ++ Seq("the")).mkString(" ")))
      .toDF("id", "text")
    val out = TextAnalysis.qualityTiers(col("id"), col("text"))(df)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.length === 16)
    val byTier = out.groupBy(_._2).view.mapValues(_.length).toMap
    // every doc gets exactly one tier, all four tiers populated on a
    // 16-doc spread of distinct scores
    assert(byTier.keySet === Set(0, 1, 2, 3))
    assert(byTier.values.sum === 16)
    // quality decreases with id on this fixture, so tiers must be
    // non-increasing; the approx (sketch) variant may place the exact
    // boundary docs one tier off (interpolated vs order-stat threshold)
    // but must keep the same total, monotone assignment
    def monotone(ts: Seq[(Long, Int)]): Boolean =
      ts.sortBy(_._1).map(_._2).sliding(2).forall {
        case Seq(a, b) => a >= b
        case _         => true
      }
    assert(monotone(out.toSeq))
    val approx = TextAnalysis.qualityTiers(col("id"), col("text"), approx = true)(df)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(approx.length === 16 && monotone(approx.toSeq))
    assert(approx.map(_._2).toSet === Set(0, 1, 2, 3))
  }

  test("unigramLogProb matches hand-computed add-1 smoothed values") {
    val df = Seq((0L, "a a"), (1L, "a b")).toDF("id", "text")
    // counts: a=3, b=1; T=4, V=2 → p(a)=4/6, p(b)=2/6
    val pa = math.log(4.0 / 6.0)
    val pb = math.log(2.0 / 6.0)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = rowsOf(TextAnalysis.unigramLogProb(col("id"), col("text"))(df))
    assert(out === Set(
      Seq(0L, 2L, r4(pa)),
      Seq(1L, 2L, r4((pa + pb) / 2.0))))
  }

  test("dsirScore matches hand-computed target-vs-corpus log-ratios") {
    // target doc 1: "a a b"; non-target doc 2: "c c"
    // counts: a (c=2, ct=2), b (c=1, ct=1), c (c=2, ct=0)
    // T_all=5, T_tgt=3, V=3
    val df = Seq((1L, "a a b", "tgt"), (2L, "c c", "other"))
      .toDF("id", "text", "source")
    val ra = math.log(3.0 / 6.0) - math.log(3.0 / 8.0)
    val rb = math.log(2.0 / 6.0) - math.log(2.0 / 8.0)
    val rc = math.log(1.0 / 6.0) - math.log(3.0 / 8.0)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = rowsOf(TextAnalysis.dsirScore(
      col("id"), col("text"), col("source") === lit("tgt"))(df))
    assert(out === Set(
      Seq(1L, 3L, r4((2 * ra + rb) / 3.0)),
      Seq(2L, 2L, r4(rc))))
    // the in-domain doc ranks above the out-of-domain doc
    assert((2 * ra + rb) / 3.0 > rc)
  }

  test("chunkSliding covers every token with overlapping windows, exact boundaries") {
    // 10 tokens, size 4, stride 3 → chunks [0,4) [3,7) [6,10): tail exact
    val df = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = rowsOf(TextAnalysis.chunkSliding(col("id"), col("text"), 4, 3)(df))
    assert(out === Set(
      Seq(1L, 0, "t0 t1 t2 t3", 4L),
      Seq(1L, 1, "t3 t4 t5 t6", 4L),
      Seq(1L, 2, "t6 t7 t8 t9", 4L)))
    // size 4, stride 4 (no overlap), 10 tokens → ragged 2-token tail
    val nolap = rowsOf(TextAnalysis.chunkSliding(col("id"), col("text"), 4, 4)(df))
    assert(nolap === Set(
      Seq(1L, 0, "t0 t1 t2 t3", 4L),
      Seq(1L, 1, "t4 t5 t6 t7", 4L),
      Seq(1L, 2, "t8 t9", 2L)))
    // a doc shorter than one window = exactly one chunk of itself
    val short = Seq((2L, "a b")).toDF("id", "text")
    assert(rowsOf(TextAnalysis.chunkSliding(col("id"), col("text"), 4, 3)(short)) ===
      Set(Seq(2L, 0, "a b", 2L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkSliding(col("id"), col("text"), 4, 5)(short)
    }
  }

  test("mixtureRates: budget*weight/total, keep-all when undersized, drop below resolution") {
    val totals = Map("web" -> 1000L, "books" -> 100L, "huge" -> 4000000000L)
    val rates = TextAnalysis.mixtureRates(totals,
      Map("web" -> 0.5, "books" -> 0.3, "huge" -> 0.2, "absent" -> 0.1), 1000L)
    assert(rates("web") === 1000.0 * 0.5 / 1000.0)     // partial sample
    assert(rates("books") === 1.0)                     // 300-token ask > 100 available
    assert(rates("huge") === 0.0)                      // 5e-8 < 6-hex-digit resolution
    assert(!rates.contains("absent"))                  // allowlist semantics
    intercept[IllegalArgumentException] {
      TextAnalysis.mixtureRates(totals, Map("web" -> 0.5), 0L)
    }
  }

  test("mixToTokenBudget hits each source's token allocation within sampling noise") {
    val df = Seq.tabulate(600) { i =>
      val src = s"src${i % 3}"
      (i.toLong, src, "t " * 49 + "t") // 50 tokens per doc
    }.toDF("id", "src", "text")
    // per source: 200 docs x 50 = 10_000 tokens; budget 6_000 at 50/30/20
    val kept = TextAnalysis.mixToTokenBudget(col("id"), col("src"),
      size(split(col("text"), " ")),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 6000L)(df)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected kept docs: src0 60, src1 36, src2 24 — md5 routing is a
    // fixed pseudo-random draw, so allow generous binomial slack
    assert(math.abs(kept("src0") - 60L) <= 25, kept.toString)
    assert(math.abs(kept("src1") - 36L) <= 20, kept.toString)
    assert(math.abs(kept("src2") - 24L) <= 18, kept.toString)
    // deterministic: the same call keeps the identical doc set
    val again = TextAnalysis.mixToTokenBudget(col("id"), col("src"),
      size(split(col("text"), " ")),
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 6000L)(df)
    assert(rowsOf(again.select("id")) === rowsOf(
      TextAnalysis.mixToTokenBudget(col("id"), col("src"),
        size(split(col("text"), " ")),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 6000L)(df).select("id")))
  }

  test("temperatureWeights: alpha=1 natural, alpha=0 uniform, in between flattens") {
    val totals = Map("big" -> 9000L, "small" -> 1000L, "empty" -> 0L)
    val natural = TextAnalysis.temperatureWeights(totals, 1.0)
    assert(math.abs(natural("big") - 0.9) < 1e-12)
    assert(math.abs(natural("small") - 0.1) < 1e-12)
    assert(!natural.contains("empty"))                 // zero-total dropped
    val uniform = TextAnalysis.temperatureWeights(totals, 0.0)
    assert(math.abs(uniform("big") - 0.5) < 1e-12)
    assert(math.abs(uniform("small") - 0.5) < 1e-12)
    val flat = TextAnalysis.temperatureWeights(totals, 0.7)
    assert(math.abs(flat.values.sum - 1.0) < 1e-12)
    // temperature up-weights the small source relative to its natural share
    assert(flat("small") > natural("small") && flat("small") < uniform("small"))
    intercept[IllegalArgumentException] {
      TextAnalysis.temperatureWeights(totals, 1.5)
    }
  }

  test("mixByTemperature == mixToTokenBudget with the derived weights") {
    val df = Seq.tabulate(600) { i =>
      // skewed: 500 web docs vs 100 book docs, 50 tokens each
      val src = if (i < 500) "web" else "books"
      (i.toLong, src, "t " * 49 + "t")
    }.toDF("id", "src", "text")
    val toks = size(split(col("text"), " "))
    val derived = TextAnalysis.temperatureWeights(
      Map("web" -> 25000L, "books" -> 5000L), 0.7)
    assert(rowsOf(TextAnalysis.mixByTemperature(col("id"), col("src"), toks,
        0.7, 6000L)(df).select("id")) ===
      rowsOf(TextAnalysis.mixToTokenBudget(col("id"), col("src"), toks,
        derived, 6000L)(df).select("id")))
    // and the flattening is visible end-to-end: books' kept share exceeds
    // its natural 1/6 corpus share
    val kept = TextAnalysis.mixByTemperature(col("id"), col("src"), toks,
      0.7, 6000L)(df)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("books").toDouble / (kept("web") + kept("books")) > 1.0 / 6.0)
  }

  test("bpeTrain learns merges in frequency order with deterministic tiebreaks") {
    // aaab x2 + ab x1: pair counts round 1 are (a,a)=4, (a,b)=3 -> merge
    // (a,a); round 2 (a,b)=3 beats (aa,a)=2; round 3 only (aa,ab) remains
    val df = Seq("aaab aaab ab").toDF("text")
    val merges = TextAnalysis.bpeTrain(col("text"), numMerges = 3)(df)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpeTrain stops when every word is a single token") {
    val df = Seq("ab ab").toDF("text")
    assert(TextAnalysis.bpeTrain(col("text"), numMerges = 5)(df) === Seq(("a", "b")))
  }

  test("BpeEncode applies merges lowest-rank-first, per word") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val df = Seq((1L, "aaab ba"), (2L, "aab b")).toDF("id", "text")
    val out = df.select(col("id"),
      graft.functions.BpeEncode(merges)(col("text")).as("toks"))
    assert(rowsOf(out) === Set(
      Seq(1L, Seq("aaab", "b", "a")),
      Seq(2L, Seq("aa", "b", "b"))))
  }

  test("BpeEncode reconstruction + bounds hold corpus-wide on the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = ExtensionQueries.trainedBpe(spark, "/root/testdata/sf0.001")
    // sf0.001's synthetic vocab saturates before 200 merges (every word a
    // single token -> early stop); the cap only binds at larger SFs
    assert(merges.nonEmpty && merges.size <= 200)
    val enc = graft.functions.BpeEncode(merges)(col("text"))
    val r = docs.select(
        (concat_ws("", enc) === regexp_replace(col("text"), " ", "")).as("recon"),
        (size(split(col("text"), " ")) <= size(enc) &&
          size(enc) <= length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
          .as("bounded"))
      .agg(bool_and(col("recon")), bool_and(col("bounded"))).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
    // merges must actually compress: strictly fewer tokens than characters
    val counts = docs.select(
      sum(size(enc)).as("bpe"),
      sum(length(col("text")) - (size(split(col("text"), " ")) - lit(1))).as("chars"))
      .collect()(0)
    assert(counts.getLong(0) < counts.getLong(1))
  }

  test("heavy hitters: CMS prefilter + exact confirm equals the exact answer") {
    import spark.implicits._
    // token counts: a=6, b=3, c=2, d=1 → threshold 3 keeps {a, b}
    val df = Seq((1L, "a a a b b c"), (2L, "a a a b c d")).toDF("doc_id", "text")
    val cms = TextAnalysis.buildTokenCms(col("text"), eps = 1e-4, confidence = 0.99)(df)
    val out = TextAnalysis.heavyHitters(col("text"), 3L, cms)(df)
    assert(rowsOf(out) === Set(Seq("a", 6L), Seq("b", 3L)))
  }

  test("heavy hitters stay exact under a colliding (coarse) sketch") {
    import spark.implicits._
    // eps 0.9 → a 3-counter-wide sketch: every token collides with every
    // other, so the prefilter passes nearly everything — the exact confirm
    // must still cut to the true >= threshold set (CMS is one-sided:
    // overestimates only, so no true heavy hitter can be lost)
    val df = Seq((1L, "a a a b b c"), (2L, "a a a b c d")).toDF("doc_id", "text")
    val coarse = TextAnalysis.buildTokenCms(col("text"), eps = 0.9, confidence = 0.5)(df)
    val out = TextAnalysis.heavyHitters(col("text"), 3L, coarse)(df)
    assert(rowsOf(out) === Set(Seq("a", 6L), Seq("b", 3L)))
  }

  test("boilerplate removal drops corpus-hot blocks and reassembles in order") {
    import spark.implicits._
    // block width 2: "x y" opens all three docs → hot at minDocs=3;
    // doc tails are unique and must survive in their original order
    val df = Seq(
      (1L, "x y a b c d"),
      (2L, "x y e f"),
      (3L, "x y"), // fully boilerplate → kept as an empty row
      (4L, "g h i")) // unique blocks (incl. ragged tail "i") untouched
      .toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(col("doc_id"), col("text"), 2, 3)(df)
    assert(rowsOf(out) === Set(
      Seq(1L, "a b c d"), Seq(2L, "e f"), Seq(3L, ""), Seq(4L, "g h i")))
  }

  test("bigram LM: seen bigrams score cb/c_prev, unseen back off to add-1 unigram") {
    import spark.implicits._
    // train = doc 0 only: tokens [a b a b c] → unigrams a:2 b:2 c:1
    // (T=5, V=3); bigrams: (a,b):2 (b,a):1 (b,c):1
    val df = Seq(
      (0L, "a b a b c"),
      (1L, "a b x"), // (a,b) seen; (b,x) unseen, x OOV
      (2L, "z")) // single token → no bigrams → no row
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(col("doc_id"), col("text"),
      col("doc_id") === 0)(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(2L))
    // doc 0: ln(2/2)+ln(1/2)+ln(2/2)+ln(1/2) over 4 bigrams
    val d0 = (math.log(1.0) + math.log(0.5) + math.log(1.0) + math.log(0.5)) / 4
    assert(out(0L)._1 === 4L)
    assert(math.abs(out(0L)._2 - math.rint(d0 * 1e4) / 1e4) < 1e-9)
    // doc 1: (a,b) seen → ln(2/2); (b,x) unseen, x OOV → ln(0.4 * 1/8)
    val d1 = (math.log(1.0) + math.log(0.4 * 1.0 / 8.0)) / 2
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 - math.rint(d1 * 1e4) / 1e4) < 1e-9)
  }

  test("bigram LM: unseen bigram of in-vocab token uses that token's count") {
    import spark.implicits._
    // train: [c a] → unigrams a:1 c:1 (T=2, V=2); bigram (c,a):1
    // score doc 1: (a,c) unseen → backoff to c: 0.4 * (1+1)/(2+2) = 0.2
    val df = Seq((0L, "c a"), (1L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(col("doc_id"), col("text"),
      col("doc_id") === 0)(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val d1 = math.log(0.2)
    assert(math.abs(out(1L) - math.rint(d1 * 1e4) / 1e4) < 1e-9)
  }

  test("intra-doc block dedup keeps first occurrences in order, is total") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y a b x y c d"), // block "x y" repeats → one copy, position kept
      (2L, "p q p q p q"), // generator stutter collapses to one block
      (3L, "u v w")) // unique blocks (ragged tail "w") untouched
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupBlocksWithinDoc(col("doc_id"), col("text"), 2)(df)
    assert(rowsOf(out) === Set(
      Seq(1L, "x y a b c d"), Seq(2L, "p q"), Seq(3L, "u v w")))
  }

  test("cross-doc span dedup: owner keeps its copy, later docs lose covered positions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c x"), // owns "a b c" (min doc_id)
      (2L, "y a b c z"), // shared span cut → neighbors survive
      (3L, "p q r")) // unique spans untouched
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpansAcrossDocs(col("doc_id"), col("text"), 3)(df)
    assert(rowsOf(out) === Set(
      Seq(1L, "a b c x"), Seq(2L, "y z"), Seq(3L, "p q r")))
  }

  test("cross-doc span dedup: overlapping duplicated spans merge by position union") {
    import spark.implicits._
    // "a b c d" in both docs → doc 2's spans (a b c) and (b c d) overlap;
    // coverage is their union, not double-cut or a gap
    val df = Seq(
      (1L, "a b c d"),
      (2L, "x a b c d y")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpansAcrossDocs(col("doc_id"), col("text"), 3)(df)
    assert(rowsOf(out) === Set(Seq(1L, "a b c d"), Seq(2L, "x y")))
  }

  test("cross-doc span dedup is total: short docs untouched, fully-cut docs keep an empty row") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c"), // owner keeps BOTH copies (within-doc repeats are x30's job)
      (2L, "a b c"), // fully covered → empty row, not a dropped row
      (3L, "a b"), // shorter than the span → no spans, untouched
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpansAcrossDocs(col("doc_id"), col("text"), 3)(df)
    assert(rowsOf(out) === Set(
      Seq(1L, "a b c a b c"), Seq(2L, ""), Seq(3L, "a b"), Seq(4L, "")))
  }

  test("boilerplate removal counts DISTINCT docs, not occurrences") {
    import spark.implicits._
    // "p q" repeats 3 times inside doc 1 but exists in only 2 docs →
    // NOT hot at minDocs=3 (in-doc repetition is x4h's business, not x27's)
    val df = Seq(
      (1L, "p q p q p q"),
      (2L, "p q z w")).toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(col("doc_id"), col("text"), 2, 3)(df)
    assert(rowsOf(out) === Set(Seq(1L, "p q p q p q"), Seq(2L, "p q z w")))
  }

  test("dataCard charges corpus-wide exact dups to every source carrying them") {
    import spark.implicits._
    // "same text" exists in web AND books: both sources carry 1 dup doc.
    // "only here" is unique; web spans two langs, books one.
    val df = Seq(
      ("web", "en", "same text"),
      ("web", "de", "only here and longer"),
      ("books", "en", "same text")).toDF("source", "lang", "text")
    val out = TextAnalysis.dataCard(col("source"), col("lang"), col("text"))(df)
    assert(rowsOf(out) === Set(
      Seq("web", 2L, 6L, 2L, 4L, 2L, 1L),
      Seq("books", 1L, 2L, 2L, 2L, 1L, 1L)))
  }

  test("dataCard with no dups reports zero dup exposure") {
    import spark.implicits._
    val df = Seq(("a", "en", "x y"), ("a", "en", "z")).toDF("source", "lang", "text")
    val out = TextAnalysis.dataCard(col("source"), col("lang"), col("text"))(df)
    assert(rowsOf(out) === Set(Seq("a", 2L, 3L, 1L, 2L, 1L, 0L)))
  }

  test("lengthBatches equals the global-rank spec (no single-reducer sort)") {
    import spark.implicits._
    // 37 docs, lengths cycling 1..7 tokens, shuffled ids: enough rows to
    // span several range partitions and several ragged batches
    val docs = (0 until 37).map { i =>
      val id = (i * 13) % 37
      (id.toLong, Seq.fill(id % 7 + 1)("w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.lengthBatches(col("doc_id"), col("text"), 4)(df)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expected = docs.map { case (id, t) => (id, t.count(_ == ' ').toLong + 1) }
      .sortBy { case (id, n) => (n, id) }.zipWithIndex
      .map { case ((id, n), rank) => id -> (n, rank.toLong / 4) }.toMap
    assert(out === expected)
  }

  test("lengthBatches is total and deterministic across invocations") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, Seq.fill((i % 5 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextAnalysis.lengthBatches(col("doc_id"), col("text"), 8)(df).collect().toSet
    val b = TextAnalysis.lengthBatches(col("doc_id"), col("text"), 8)(df).collect().toSet
    assert(a === b)
    assert(a.size === 50)
  }

  test("seededShuffle equals the md5-order spec, positions are a dense permutation") {
    import spark.implicits._
    val ids = (0L until 41L).map(i => (i * 29) % 41) // shuffled input order
    val df = ids.map(Tuple1(_)).toDF("doc_id")
    val out = TextAnalysis.seededShuffle(col("doc_id"), "sA", 4)(df)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val md5hex = { (s: String) =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val expected = ids.sortBy(id => (md5hex(s"sA:$id"), id)).zipWithIndex
      .map { case (id, p) => id -> (p.toLong, p.toLong % 4, p.toLong / 4) }.toMap
    assert(out === expected)
  }

  test("seededShuffle shards balance within one and a new seed reorders") {
    import spark.implicits._
    val df = (1L to 100L).map(Tuple1(_)).toDF("doc_id")
    val a = TextAnalysis.seededShuffle(col("doc_id"), "s1", 8)(df).collect()
    val byShard = a.groupBy(_.getLong(2)).view.mapValues(_.length)
    assert(byShard.values.max - byShard.values.min <= 1)
    assert(a.map(_.getLong(1)).sorted.toSeq === (0L until 100L))
    val b = TextAnalysis.seededShuffle(col("doc_id"), "s2", 8)(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aMap = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aMap !== b) // different seed, different permutation
  }

  test("TokenEntropy: hand-computed values, empty/degenerate rows, null") {
    import graft.functions.TokenEntropy
    val df = Seq(
      (1L, "a b c d"),       // uniform over 4 → ln 4
      (2L, "a a a a"),       // single symbol → 0
      (3L, "a a b"),         // ln 3 − (2 ln 2)/3
      (4L, ""),              // one empty token → 0
      (5L, "solo"),          // single token → 0
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TokenEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(math.abs(out(1L).asInstanceOf[Double] - math.log(4.0)) < 1e-12)
    assert(out(2L) === 0.0)
    assert(math.abs(out(3L).asInstanceOf[Double] -
      (math.log(3.0) - 2.0 * math.log(2.0) / 3.0)) < 1e-12)
    assert(out(4L) === 0.0)
    assert(out(5L) === 0.0)
    assert(out(6L) === null)
  }

  test("TokenEntropy matches the explode-aggregate form on varied corpora") {
    import spark.implicits._
    // includes repeated tokens, doubled spaces (empty tokens count), unicode
    val df = Seq(
      (1L, "the cat the cat the"), (2L, "x  y  x"), (3L, "ü ü ö"),
      (4L, "one two three four five six seven"), (5L, "a"))
      .toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id"),
      round(graft.functions.TokenEntropy(col("text")), 9).as("h"))
    val tf = df.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").count()
    val viaAgg = tf.groupBy("doc_id").agg(
      round(when(sum(col("count")) <= 1L, lit(0.0)).otherwise(
        log(sum(col("count")).cast("double")) -
          sum(col("count").cast("double") * log(col("count").cast("double")))
            / sum(col("count")).cast("double")), 9).as("h"))
    assert(rowsOf(viaExpr) === rowsOf(viaAgg))
  }

  test("DeflateRatio: repetitive text compresses far below diverse text; edge cases") {
    import graft.functions.DeflateRatio
    val rng = new scala.util.Random(7)
    val diverse = (1 to 200).map(_ => rng.alphanumeric.take(8).mkString).mkString(" ")
    val repetitive = Seq.fill(200)("lorem ipsum dolor sit amet").mkString(" ")
    val df = Seq(
      (1L, repetitive), (2L, diverse), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), DeflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val rep = out(1L).asInstanceOf[Double]
    val div = out(2L).asInstanceOf[Double]
    assert(rep > 0.0 && div > 0.0 && div <= 1.2)
    assert(rep < div / 5) // block repeats collapse under LZ77
    assert(out(3L) === 1.0) // empty: neutral
    assert(out(4L) === null)
    // deterministic across evaluations (thread-local Deflater reset)
    val again = df.select(col("doc_id"), DeflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out === again)
  }

  test("DeflateRatio catches phrase repetition that token entropy cannot") {
    import graft.functions.{DeflateRatio, TokenEntropy}
    // a doc repeating one 8-token paragraph: near-max unigram surprise per
    // paragraph but trivially compressible; vs the same tokens shuffled once
    val para = "alpha bravo charlie delta echo foxtrot golf hotel"
    val repeated = Seq.fill(50)(para).mkString(" ")
    val shuffled = new scala.util.Random(3)
      .shuffle(repeated.split(" ").toSeq).mkString(" ")
    val df = Seq((1L, repeated), (2L, shuffled)).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), TokenEntropy(col("text")).as("h"),
        DeflateRatio(col("text")).as("c"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // entropies identical (same token multiset) — the unigram signal is blind
    assert(math.abs(r(1L)._1 - r(2L)._1) < 1e-12)
    // but the repeated form compresses at least 2x better
    assert(r(1L)._2 < r(2L)._2 / 2)
  }

  test("interleaveSources: strict round-robin, dense per-source and global positions") {
    import spark.implicits._
    // skewed sources: a=6 docs, b=3, c=1
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "a"), (6L, "a"),
      (7L, "b"), (8L, "b"), (9L, "b"), (10L, "c")).toDF("doc_id", "source")
    val out = TextAnalysis.interleaveSources(col("doc_id"), col("source"), "il")(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._4).sorted.toSeq === (0L until 10L)) // dense global
    // per-source positions dense 0..n_s-1
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length))
    }
    // round-robin: global order sorted by (source_pos, source)
    val byPos = out.sortBy(_._4)
    assert(byPos.map(r => (r._3, r._2)).toSeq === byPos.map(r => (r._3, r._2)).sortBy(identity).toSeq)
    // first |sources| positions are one doc from EACH source
    assert(byPos.take(3).map(_._2).toSet === Set("a", "b", "c"))
    // differential vs the window-function formulation
    val w = org.apache.spark.sql.expressions.Window
    val keyed = df.select(col("doc_id"), col("source"),
      md5(concat(lit("il:"), col("doc_id").cast("string"))).as("h"))
    val expected = keyed
      .withColumn("source_pos",
        row_number().over(w.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))) - 1)
      .withColumn("position",
        row_number().over(w.orderBy(col("source_pos"), col("source"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("source"), col("source_pos").cast("long"),
        col("position").cast("long"))
    assert(out.toSet === expected.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("curriculumOrder: dense positions, tier-descending, seed-reproducible") {
    import spark.implicits._
    // quality = diversity*0.5 + stop*0.25 + meanLen*0.05 — vary diversity
    // so tiers split; exact tier values come from qualityTiers itself
    val docs = (1L to 40L).map { i =>
      val reps = (i % 4 + 1).toInt // 4 distinct diversity levels
      (i, (1 to 8).map(j => s"w${j % (9 - reps * 2)}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "sA")(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // dense total order 0..N-1
    assert(out.map(_._3).sorted.toSeq === (0L until 40L))
    // tier never increases as position grows (best tier first)
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a >= b })
    // same seed → identical order; the intra-tier key is the seed hash
    val again = TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "sA")(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet === again.toSet)
    val other = TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "sB")(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.map(r => r._1 -> r._3).toMap !== other)
  }

  test("concatChunks tiles every token exactly once; long docs split at boundaries") {
    import spark.implicits._
    // doc lengths 3, 10, 4, 7 with seqLen 8: doc 2 spans seqs 0-1,
    // doc 4 spans seqs 2-3 (offsets 0,3,13,17; total 24 tokens -> 3 seqs)
    val docs = Seq(
      (1L, (1 to 3).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 4).map(i => s"c$i").mkString(" ")),
      (4L, (1 to 7).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.concatChunks(col("doc_id"), col("text"), seqLen = 8)(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc's spans cover exactly its tokens, starting at 0, contiguous
    val byDoc = out.groupBy(_._1)
    assert(byDoc(2L).map(_._4).sum === 10L && byDoc(2L).size === 2)
    for ((id, n) <- Seq(1L -> 3L, 2L -> 10L, 3L -> 4L, 4L -> 7L)) {
      val spans = byDoc(id).sortBy(_._3)
      assert(spans.map(_._4).sum === n)
      assert(spans.head._3 === 0L)
      assert(spans.zip(spans.tail).forall { case (a, b) => a._3 + a._4 === b._3 })
    }
    // every sequence holds exactly seqLen tokens except the last
    val bySeq = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq === Map(0L -> 8L, 1L -> 8L, 2L -> 8L))
    // differential vs the single-reducer window formulation
    val twin = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("o", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - col("n"))
      .select(col("doc_id"), col("n"), col("o"),
        explode(sequence(expr("o div 8"), expr("(o + n - 1) div 8"))).as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        greatest(lit(0L), col("seq_id") * 8 - col("o")).as("doc_tok_start"),
        (least((col("seq_id") + 1) * lit(8L), col("o") + col("n"))
          - greatest(col("seq_id") * lit(8L), col("o"))).as("n_toks"))
    assert(out.toSet ===
      twin.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("concatChunksShuffled: same per-doc tiling, seed-permuted order, reproducible") {
    import spark.implicits._
    val docs = (1L to 12L).map(i => (i, (1 to 5).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextAnalysis.concatChunksShuffled(col("doc_id"), col("text"), 8, "sA")(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // tiling invariants hold in any order: per-doc coverage, per-seq capacity
    val byDoc = a.groupBy(_._1)
    assert(byDoc.keySet === (1L to 12L).toSet)
    assert(byDoc.values.forall(s => s.map(_._4).sum === 5L))
    val bySeq = a.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq.values.sum === 60L)
    assert(bySeq.filter(_._1 < 7).forall(_._2 == 8L)) // 60 tokens -> 7 seqs of 8 + tail 4
    // reproducible; a new seed permutes which docs share a sequence
    val again = TextAnalysis.concatChunksShuffled(col("doc_id"), col("text"), 8, "sA")(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet === again.toSet)
    val b = TextAnalysis.concatChunksShuffled(col("doc_id"), col("text"), 8, "sB")(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b !== a.map(r => (r._1, r._2)).toSet)
  }

  test("lmBuckets: buckets partition the corpus and rank monotonically with the LM score") {
    import spark.implicits._
    // fluency controlled by the common-vs-unique token mix: doc 1 is 9
    // corpus-frequent tokens + 1 hapax, doc 9 the reverse
    val docs = (1L to 9L).map { i =>
      val common = (1 to (10 - i).toInt).map(_ => "common").mkString(" ")
      val rare = (1 to i.toInt).map(j => s"rare${i}_$j").mkString(" ")
      (i, s"$common $rare")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.lmBuckets(col("doc_id"), col("text"))(docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.length === 9)
    val rank = Map("head" -> 2, "middle" -> 1, "tail" -> 0)
    val ranks = out.sortBy(-_._2).map(x => rank(x._3))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b }) // never up-bucket down-score
    assert(ranks.toSet === Set(0, 1, 2))                            // all three buckets hit
    val byId = out.map(x => x._1 -> x._2).toMap
    assert(byId(1L) > byId(9L)) // common-heavy doc scores above hapax-heavy doc
  }

  test("cleanBlocks keeps stopword-bearing blocks in order; all-fail docs emit no row") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat nav menu on mat"),   // blocks: [the cat] [nav menu] [on mat]
      (2L, "nav menu tag soup"),         // no stopwords anywhere
      (3L, "a b")                        // single short block, 'a' is a stopword
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanBlocks(col("doc_id"), col("text"), blockTokens = 2)(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out === Map(
      1L -> ((2L, "the cat on mat")),    // middle block trimmed, order kept
      3L -> ((1L, "a b"))))              // doc 2 fully dropped
  }

  test("cleanBlocks block gate equals the interpreted membership-count twin") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the the on a is that for of to in xx yy"),
      (2L, (1 to 23).map(i => s"w$i").mkString(" ") + " the")).toDF("doc_id", "text")
    val viaOp = TextAnalysis.cleanBlocks(col("doc_id"), col("text"), 4, minStopHits = 2)(df)
    // twin: explode blocks, filter by interpreted HOF membership count
    val toks = df.select(col("doc_id"), split(col("text"), " ").as("t"))
    val nb = ceil(size(col("t")).cast("double") / 4).cast("int")
    val blocks = toks.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nb - 1),
          i => array_join(slice(col("t"), i * 4 + 1, lit(4)), " "))))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "b")
    val twin = blocks
      .filter(size(filter(split(col("b"), " "),
        t => t.isInCollection(Texts.enStopwords))) >= 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("idx"), col("b")))),
          x => x.getField("b")), " ").as("clean_text"))
    assert(rowsOf(viaOp) === rowsOf(twin))
  }

  test("samplePerSource: exactly k per source (all if smaller), window-form differential") {
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (i, "big")) ++ (31L to 33L).map(i => (i, "tiny")))
      .toDF("doc_id", "source")
    val out = TextAnalysis.samplePerSource(col("doc_id"), col("source"), "s1", 7)(docs)
    val sizes = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("big" -> 7L, "tiny" -> 3L))
    // differential vs the window formulation the oracle states
    val win = docs.select(col("doc_id"), col("source"),
        md5(concat(lit("s1:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("source_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))) - 1)
      .filter(col("source_pos") < 7)
      .select(col("doc_id"), col("source"), col("source_pos").cast("long"))
    assert(rowsOf(out) === rowsOf(win))
    // reproducible; a new seed draws a different big-source subset
    val again = TextAnalysis.samplePerSource(col("doc_id"), col("source"), "s1", 7)(docs)
    assert(rowsOf(again) === rowsOf(out))
    val other = TextAnalysis.samplePerSource(col("doc_id"), col("source"), "s2", 7)(docs)
      .filter(col("source") === "big").select("doc_id").collect().map(_.getLong(0)).toSet
    val ours = out.where(col("source") === "big").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(other !== ours)
  }

  test("gopherRules: each rule trips on its own pathology, clean doc passes") {
    import spark.implicits._
    val longClean = ((1 to 60).map(i => s"word$i") ++ Seq("the", "and")).mkString(" ")
    val docs = Seq(
      (1L, longClean),                                   // passes all five
      (2L, "the and short doc"),                         // < 50 words
      (3L, ((1 to 60).map(_ => "supercalifragilistic") ++ Seq("the", "and")).mkString(" ")), // mean len > 10
      (4L, ((1 to 45).map(i => s"w$i") ++ (1 to 15).map(_ => "####")).mkString(" ") + " the and"), // symbols + non-alpha words
      (5L, (1 to 60).map(i => s"word$i").mkString(" "))  // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(col("doc_id"), col("text"))(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9), r.getInt(10), r.getInt(11))).toMap
    assert(out(1L) === ((1, 1, 1, 1, 1, 1)))
    assert(out(2L)._1 === 0 && out(2L)._6 === 0)         // word count trips
    assert(out(3L)._2 === 0 && out(3L)._6 === 0)         // mean length trips
    assert(out(4L)._3 === 0 && out(4L)._4 === 0 && out(4L)._6 === 0) // alpha + symbol trip
    assert(out(5L)._5 === 0 && out(5L)._6 === 0)         // stopword minimum trips
  }

  test("gopherRules: stats match hand computation, ellipsis counts as symbol") {
    import spark.implicits._
    // 4 words, one '...' token: n_words=4, symbol_ratio=0.25,
    // alpha words = 3/4, mean len = (len - 3)/4
    val t = "abc de ... fgh"
    val out = TextAnalysis.gopherRules(col("doc_id"), col("text"))(
      Seq((1L, t)).toDF("doc_id", "text")).collect()(0)
    assert(out.getLong(1) === 4L)
    assert(out.getDouble(2) === (t.length - 3).toDouble / 4.0)
    assert(out.getDouble(3) === 0.75)
    assert(out.getDouble(4) === 0.25)
    assert(out.getLong(5) === 0L)
  }

  test("gopherPassExpr verdicts are identical to gopherRules' pass column") {
    import spark.implicits._
    // every rule's pathology plus the clean case, both default and custom
    // lists — the short-circuit form must agree bit-for-bit
    val docs = (
      Seq(
        (1L, ((1 to 60).map(i => s"word$i") ++ Seq("the", "and")).mkString(" ")),
        (2L, "the and short doc"),
        (3L, ((1 to 60).map(_ => "supercalifragilistic") ++ Seq("the", "and")).mkString(" ")),
        (4L, ((1 to 45).map(i => s"w$i") ++ (1 to 15).map(_ => "####")).mkString(" ") + " the and"),
        (5L, (1 to 60).map(i => s"word$i").mkString(" ")),
        (6L, "abc de ... fgh")) ++
      (7L to 40L).map(i => (i, (1 to (i % 9 * 9).toInt.max(2)).map(j => s"t${j % 7} the a of").mkString(" ")))
    ).toDF("doc_id", "text")
    for (stops <- Seq(TextAnalysis.gopherStopwords, Seq("the", "a", "of"))) {
      val viaCols = TextAnalysis.gopherRules(col("doc_id"), col("text"), stops)(docs)
        .select(col("doc_id"), (col("pass") === 1).as("p"))
      val viaExpr = docs.select(col("doc_id"),
        TextAnalysis.gopherPassExpr(col("text"), stops).as("p"))
      assert(rowsOf(viaCols) === rowsOf(viaExpr))
    }
  }

  test("gopherRules honors a custom stopword list and word bounds") {
    import spark.implicits._
    val docs = Seq((1L, "qq ww qq ww zz")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(col("doc_id"), col("text"),
      stopwords = Seq("qq", "ww"), minWords = 3, maxWords = 10)(docs).collect()(0)
    assert(out.getLong(5) === 2L)                        // both custom stopwords hit
    assert(out.getInt(6) === 1 && out.getInt(10) === 1)  // word count + stop pass
  }
}
