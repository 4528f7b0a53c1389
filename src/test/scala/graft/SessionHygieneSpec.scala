package graft

/** Bench-order-independence guard — pins the session-degradation bug class
  * that produced round 5's driver-bench collapse (832.7 s for a catalog
  * that runs in ~65 s isolated: blocks/broadcasts accumulated across the
  * run until unrelated queries thrashed, and a blanket unpersist killed a
  * memoized localCheckpoint'ed artifact for the rest of the JVM).
  *
  * The contract under test is Bench's inter-query protocol
  * ([[Housekeeping.scopedBlocks]]): after any catalog entry runs, (a) no
  * blocks it persisted survive, (b) artifacts OTHER components memoized
  * are still alive and servable, and (c) re-running a query later in the
  * session costs about what it cost the first time.
  */
class SessionHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // A representative slice of the catalog: bare scans (the round-5
  // canaries — a degraded session shows up first on these), shuffle/join
  // shapes, and the block-heavy iterative ops (checkpoint loops, memoized
  // artifacts) that caused the accumulation in the first place.
  private val subset = Seq(
    "s1_source_scan", "p2_project", "g1_groupby_keymapper",
    "j3_interval_join", "a2_windowed_count",
    "x1_dedup_exact", "x2e_dedup_canonical", "x7_kmeans_check",
    "x24_pagerank_check", "x28_pca_check",
    // continuation additions: the heaviest new entries — the containment
    // self-join (candidate exchanges + shuffle-hash verify) and the
    // curriculum rank (localCheckpoint'ed keyed frame whose blocks the
    // scoped cleanup must reclaim without touching other memos)
    "x50_containment_pairs", "x46_curriculum_order",
    // continuation-2 additions: the winnow+UniMax composition (per-doc
    // window frames, two fp-grain exchanges, a driver stats collect) —
    // the heaviest entry added this pass
    "x6i_curation_v4",
    // continuation-3 additions: the trained-index outlier check (memoized
    // model + 4-consumer differential — the memo must survive scoped
    // cleanup) and the v5 composition (gate scan + fingerprint window +
    // range-rank in one plan)
    "x57_outlier_check", "x6j_curation_v5",
    // round-9 addition: the record-linkage blocked self-join (distinct-key
    // exchange reused by both block sides, plus the two id join-backs)
    "x64_record_linkage")

  private def run(name: String): Double = {
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    Housekeeping.scopedBlocks(spark) { fn(spark, dir).count() }
    (System.nanoTime() - t0) / 1e9
  }

  test("catalog subset runs twice in one JVM with no cross-pass degradation") {
    val first = subset.map(n => n -> run(n)).toMap
    // interleave unrelated work between passes the way the full catalog
    // does, then re-run: pass-2 time must stay within 3x pass-1 (+1s
    // absolute slack so sub-100ms queries can't flake the ratio)
    val second = subset.map(n => n -> run(n)).toMap
    val regressions = subset.filter(n => second(n) > first(n) * 3.0 + 1.0)
    assert(regressions.isEmpty,
      regressions.map(n => f"$n: ${first(n)}%.2f -> ${second(n)}%.2f s")
        .mkString("order-dependent slowdown: ", "; ", ""))
  }

  test("driver heap and broadcast count return to envelope after a double pass") {
    // The r5 collapse was a LEAK class (blocks, broadcasts, boxed collects
    // accumulating across a catalog run). Pin it at the resource level,
    // not just the timing level: after running the subset twice, forced
    // GC must bring used heap back to within a fixed envelope of the
    // post-first-pass floor, and no broadcast blocks may pile up.
    def usedHeapMb: Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) / (1 << 20)
    }
    def broadcastBlocks: Int =
      org.apache.spark.GraftSparkTestBridge.broadcastBlockCount(spark.sparkContext)
    subset.foreach(run)
    val heap1 = usedHeapMb
    val bc1 = broadcastBlocks
    subset.foreach(run)
    val heap2 = usedHeapMb
    // envelope: a second identical pass may not retain more than 256 MB
    // over the first pass's floor (memoized artifacts are already resident
    // after pass 1, so pass 2 should add ~nothing)
    assert(heap2 <= heap1 + 256,
      s"driver heap grew across an identical pass: $heap1 MB -> $heap2 MB")
    // broadcast blocks must not accumulate linearly with passes; allow a
    // small constant for torrent chunks pending ContextCleaner GC. The
    // cleaner drains its weak-ref queue ASYNCHRONOUSLY after gc, so poll
    // up to 5 s before declaring a leak (a real leak holds strong refs
    // and never drains — under full-suite load the one-shot read flaked
    // at 35 vs a bound of 30 while the same pass measured 6 when idle)
    var bc2 = broadcastBlocks
    var waited = 0
    while (bc2 > bc1 + 24 && waited < 5000) {
      System.gc(); Thread.sleep(250); waited += 250
      bc2 = broadcastBlocks
    }
    assert(bc2 <= bc1 + 24,
      s"broadcast blocks accumulated across an identical pass: $bc1 -> $bc2")
  }

  test("scoped cleanup leaves no persistent blocks behind") {
    subset.foreach(run)
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty,
      s"blocks still persisted after scoped runs: ${leftover.keySet}")
  }

  test("streaming as-of join runs twice in one JVM with no residue (hygiene subset)") {
    // The streaming exact twin joins the hygiene subset: two identical
    // topology runs in one session must (a) not slow down, (b) leave no
    // active query, registered temp table, or persisted block behind.
    import graft.streaming.{Sinks, Sources, Stateful}
    import graft.streaming.Stateful.{Quote, Trade}
    import spark.implicits._
    def runOnce(tag: String): Double = {
      val t0 = System.nanoTime()
      val (tms, tdf) = Sources.memoryStream[Trade](spark)
      val (qms, qdf) = Sources.memoryStream[Quote](spark)
      val name = s"hyg_asof_$tag"
      val q = Sinks.toMemory(
        Stateful.asofJoinExact(tdf.as[Trade], qdf.as[Quote],
          java.time.Duration.ofSeconds(10)).toDF(), name, "append").start()
      (0 until 5).foreach { b =>
        val base = b * 20000L
        tms.addData((0 until 50).map(i =>
          Trade(s"t$b-$i", s"s${i % 4}", 1.0, new java.sql.Timestamp(base + i * 100))))
        qms.addData((0 until 50).map(i =>
          Quote(s"s${i % 4}", s"q$b-$i", 2.0, new java.sql.Timestamp(base + i * 100))))
        q.processAllAvailable()
      }
      assert(spark.table(name).count() > 0)
      q.stop()
      spark.catalog.dropTempView(name)
      (System.nanoTime() - t0) / 1e9
    }
    val first = runOnce("a")
    val second = runOnce("b")
    assert(second <= first * 3.0 + 1.0,
      f"streaming as-of pass degraded: $first%.2f -> $second%.2f s")
    assert(spark.streams.active.isEmpty, "streaming query leaked past its run")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "streaming run left persisted blocks behind")
  }

  test("memoized artifacts survive another query's cleanup (r5 regression)") {
    // prime the memo inside a scoped block — the scope must NOT reclaim
    // the memoized artifact's backing state...
    Housekeeping.scopedBlocks(spark) {
      ExtensionQueries.pagerankRanks(spark, dir).count()
    }
    // ...run an unrelated persist-heavy query with its own cleanup...
    run("x2e_dedup_canonical")
    // ...and the memo must still serve (round 5: this threw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND for the rest of the JVM)
    val n = ExtensionQueries.pagerankRanks(spark, dir).count()
    assert(n > 0)
  }
}
