package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{concat, lit, when}

/** Explain-plan assertions (SURVEY §4.2) — the `topology.describe()` analog
  * (KSA:201): verify each relied-upon Catalyst rewrite actually fires,
  * instead of re-implementing it. Runs against the sf0.001 testdata.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame = Queries.queries(name)(spark, dir)

  test("P1: the filter predicate is pushed down to the parquet scan") {
    val p = plan(q("p1_filter_expensive"))
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThanOrEqual(o_totalprice,300000.0)]"), p)
  }

  test("P2: column pruning reaches the scan (only projected columns read)") {
    val p = plan(q("p2_project"))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"), p)
  }

  test("J2: the global-table dim is planned as a broadcast hash join") {
    val p = plan(q("j2_globaltable_join"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("flagship: broadcast for the dim join, no cartesian anywhere") {
    val p = plan(q("flagship_paid_orders"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("map-only extension queries plan zero exchanges") {
    for (name <- Seq("x4_token_stats", "x4b_lang_id", "x4c_quality_score",
        "x4d_fingerprint", "x4e_bpeish_count", "s1_source_scan",
        "x16_semantic_decon")) {
      val p = plan(q(name))
      assert(!p.contains("Exchange"), s"$name plans an Exchange:\n$p")
    }
  }

  test("EXISTS and IN subqueries decorrelate to semi-joins (RewritePredicateSubquery)") {
    for (name <- Seq("q4_order_priority", "q18_large_orders")) {
      val p = plan(q(name))
      assert(p.contains("LeftSemi"), s"$name did not plan a semi-join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q7 broadcasts the nation dims and pushes the ship-date range to the scan") {
    val p = plan(q("q7_nation_volume"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("PushedFilters"), p)
  }

  test("q21 decorrelates EXISTS to semi and NOT EXISTS to anti join") {
    val p = plan(q("q21_waiting_suppliers"))
    assert(p.contains("LeftSemi"), s"q21 missing semi join:\n$p")
    assert(p.contains("LeftAnti"), s"q21 missing anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("AQE splits a skewed join partition at runtime (the no-salt skew path)") {
    // at cluster scale the default 256 MB threshold arms this on real
    // skew; the test shrinks the thresholds so the hot key is observable.
    // saltedJoin (o10) is the explicit alternative when AQE is off.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of the left rows share key 0 → one hot shuffle partition
      val left = spark.range(0, 40000)
        .select(when($"id" % 20 =!= 0, 0L).otherwise($"id").as("k"),
          concat(lit("p" * 64), $"id").as("payload"))
      val right = spark.range(0, 200).select($"id".as("k"), lit(1).as("w"))
      val j = left.join(right, "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("o1 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan(q("o1_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x3 similarity queries plan no window sort (bounded top-k aggregate instead)") {
    for (name <- Seq("x3_cosine_topk", "x3b_ann_ivf")) {
      val p = plan(q(name))
      assert(!p.contains("Window"), s"$name plans a Window:\n$p")
    }
  }

  test("x9 BM25 broadcasts the term stats and plans no Window and no cartesian blowup") {
    val p = plan(q("x9_bm25_search"))
    assert(p.contains("BroadcastHashJoin"), s"df/corpus stats not broadcast:\n$p")
    assert(!p.contains("Window"), s"x9 plans a Window:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
  }

  test("x10 dup-ngram profile plans hash aggregates only — no Window, no cartesian") {
    // exchange reuse between the frequency side and the join side is an
    // AQE runtime decision here (the small side broadcasts at test SF);
    // the static guarantee is the SHAPE: aggregate-then-join, no Window
    // buffering hot shingles, no pair blowup
    val p = plan(q("x10_dup_ngrams"))
    assert(!p.contains("Window"), s"x10 plans a Window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("x11 semDedup self-join rides one reused cid exchange, no cartesian") {
    val p = plan(q("x11_semdedup"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"x11 degenerated to all-pairs:\n$p")
  }

  test("x2 pair pipeline plans no Window: DF cut and sizes are hash aggregates") {
    // A Window over s would sort-buffer every occurrence of a stop-shingle
    // in one task — the skew the DF cut exists to prevent (round-2 verdict).
    val p = plan(q("x2_ngram_jaccard"))
    assert(!p.contains("Window"), s"x2_ngram_jaccard plans a Window:\n$p")
  }

  test("x50 containment plans no Window; doc-array sides of the verify joins hash") {
    // same discipline as x2: DF cut and per-doc state are hash
    // aggregates, and the candidate stream must never sort-merge against
    // the fingerprint arrays (the sf10 lesson from the Jaccard pass)
    val p = plan(q("x50_containment_pairs"))
    assert(!p.contains("Window"), s"x50 plans a Window:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"verify joins not shuffle-hash:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q6 pushes the sargable predicates (shipdate, quantity) to the parquet scan") {
    // the PushedFilters render truncates past ~100 chars; assert the
    // visible prefix (both sargable columns reach the scan)
    val p = plan(q("q6_forecast_revenue"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_shipdate"), p)
  }

  test("o15 as-of join plans a merge-scan shape: no range join, no pair amplification") {
    val p = plan(q("o15_asof_join"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // one exchange for the key partitioning + one inside the right-side
    // (user, ts) dedup — never a per-pair join
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2, p)
  }

  test("x6 curation pipeline is a single pass: no join, one exchange (dedup window)") {
    val p = plan(q("x6_curation_pipeline"))
    assert(!p.toLowerCase.contains("join"), s"x6 plans a join:\n$p")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"x6 plans more than one exchange (+reuse):\n$p")
  }

  test("x8 decontamination never shuffles the corpus: both joins broadcast") {
    val p = plan(q("x8_decontaminate"))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    // every join operator in the plan is a broadcast hash join (each
    // "BroadcastHashJoin" token accounts for exactly one "Join" token)
    assert(p.sliding("Join".length).count(_ == "Join") ==
      p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin"),
      s"x8 plans a non-broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x6e packing plans one part-keyed exchange (parts pack in parallel, no global sort)") {
    val p = plan(q("x6e_pack_sequences"))
    assert(p.contains("hashpartitioning(part"), p)
    assert(!p.contains("rangepartitioning"), s"x6e global-sorts:\n$p")
  }

  /** AQE join strategy is decided at RUNTIME from observed stage sizes, so
    * these assertions execute the query at sf0.1 first and then read the
    * FINAL adaptive plan — the plan a cluster actually runs, not the
    * pre-execution guess.
    */
  private def finalPlan(name: String): String = {
    val df = Queries.queries(name)(spark, "/root/testdata/sf0.1")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"$name did not finalize under AQE:\n$p")
    p
  }

  test("q3 at sf0.1: BUILDING-filtered customer side broadcasts, no sort-merge join") {
    val p = finalPlan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"q3 fell back to SMJ on a filtered dim:\n$p")
    // the segment filter reached the customer scan that feeds the broadcast
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q5 at sf0.1: the six-table chain planned as broadcasts, no sort-merge join") {
    val p = finalPlan("q5_region_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"q5 fell back to SMJ:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
  }

  test("q1 at sf0.1: partial aggregation runs below the exchange (map-side combine)") {
    val p = finalPlan("q1_pricing_summary")
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_sum")
    assert(exchange >= 0 && partial >= 0, p)
    // tree prints top-down: final agg, then the exchange, then the partial
    // agg below it — partial_sum must appear AFTER the exchange line
    assert(partial > exchange, s"q1 partial agg is not below the exchange:\n$p")
  }

  test("x25/x26: the broadcast sketch probe filters MAP-SIDE, below every exchange") {
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect), so
    // plan the two sketch-prefilter queries without it for this assertion
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      // x25's Bloom probe is the BUILT-IN might_contain expression; x26's
      // CMS probe is the repo's codegen CmsEstimateCount twin — both are
      // fully generated code, so NEITHER plan may contain a UDF boundary
      for ((name, probeMark) <- Seq("x25_bloom_decon" -> "might_contain",
          "x26_heavy_hitters" -> "cmsestimatecount")) {
        val exec = Queries.queries(name)(spark, dir).queryExecution.executedPlan
        val probes = exec.collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.condition.toString.toLowerCase.contains(probeMark) => f
        }
        assert(probes.nonEmpty, s"$name plans no sketch-probe filter:\n$exec")
        assert(!exec.toString.contains("UDF"),
          s"$name still plans a UDF boundary:\n$exec")
        // nothing below the probe may shuffle: the sketch cut must happen
        // before the corpus stream ever reaches an exchange — that is the
        // entire 100 TB point of prefiltering
        for (probe <- probes)
          assert(probe.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.isEmpty, s"$name shuffles below the sketch probe:\n$exec")
      }
    } finally spark.conf.set(aqe, prev)
  }

  test("o20 funnel pushes each step's type filter to its scan, no Window, no cartesian") {
    val p = plan(q("o20_funnel"))
    assert(p.contains("EqualTo(event_type,view)"), s"step filter not pushed:\n$p")
    assert(!p.contains("Window"), s"o20 plans a Window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("o21 retention scans events ONCE at runtime (size branch reuses the activity exchange)") {
    // the static plan shows two scan branches; the guarantee is the
    // runtime one — AQE recognizes the two collect_set exchanges as
    // identical and serves the cohort-size branch from the first stage
    val df = q("o21_retention")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    val adaptive = p.split("== Initial Plan ==").head
    assert(adaptive.contains("ReusedExchange"), s"o21 re-shuffled events:\n$adaptive")
    val scans = "FileScan parquet".r.findAllIn(adaptive).length
    assert(scans == 1, s"o21 executed $scans events scans, want 1:\n$adaptive")
  }

  test("x64 record linkage: blocked self-join is an equi-join on one reused exchange") {
    // the pigeonhole blocking must plan as an equi-join on the
    // (class, substring) block key — never a cartesian/nested-loop — and
    // at runtime ONE exchange of the distinct-key block frame must feed
    // BOTH self-join sides (the simhashPairs discipline; a re-computed
    // side would run the explode + distinct once per side)
    val df = q("x64_record_linkage")
    val static = plan(df)
    assert(!static.contains("CartesianProduct"), static)
    assert(!static.contains("BroadcastNestedLoopJoin"),
      s"x64 degenerated to all-pairs:\n$static")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    val adaptive = p.split("== Initial Plan ==").head
    assert(adaptive.contains("ReusedExchange"),
      s"x64 re-computed a self-join side instead of reusing the exchange:\n$adaptive")
  }

  test("x39 length batching plans no single-reducer stage (range partition, local ranks)") {
    // the range exchange + rank live inside the one materialized RDD the
    // globalIndex play builds (bounds sampled once, reused by every
    // action) — the visible plan is a scan of that RDD, and must contain
    // neither a single-reducer exchange nor a global Window
    val p = plan(q("x39_length_batches"))
    assert(!p.contains("Exchange SinglePartition"),
      s"x39 funnels all rows through one reducer:\n$p")
    assert(!p.contains("Window"), s"x39 plans a Window:\n$p")
    assert(p.contains("ExistingRDD"), s"x39 missing materialized rank scan:\n$p")
  }

  test("x41 seeded shuffle plans no single-reducer stage (range partition, local ranks)") {
    val p = plan(q("x41_seeded_shuffle"))
    assert(!p.contains("Exchange SinglePartition"),
      s"x41 funnels all rows through one reducer:\n$p")
    assert(!p.contains("Window"), s"x41 plans a Window:\n$p")
    assert(p.contains("ExistingRDD"), s"x41 missing materialized rank scan:\n$p")
  }

  test("x40 contamination score broadcasts the eval hit-set, no Window") {
    val p = plan(q("x40_contamination_score"))
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
    assert(!p.contains("Window"), s"x40 plans a Window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x42 cluster split routes on the canonical id with no cartesian, no Window") {
    // canonicalize + assignSplit: the split expression is a pure map over
    // the canonical frame — no pair amplification beyond the (bounded)
    // near-dup pair pipeline, no Window, no per-cluster sort
    val p = plan(q("x42_cluster_split"))
    assert(!p.contains("CartesianProduct"), s"x42 plans a cartesian:\n$p")
    assert(!p.contains("Window"), s"x42 plans a Window:\n$p")
  }

  test("x43 temperature mix: the corpus pass is a join-free map-only filter") {
    // the stats pass runs eagerly inside the query builder (K-row collect);
    // the RETURNED plan — the one that would scan 100 TB — must be scan +
    // filter on md5 literals only: no join, no exchange, no Window
    val p = plan(q("x43_temperature_mix"))
    assert(!p.contains("Join"), s"x43 joins the corpus:\n$p")
    assert(!p.contains("Exchange"), s"x43 shuffles the corpus:\n$p")
    assert(!p.contains("Window"), s"x43 plans a Window:\n$p")
  }
}
