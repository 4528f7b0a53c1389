package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the x24 pagerank path. Not driver contract.
  *
  * `runMain graft.DevGraph regimes` times the FULL [[graft.ops.Graph.pageRank]]
  * call (8 iterations, forced distributed via driverMaxEdges = 0) twice on
  * the same edge set: once forcing the broadcast rank-join regime
  * (`broadcastMaxNodes = MaxValue`) and once in the co-partitioned
  * SHUFFLE_HASH regime (`broadcastMaxNodes = 0`, the production default —
  * this probe's round-11 A/B at 200k and 2M nodes is why). Run against a
  * DevSynth sf1/sf10 dir for the recorded numbers; ranks are
  * cross-checked for equality (the two regimes are the same arithmetic,
  * so max |Δrank| must be fp-noise).
  */
object DevGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[devgraph] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    if (args.contains("regimes")) {
      val edges = ExtensionQueries.coPurchaseEdges(spark, sfDir)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .persist()
      val m = t("edge materialize") { edges.count() }
      println(s"[devgraph] edges = $m")
      // warm scan caches so neither regime pays first-read costs
      val bcast = t("broadcast regime (8 iters)") {
        graft.ops.Graph.pageRank(edges, iters = 8, driverMaxEdges = 0L,
          broadcastMaxNodes = Long.MaxValue).localCheckpoint()
      }
      val shuf = t("shuffle regime (8 iters)") {
        graft.ops.Graph.pageRank(edges, iters = 8, driverMaxEdges = 0L,
          broadcastMaxNodes = 0L).localCheckpoint()
      }
      val delta = bcast.as("b").join(shuf.as("s"), col("b.id") === col("s.id"))
        .agg(max(abs(col("b.rank") - col("s.rank"))).as("maxd"))
        .collect()(0).getDouble(0)
      println(f"[devgraph] regimes max |Δrank| = $delta%.3e  (n = ${bcast.count()})")
      spark.stop()
      return
    }
    val edges = ExtensionQueries.coPurchaseEdges(spark, sfDir)
    val m = t("edge count (cold)") { edges.count() }
    println(s"[devgraph] edges = $m")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    t("edge persist+count") { e.count() }
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ew = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .repartition(col("src")).persist()
    t("weighted edges persist") { ew.count() }
    val nodes = e.select(col("src").as("id")).distinct().persist()
    val n = t("nodes distinct+count") { nodes.count() }
    println(s"[devgraph] nodes = $n")
    var ranks = t("ranks init checkpoint") {
      nodes.select(col("id"), lit(1.0).as("rank")).localCheckpoint()
    }
    for (it <- 1 to 8) {
      ranks = t(s"iteration $it") {
        val rankBySrc = ranks.select(col("id").as("src"), col("rank"))
        val contrib = ew
          .join(broadcast(rankBySrc), "src")
          .select(col("dst").as("id"), (col("rank") * col("w")).as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("c"))
        val next = nodes.join(broadcast(contrib), Seq("id"), "left")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"))
          .localCheckpoint()
        ranks.unpersist()
        next
      }
    }
    t("full Graph.pageRank call") {
      graft.ops.Graph.pageRank(ExtensionQueries.coPurchaseEdges(spark, sfDir), iters = 8).count()
    }
    spark.stop()
  }
}
