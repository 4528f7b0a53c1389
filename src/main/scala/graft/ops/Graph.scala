package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.Row

/** Iterative graph analytics over edge DataFrames — the second graph
  * operator family next to [[Dedup.canonicalize]]'s connected components.
  * PageRank is the canonical "driver-looped DataFrame iterations" shape:
  * per-iteration work is joins and aggregates Catalyst plans like any
  * other query; the driver only sequences rounds and holds scalars.
  *
  * Size-adaptive like [[Dedup.canonicalize]]: below `driverMaxEdges` the
  * edge list fits comfortably in driver memory and the power iteration
  * runs there over primitive arrays (collect once, no per-round job
  * scheduling); above it, the distributed loop runs. The distributed
  * shape is the one that must survive 100 TB: edges are joined to their
  * out-degree ONCE (each edge carries its contribution weight 1/deg),
  * repartitioned by `src` and persisted — every round then broadcasts
  * the |V|-sized rank vector into the stationary edge partitions, and
  * the only shuffle per round is the |V|-sized contribution aggregate on
  * `dst`. `localCheckpoint` cuts lineage every round (same discipline as
  * the k-means and canonicalize loops). Dangling-node mass (rank on
  * nodes with no out-edges) is redistributed uniformly per the public
  * PageRank formulation; the dangling id set is static, computed once,
  * and its per-round aggregate is skipped when the set is empty (e.g. on
  * symmetrized co-occurrence graphs).
  */
object Graph {

  /** PageRank over a directed edge list (`src`, `dst` columns, integral
    * node ids), with the sum-preserving convention: ranks sum to |V|
    * every round (`rank = (1-d) + d * (inbound + danglingMass/|V|)`), so
    * an invariant checker needs no normalization pass. Returns
    * (`id` long, `rank` double).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      driverMaxEdges: Long = 250000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    try {
      val m = e.count()
      if (m <= driverMaxEdges) pageRankDriver(spark, e, iters, damping)
      else pageRankDistributed(e, iters, damping)
    } finally e.unpersist()
  }

  /** Driver path: one collect of the (long, long) edge array, then the
    * iteration over primitive arrays — the same "the model is small,
    * move it to the loop" play as the k-means/BPE trainers. Edge count
    * is bounded by `driverMaxEdges` (a few MB of specialized tuples at
    * the default — Tuple2[Long, Long] is @specialized, so no boxed Rows
    * land on a driver heap shared by a 140-query session).
    */
  private def pageRankDriver(spark: SparkSession, e: DataFrame,
      iters: Int, d: Double): DataFrame = {
    import spark.implicits._
    val rows = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val idx = new java.util.HashMap[Long, Integer]()
    val ids = Array.newBuilder[Long]
    def intern(id: Long): Int = {
      val hit = idx.get(id)
      if (hit != null) hit.intValue()
      else { val i = idx.size; idx.put(id, i); ids += id; i }
    }
    val src = new Array[Int](rows.length)
    val dst = new Array[Int](rows.length)
    var i = 0
    while (i < rows.length) {
      src(i) = intern(rows(i)._1); dst(i) = intern(rows(i)._2); i += 1
    }
    val nodeIds = ids.result()
    val n = nodeIds.length
    val deg = new Array[Double](n)
    i = 0; while (i < src.length) { deg(src(i)) += 1.0; i += 1 }
    var r = Array.fill(n)(1.0)
    var it = 0
    while (it < iters) {
      var dMass = 0.0
      var j = 0
      while (j < n) { if (deg(j) == 0.0) dMass += r(j); j += 1 }
      val acc = new Array[Double](n)
      i = 0; while (i < src.length) { acc(dst(i)) += r(src(i)) / deg(src(i)); i += 1 }
      val next = new Array[Double](n)
      j = 0
      while (j < n) { next(j) = (1.0 - d) + d * (acc(j) + dMass / n); j += 1 }
      r = next
      it += 1
    }
    val out = (0 until n).map(j => Row(nodeIds(j), r(j)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("rank", DoubleType, nullable = false))))
  }

  /** Distributed path. The rank-into-edges join has two regimes: while
    * |V| fits a broadcast (the common case for entity graphs — the rank
    * vector is two words per node), each round is map-side against the
    * stationary edge partitions; past `broadcastMaxNodes` the rank
    * vector instead shuffles on `src`, landing co-partitioned with the
    * persisted edge layout — the billion-node path, one |V| exchange per
    * round either way (the contribution aggregate).
    */
  private def pageRankDistributed(e0: DataFrame, iters: Int, d: Double,
      broadcastMaxNodes: Long = 10000000L): DataFrame = {
    // each edge carries its weight once: (src, dst, w = 1/outdeg(src))
    val outDeg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = e0.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .repartition(col("src")).persist()
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct().persist()
    val dangling = nodes.join(e0.select(col("src").as("id")).distinct(),
      Seq("id"), "left_anti").persist()
    try {
      val n = nodes.count()
      val small = n <= broadcastMaxNodes
      val hasDangling = dangling.count() > 0
      var ranks = nodes.select(col("id"), lit(1.0).as("rank")).localCheckpoint()
      var it = 0
      while (it < iters) {
        val dMass =
          if (!hasDangling) 0.0
          else dangling.join(ranks, "id")
            .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
        val rankBySrc = ranks.select(col("id").as("src"), col("rank"))
        val contrib = e
          .join(if (small) broadcast(rankBySrc) else rankBySrc.repartition(col("src")), "src")
          .select(col("dst").as("id"), (col("rank") * col("w")).as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("c"))
        val next = nodes.join(if (small) broadcast(contrib) else contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0 - d) + lit(d) * (coalesce(col("c"), lit(0.0)) + lit(dMass / n)))
              .as("rank"))
          .localCheckpoint()
        ranks.unpersist()
        ranks = next
        it += 1
      }
      ranks
    } finally { e.unpersist(); nodes.unpersist(); dangling.unpersist() }
  }
}
