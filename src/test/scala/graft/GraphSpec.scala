package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank tests: exact tiny-graph fixpoints vs a driver-side reference
  * loop, dangling-mass conservation, and the fixture-graph invariants.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference PageRank: same formula, plain Scala maps. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val dMass = nodes.filterNot(out.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(id =>
        id -> ((1 - d) + d * (contrib.getOrElse(id, 0.0) + dMass / n))).toMap
    }
    r
  }

  test("pageRank matches the reference loop on a cycle-plus-tail graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    val want = refRanks(edges, 5, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12, s"node $id") }
  }

  test("pageRank conserves total mass with a dangling node") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 1)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    // dMass = rank(2) = 1: rank(1) = 0.15 + 0.85*(0 + 1/2), rank(2) gets
    // the inbound edge plus the same redistributed half
    assert(math.abs(got(1L) - 0.575) < 1e-12)
    assert(math.abs(got(2L) - 1.425) < 1e-12)
    assert(math.abs(got.values.sum - 2.0) < 1e-12)
  }

  test("driver and distributed paths agree on the fixture graph") {
    val edges = ExtensionQueries.coPurchaseEdges(spark, "/root/testdata/sf0.001")
    val fast = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pageRank(edges, iters = 3, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fast.keySet === dist.keySet)
    // same formula, different float accumulation order -> tolerance, not ==
    fast.foreach { case (id, r) => assert(math.abs(r - dist(id)) < 1e-9, s"node $id") }
  }

  test("fixture co-purchase graph: mass conserved, teleport floor held") {
    val ranks = Graph.pageRank(
      ExtensionQueries.coPurchaseEdges(spark, "/root/testdata/sf0.001"), iters = 4)
    val r = ranks.agg(count(lit(1)), sum(col("rank")), min(col("rank"))).collect()(0)
    val n = r.getLong(0)
    assert(n > 0)
    assert(math.abs(r.getDouble(1) - n) / n < 1e-9)
    assert(r.getDouble(2) >= 0.15 - 1e-9)
  }
}
