package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Explain-plan assertions for the adapted TPC-H shapes in [[TpchQueries]]
  * — each checks the planner feature the query exists to exercise, at the
  * physical level a cluster would actually run.
  */
class TpchPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Execute at sf0.1 and return the FINAL adaptive plan (see PlanSpec). */
  private def finalPlan(name: String): String = {
    val df = Queries.queries(name)(spark, "/root/testdata/sf0.1")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"$name did not finalize under AQE:\n$p")
    p
  }

  test("q2: the qualified-supplier set is built once — its exchange is reused, " +
      "lineitem scanned once") {
    val p = finalPlan("q2_min_cost_supplier")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"q2 recomputes the qualified-supplier pipeline per branch:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13: the LEFT join survives into the physical plan (zero-order customers kept)") {
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"q13 lost the outer join:\n$p")
  }

  test("q15: the revenue aggregate feeds both the MAX and the equality join " +
      "through one reused exchange") {
    val p = finalPlan("q15_top_supplier")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"q15 recomputes the revenue aggregate per branch:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q16: NOT IN plans as a left-anti join under the count-distinct aggregate") {
    val p = plan("q16_supplier_variety")
    assert(p.contains("LeftAnti"), s"q16 did not plan an anti join:\n$p")
  }

  test("q17: the correlated AVG subquery decorrelates to an aggregate join, no cartesian") {
    val p = plan("q17_small_qty_revenue")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.toLowerCase.contains("avg"), p)
  }

  test("q19: the disjunctive predicate stays a residual over one equi-join") {
    val p = plan("q19_disjunctive_revenue")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q19 lost the equi-join key:\n$p")
  }

  test("q20: the IN-over-HAVING subquery plans as a semi join against the aggregate") {
    val p = plan("q20_excess_suppliers")
    assert(p.contains("LeftSemi"), s"q20 did not plan a semi join:\n$p")
  }

  test("runtime bloom filter from a selective dim reaches the fact side of a shuffle join") {
    // at real scale the application-side threshold (10 GB default) arms
    // this automatically; the test lowers it to observe the injected filter
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q22: NOT EXISTS plans as an anti join; the scalar AVG threshold is a subquery, " +
      "not a join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("LeftAnti"), s"q22 did not plan an anti join:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
