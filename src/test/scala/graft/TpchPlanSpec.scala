package graft

import org.apache.spark.sql.DataFrame

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

  test("q22: NOT EXISTS plans as an anti join; the scalar AVG threshold is a subquery, " +
      "not a join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("LeftAnti"), s"q22 did not plan an anti join:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
