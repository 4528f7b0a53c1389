package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{LocalLimitExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.plans.Guardrails

/** Catalog-WIDE plan-invariant sweep: every `SparkEntry.queries` entry is
  * planned at sf0.001 and held to the engine's global scale rules, so a
  * NEW catalog query cannot silently regress what the per-query specs
  * pin only for the queries they name:
  *
  *  1. no cartesian / condition-less join between multi-row sides
  *     ([[Guardrails.check]], which already exempts the scalar-aggregate
  *     broadcast idiom);
  *  2. no interpreted `ScalaUDF` (and no python eval node) anywhere in a
  *     physical plan — every hot-path scalar is builtin or a repo codegen
  *     expression (this is the assert that would have flagged x26's old
  *     per-token CMS probe UDF automatically);
  *  3. no single-reducer funnel: an `Exchange SinglePartition` is legal
  *     only when its input is statically tiny — a partial aggregate with
  *     no grouping keys (corpus constants) or a local limit — never a
  *     full multi-row frame.
  *
  * AQE is disabled for the sweep because `AdaptiveSparkPlanExec` is
  * opaque to `collect` before execution (same dance as PlanSpec's
  * sketch-probe test); the invariants are properties of the static plan.
  */
class PlanInvariantSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Single-reducer exchanges justified by a statically-bounded input:
    * a global (zero-grouping-key) partial aggregate emits one row per
    * task, a local limit at most `limit` rows per task.
    */
  private def boundedInput(e: ShuffleExchangeExec): Boolean =
    e.child.exists {
      case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty
      case _: LocalLimitExec      => true
      case _                      => false
    }

  private def scalaUdfs(p: SparkPlan): Seq[String] =
    p.collect { case node =>
      node.expressions.flatMap(_.collect { case u: ScalaUDF => u.toString })
    }.flatten

  test("every catalog query plans cartesian-free, UDF-free, funnel-free") {
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        try Housekeeping.scopedBlocks(spark) {
          val df = fn(spark, dir)
          Guardrails.check(df.queryExecution.optimizedPlan)
          val exec = df.queryExecution.executedPlan
          val udfs = scalaUdfs(exec)
          if (udfs.nonEmpty)
            failures += s"$name: interpreted ScalaUDF in plan: ${udfs.mkString(", ")}"
          if (exec.toString.contains("EvalPython"))
            failures += s"$name: python eval node in plan"
          for (e <- exec.collect {
              case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
            } if !boundedInput(e))
            failures += s"$name: Exchange SinglePartition over a multi-row frame:\n$e"
        } catch {
          case g: IllegalStateException =>
            failures += s"$name: ${g.getMessage}"
          case e: Exception =>
            failures += s"$name: sweep could not plan the query: $e"
        }
      }
    } finally spark.conf.set(aqe, prev)
    assert(failures.isEmpty,
      s"${failures.size} catalog queries violate plan invariants:\n" +
        failures.mkString("\n\n"))
  }
}
