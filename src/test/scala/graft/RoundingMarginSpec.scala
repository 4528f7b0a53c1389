package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Measures, in-engine, the rounding-boundary margins that the rounded
  * double-output oracles rely on (r7 verdict task #5: the x16 play,
  * measured instead of asserted).
  *
  * The hash-compared rounded families fall in two classes:
  *  - MULTI-TERM float sums (x12/x59 `avg_logp`, x44 `dsir`, x45
  *    `entropy`): addition order is engine/partitioning-dependent, so the
  *    unrounded values differ between Spark and DuckDB by reassociation
  *    noise ~1e-12. round(·, d) is only hash-stable if no value sits
  *    within that noise of a 0.5·10⁻ᵈ boundary. This spec computes the
  *    UNROUNDED values via the ops' raw twins and asserts the minimum
  *    boundary distance is ≥ 1e3× a conservative 1e-12 noise bound —
  *    i.e. margin > 1e-9 — at both test SFs.
  *  - SINGLE-DIVISION outputs (x56 fertility/chars_per_token, o21
  *    retention, x4c ttr): one IEEE division of identical exact integer
  *    operands is bit-deterministic in both engines — no noise term
  *    exists, so no margin is needed (no test required; recorded here so
  *    the classification is explicit).
  *
  * Measured margins (this spec re-measures; DuckDB cross-check r8):
  *   x12/x59 avg_logp : 1.7e-7 (sf0.001)  4.6e-8 (sf0.01)
  *   x44 dsir         : 1.1e-7 (sf0.001)  7.9e-8 (sf0.01)
  *   x45 entropy      : 3.4e-9 (sf0.001)  8.4e-9 (sf0.01)
  */
class RoundingMarginSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
  // noise bound 1e-12 (generous vs the ~1e-13 observed reassociation
  // drift for ≤1e4-term sums of O(10) magnitudes); gate at 1e3× it
  private val minMargin = 1e-9

  /** Distance of v to the nearest round(·, d) half-way boundary. */
  private def marginCol(v: Column, d: Int): Column = {
    val scaled = abs(v) * math.pow(10, d)
    abs(scaled - floor(scaled) - lit(0.5)) * math.pow(10, -d)
  }

  private def minMarginOf(df: DataFrame, c: String, d: Int): Double =
    df.agg(min(marginCol(col(c), d))).head().getDouble(0)

  private def docs(dir: String) = Tables.documents(spark, dir)

  test("x12/x59 avg_logp: every unrounded score ≥1e3×noise from a round-4 boundary") {
    for (dir <- sfDirs) {
      val m = minMarginOf(
        TextAnalysis.unigramLogProbRaw(col("doc_id"), col("text"))(docs(dir)),
        "avg_logp", 4)
      assert(m > minMargin, s"$dir avg_logp margin $m")
    }
  }

  test("x44 dsir: every unrounded score ≥1e3×noise from a round-4 boundary") {
    for (dir <- sfDirs) {
      val m = minMarginOf(
        TextAnalysis.dsirScoreRaw(col("doc_id"), col("text"),
          col("source") === lit("src0"))(docs(dir)),
        "dsir", 4)
      assert(m > minMargin, s"$dir dsir margin $m")
    }
  }

  test("x45 entropy: every unrounded score ≥1e3×noise from a round-4 boundary") {
    for (dir <- sfDirs) {
      val raw = docs(dir).select(
        graft.functions.TokenEntropy(col("text")).as("entropy"))
      val m = minMarginOf(raw, "entropy", 4)
      assert(m > minMargin, s"$dir entropy margin $m")
    }
  }
}
