package graft

import org.apache.spark.sql.functions._
import graft.ops.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFfill fills gaps forward, leaves leading cells null, aligns the grid") {
    // key a: obs at 12 (v=1.0) and 35 (v=3.0), step 10 → grid 10,20,30
    // key b: single obs at 5 (v=9.0) → grid 0 only
    val df = Seq(("a", 12L, 1.0), ("a", 35L, 3.0), ("b", 5L, 9.0))
      .toDF("k", "us", "v")
    val out = rowsOf(Timeseries.resampleFfill(col("k"), col("us"), col("v"), 10L)(df))
    assert(out === Set(
      Seq("a", 10L, 1.0), // bucket of first obs
      Seq("a", 20L, 1.0), // gap → carried forward
      Seq("a", 30L, 3.0), // new observation
      Seq("b", 0L, 9.0)))
  }

  test("resampleFfill ties in one bucket resolve to the greatest (ts, value) pair") {
    val df = Seq(("a", 10L, 5.0), ("a", 14L, 2.0), ("a", 14L, 7.0), ("a", 21L, 1.0))
      .toDF("k", "us", "v")
    val out = rowsOf(Timeseries.resampleFfill(col("k"), col("us"), col("v"), 10L)(df))
    // bucket 10 has ts 10, 14, 14 — latest ts wins, value tie broken upward
    assert(out === Set(Seq("a", 10L, 7.0), Seq("a", 20L, 1.0)))
  }

  test("resampleFfill anchors the grid at the first observation's bucket — the fill is total") {
    // first obs at 25 aligns the grid start DOWN to 20, and that cell holds
    // the observation's value: no grid cell can precede all observations,
    // so the output value column is never null
    val df = Seq(("a", 25L, 1.0), ("a", 49L, 2.0)).toDF("k", "us", "v")
    val out = Timeseries.resampleFfill(col("k"), col("us"), col("v"), 10L)(df)
    assert(out.filter(col("v").isNull).count() === 0L)
    assert(rowsOf(out) === Set(
      Seq("a", 20L, 1.0), Seq("a", 30L, 1.0), Seq("a", 40L, 2.0)))
  }
}
