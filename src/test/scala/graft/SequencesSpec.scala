package graft

import org.apache.spark.sql.functions._
import graft.ops.Sequences

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  test("transitionCounts pairs only consecutive events within a key") {
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"),
      ("u2", 1L, "b"), ("u2", 2L, "b"),
      ("u3", 5L, "c")) // single event: contributes no transition
      .toDF("user", "t", "s")
    val out = rowsOf(
      Sequences.transitionCounts(col("user"), Seq(col("t")), col("s"))(df))
    assert(out === Set(
      Seq("a", "b", 1L), Seq("b", "a", 1L), Seq("b", "b", 1L)))
  }

  test("transitionCounts order is total under the tiebreak columns") {
    val df = Seq(("u", 1L, 0L, "x"), ("u", 1L, 1L, "y"))
      .toDF("user", "t", "id", "s")
    val out = rowsOf(Sequences.transitionCounts(
      col("user"), Seq(col("t"), col("id")), col("s"))(df))
    assert(out === Set(Seq("x", "y", 1L)))
  }

  test("transitionCounts never crosses keys") {
    val df = Seq(("u1", 1L, "a"), ("u2", 2L, "b")).toDF("user", "t", "s")
    assert(Sequences.transitionCounts(
      col("user"), Seq(col("t")), col("s"))(df).count() === 0)
  }
}
