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

  test("funnel requires each step strictly after the previous") {
    val df = Seq(
      // u1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2's clicks all precede its first view: stalls at step 1
      (2L, "click", 5L), (2L, "click", 8L), (2L, "view", 10L),
      // u3's purchase precedes its click: stalls at step 2
      (3L, "view", 10L), (3L, "click", 20L), (3L, "purchase", 15L),
      // u4 never views: no row at all
      (4L, "click", 5L), (4L, "purchase", 6L),
      // u5: same-time click does not count (strictly after), later one does
      (5L, "view", 10L), (5L, "click", 10L), (5L, "click", 12L))
      .toDF("user_id", "event_type", "u")
    val out = rowsOf(Sequences.funnel(col("user_id"), col("event_type"),
      col("u"), Seq("view", "click", "purchase"))(df))
    assert(out === Set(
      Seq(1L, 10L, 20L, 30L, 3),
      Seq(2L, 10L, null, null, 1),
      Seq(3L, 10L, 20L, null, 2),
      Seq(5L, 10L, 12L, null, 2)))
  }

  test("funnel picks the FIRST qualifying time per step") {
    val df = Seq(
      (1L, "view", 10L), (1L, "view", 5L),          // t1 = min of views
      (1L, "click", 7L),                            // before t1=5? no: 7 > 5 counts
      (1L, "click", 30L))
      .toDF("user_id", "event_type", "u")
    val out = rowsOf(Sequences.funnel(col("user_id"), col("event_type"),
      col("u"), Seq("view", "click"))(df))
    assert(out === Set(Seq(1L, 5L, 7L, 2)))
  }

  test("retention counts each cohort member once per bucket") {
    // bucket width 10: u1 first active bucket 0, active 0/1/2 (two events
    // in bucket 1 count once); u2 first active bucket 1, active 1 only;
    // u3 first active bucket 0, active 0 and 2
    val df = Seq(
      (1L, 1L), (1L, 12L), (1L, 17L), (1L, 25L),
      (2L, 13L),
      (3L, 5L), (3L, 29L)).toDF("user_id", "t")
    val out = rowsOf(Sequences.retention(col("user_id"), col("t"), 10L)(df))
    assert(out === Set(
      Seq(0L, 0L, 2L, 2L, 1.0),   // u1, u3 at offset 0
      Seq(0L, 1L, 1L, 2L, 0.5),   // u1 only
      Seq(0L, 2L, 2L, 2L, 1.0),   // u1, u3
      Seq(1L, 0L, 1L, 1L, 1.0)))  // u2's own cohort
  }
}
