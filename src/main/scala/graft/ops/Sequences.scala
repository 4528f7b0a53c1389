package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining over keyed, time-ordered streams: consecutive
  * state transitions (the count matrix of a first-order Markov chain over
  * user journeys — the "what happens after X" analytics primitive).
  *
  * Scale: the lookahead window is PARTITIONED BY KEY — every key's
  * timeline sorts independently in its own task (the [[TextAnalysis
  * .packSequences]] argument: a per-stream running scan is inherently
  * sequential within the stream, embarrassingly parallel across streams).
  * The transition aggregation that follows is a plain hash-agg with
  * map-side combine on at most |states|² cells. Nothing global-sorts.
  * The streaming analog of the lookahead is one-event-of-state in
  * `flatMapGroupsWithState` ([[graft.streaming.Stateful]]'s idiom).
  */
object Sequences {

  /** Global (from_state, to_state, cnt) transition counts: for each key,
    * order its events by `orderCols` (pass enough columns to make the
    * order total — e.g. timestamp then event id — or re-runs of the same
    * data could pair different neighbors) and count consecutive
    * state pairs across the whole corpus.
    */
  def transitionCounts(key: Column, orderCols: Seq[Column], state: Column)(
      df: DataFrame): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)
    val ordered = df.select(
      (key.as("__k") +: state.as("__s") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }): _*)
      // a record with no primary ordering value has no position in the
      // key's journey — dropped, like a timestampless record at a window
      // operator (oracles mirror with `WHERE ts IS NOT NULL`)
      .filter(col("__o0").isNotNull)
    ordered
      .withColumn("__next", lead(col("__s"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__s").as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Ordered funnel conversion: per key, `t1` = the first occurrence of
    * `steps(0)`, `t_i` = the first occurrence of `steps(i-1)` STRICTLY
    * after `t_{i-1}` (each step must follow the previous one in time —
    * a step-2 event before step 1 does not count), plus the completed
    * step count. Output has one row per key that reached step 1; later
    * `t_i` are null where the funnel stalled.
    *
    * Scale: one aggregate + one left join per step, ALL keyed on the
    * funnel key — the accumulator side's HashPartitioning(key) is
    * satisfied once and reused down the chain, and each step's event
    * slice is filtered before its single shuffle. No windows, no
    * per-key event buffering: a key with millions of events costs
    * min-aggregates, never a sort. The time column should be grained
    * identically to the oracle's (epoch micros here — nanos would pass
    * a strictly-after test the truncated twin fails).
    */
  def funnel(key: Column, state: Column, time: Column, steps: Seq[String])(
      df: DataFrame): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = df.select(key.as("user_id"), state.as("__et"), time.as("__u"))
    var acc = ev.filter(col("__et") === steps.head)
      .groupBy(col("user_id")).agg(min(col("__u")).as("t1"))
    for (i <- 2 to steps.length) {
      val prev = (1 until i).map(j => col(s"t$j"))
      val step = ev.filter(col("__et") === steps(i - 1))
        .select(col("user_id").as("__su"), col("__u").as("__sv"))
      acc = acc
        .join(step,
          col("user_id") === col("__su") && col("__sv") > col(s"t${i - 1}"),
          "left")
        .groupBy(col("user_id") +: prev: _*)
        .agg(min(col("__sv")).as(s"t$i"))
    }
    val completed = (2 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.select(col("user_id") +:
      (1 to steps.length).map(i => col(s"t$i")) :+
      completed.as("steps_completed"): _*)
  }

  /** Cohort retention: time is bucketed at `bucketWidth` (integer
    * division — pass a time column and width in the same integer unit),
    * each key's cohort is its first active bucket, and every
    * (cohort, offset) cell reports how many and what fraction of the
    * cohort's members were active `offset` buckets later. Offset 0 is
    * the cohort itself (retention 1.0 by construction).
    *
    * Scale: ONE scan of the fact table and ONE key-hashed exchange over
    * it — the per-key bucket set folds map-side via `collect_set`
    * (bounded by |buckets|, e.g. days observed, not by events), the
    * cohort is `array_min` of that set (no second aggregate, no join
    * back), and cohort sizes are the offset-0 cells themselves (every
    * member is active in their own first bucket), so the |buckets|²-row
    * cell exchange is byte-identical in both branches and Spark's
    * ReuseExchange computes it once. Nothing re-scans events, no
    * windows, nothing driver-side. (A first cut joined three separate
    * scans of events — the plan showed 3 parquet scans of the fact
    * table; this shape shows 1.)
    */
  def retention(key: Column, time: Column, bucketWidth: Long)(
      df: DataFrame): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val cells = df.where(key.isNotNull)
      .select(key.as("user_id"), time.as("__t"))
      .withColumn("d", expr(s"__t div $bucketWidth"))
      .groupBy(col("user_id")).agg(collect_set(col("d")).as("ds"))
      .select(explode(col("ds")).as("d"), array_min(col("ds")).as("d0"))
      .groupBy(col("d0").as("cohort"), (col("d") - col("d0")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.where(col("bucket_offset") === 0)
      .select(col("cohort").as("c0"), col("n_active").as("cohort_size"))
    cells.join(broadcast(sizes), col("cohort") === col("c0"))
      .select(col("cohort"), col("bucket_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
  }
}
