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
    ordered
      .withColumn("__next", lead(col("__s"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__s").as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
  }
}
