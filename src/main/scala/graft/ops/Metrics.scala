package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability: named metrics recorded DURING a job via
  * `Dataset.observe` — row counts, null rates, domain bounds — with no
  * second scan and no extra job. This is the data-quality hook a
  * production curation pipeline wires to its monitoring: the aggregates
  * ride the existing action's pass over the data (they are computed by an
  * `CollectMetrics` operator inside the plan), so at 100 TB the audit is
  * free, where a separate validation query would re-read the corpus.
  *
  * Works on batch (read the [[Observation]] after the action) and on
  * streaming (the same metrics surface per micro-batch in
  * `StreamingQueryProgress.observedMetrics`).
  */
object Metrics {

  private def qualityAggs(cols: Seq[String]) = {
    require(cols.nonEmpty, "quality observation needs at least one column")
    count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
  }

  /** Attach a quality observation to a BATCH frame: total rows plus a null
    * count per listed column. Returns the instrumented frame and the
    * [[Observation]] handle to read once an action has run. (The handle
    * form rejects streaming frames — one handle, many micro-batches; use
    * [[observeQualityStream]] there.)
    */
  def observeQuality(df: DataFrame, name: String,
      cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val aggs = qualityAggs(cols)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** The streaming form: same metrics under a NAME, surfaced per
    * micro-batch in `StreamingQueryProgress.observedMetrics(name)` (or a
    * StreamingQueryListener).
    */
  def observeQualityStream(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    val aggs = qualityAggs(cols)
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
