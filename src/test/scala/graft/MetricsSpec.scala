package graft

import org.apache.spark.sql.functions._
import graft.ops.Metrics

/** Observability tests: metrics ride the job's own pass (CollectMetrics in
  * the plan), batch and streaming.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observeQuality records row and null counts during the action, in-plan") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some("c"), None),
      (4L, None, None)).toDF("id", "s", "v")
    val (instrumented, obs) = Metrics.observeQuality(df, "quality", Seq("s", "v"))
    // metrics are computed by the SAME action that consumes the data
    assert(instrumented.filter(col("id") > 0).count() === 4)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_s") === 2L)
    assert(m("n_null_v") === 2L)
    // the observation is an operator in the plan, not a second job
    assert(instrumented.queryExecution.analyzed.toString.contains("CollectMetrics"))
  }

  test("observed metrics surface per micro-batch in streaming progress") {
    import graft.streaming.{OrderEvent, Sources}
    val (ms, df) = Sources.memoryStream[OrderEvent](spark)
    val instrumented = Metrics.observeQualityStream(df, "stream_quality", Seq("user"))
    val name = "metrics_stream_out"
    val q = instrumented.select("orderId").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    ms.addData(Seq(OrderEvent("o1", "alice", Seq(), 1.0,
      java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")))))
    q.processAllAvailable()
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("stream_quality")))
    q.stop()
    assert(observed.nonEmpty)
    assert(observed.last.getAs[Long]("n_rows") === 1L)
    assert(observed.last.getAs[Long]("n_null_user") === 0L)
  }
}
