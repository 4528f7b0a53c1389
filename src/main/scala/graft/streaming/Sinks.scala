package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import graft.ops.Serde

/** Sinks (SURVEY §2.5 K1/K2 + §2.2 P5).
  *
  * The reference writes streams back to topics (`stream.to(topic)`,
  * KSA:110, KSA:188) and debugs with `foreach(println)` (KSA:117,
  * KSA:130-132, KSA:150-152). Mapping:
  *  - K1 topic sink → [[toParquet]] (durable offline analog),
  *    [[toKafka]] (the real path, guarded — no connector jar offline),
  *    [[foreachBatchSink]] (arbitrary per-micro-batch side effects).
  *  - K2/P5 console sink → [[toConsole]]; batch analogs [[writeParquet]]
  *    and [[printEach]].
  *
  * Output-mode guidance (SURVEY §2.3 note): KTable-like continuous
  * refinement uses `update`; final-only emission of watermark-closed
  * windows uses `append`. Stream-stream joins are append-only by engine
  * rule.
  */
object Sinks {

  /** K2/P5 — console sink (streaming `foreach(println)` analog). */
  def toConsole(df: DataFrame, outputMode: String = "append"): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(outputMode)

  /** K1 — durable sink: parquet files + checkpoint (exactly-once file sink). */
  def toParquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Named in-memory table sink — the test/debug sink used by the
    * streaming suites to assert final state.
    */
  def toMemory(df: DataFrame, name: String, outputMode: String = "append"): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode)

  /** K1 generalized — per-micro-batch callback; the escape hatch for sinks
    * Spark lacks a connector for (KSA's `.to(topic)` against any store).
    */
  def foreachBatchSink(df: DataFrame, outputMode: String = "update")(
      f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.outputMode(outputMode).foreachBatch(f)

  /** K1 production sink: JSON-serialize (KSA:61) and write to a Kafka
    * topic. Guarded: this environment has no spark-sql-kafka jar.
    */
  def toKafka(df: DataFrame, bootstrap: String, topic: String, keyCol: String,
      checkpoint: String): DataStreamWriter[Row] = {
    require(Sources.dataSourceAvailable("kafka"),
      "Kafka connector (spark-sql-kafka) is not on the classpath; " +
        "use toParquet/foreachBatchSink in this environment")
    val valueCols = df.columns.filter(_ != keyCol).map(col).toSeq
    df.select(col(keyCol).cast("string").as("key"),
        Serde.toJsonValue(valueCols: _*).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
  }

  /** Start a writer and block until every available input is processed —
    * the test harness's run-to-fixpoint helper.
    */
  def runToFixpoint(w: DataStreamWriter[Row]): StreamingQuery = {
    val q = w.start()
    q.processAllAvailable()
    q
  }

  // ---- batch analogs ----

  /** K1 batch analog: `df.write.parquet` (the Verify harness's sink). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** P5/K2 batch analog of `foreach(println)`: print up to `n` rows on the
    * driver (`show` is the console sink of batch Spark).
    */
  def printEach(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)
}
