package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.{OrderEvent, Sinks, Sources, Topologies}

/** Sink-operator tests (SURVEY §2.5 K1/K2, §2.2 P5): the durable parquet
  * sink round-trips with exactly-once file-commit semantics, foreachBatch
  * observes every micro-batch, and the console/batch sinks run.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private val orders = Seq(
    OrderEvent("o1", "alice", Seq("a"), 4000.0, ts("2024-01-01T00:00:01Z")),
    OrderEvent("o2", "bob", Seq("b"), 800.0, ts("2024-01-01T00:00:02Z")),
    OrderEvent("o3", "carol", Seq("c"), 1500.0, ts("2024-01-01T00:00:03Z")))

  test("K1 parquet sink: expensiveOrders stream lands durably and re-reads (KSA:110)") {
    val out = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val (ms, df) = Sources.memoryStream[OrderEvent](spark)
    val q = Sinks.toParquet(Topologies.expensiveOrders(df), out, ckpt).start()
    ms.addData(orders)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
    assert(rowsOf(landed.select(col("orderId"))) === Set(Seq("o1"), Seq("o3")))
  }

  test("K1 foreachBatch sink observes each micro-batch with its id") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val (ms, df) = Sources.memoryStream[OrderEvent](spark)
    ms.addData(orders.take(2))
    val q = Sinks.runToFixpoint(Sinks.foreachBatchSink(df, "append") { (batch, id) =>
      seen += ((id, batch.count()))
    })
    ms.addData(orders.drop(2)); q.processAllAvailable()
    q.stop()
    assert(seen.map(_._2).sum === 3L)
    assert(seen.map(_._1).distinct.size === seen.size) // distinct batch ids
  }

  test("K2/P5 console sinks run without error (KSA:117, 130-132, 150-152)") {
    val (ms, df) = Sources.memoryStream[OrderEvent](spark)
    val q = Sinks.toConsole(Topologies.purchasedProducts(df)).start()
    ms.addData(orders)
    q.processAllAvailable()
    q.stop()
    Sinks.printEach(orders.toDF(), 2) // batch foreach(println) analog
  }

  test("K1 checkpoint restart over a durable file source resumes exactly-once") {
    val in = Files.createTempDirectory("graft-restart-in").toString
    val out = Files.createTempDirectory("graft-restart-out").toString
    val ckpt = Files.createTempDirectory("graft-restart-ckpt").toString
    val schema = orders.toDF().schema

    // first run: two orders land via the durable source
    orders.take(2).toDF().coalesce(1).write.mode("append").parquet(in)
    val q1 = Sinks.toParquet(
      Sources.fileStream(spark, in, schema).select("orderId", "amount"), out, ckpt).start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() === 2)

    // new input arrives while the query is DOWN; restart from the same
    // checkpoint — committed files are not replayed, the new one is picked up
    orders.drop(2).toDF().coalesce(1).write.mode("append").parquet(in)
    val q2 = Sinks.toParquet(
      Sources.fileStream(spark, in, schema).select("orderId", "amount"), out, ckpt).start()
    q2.processAllAvailable()
    q2.stop()

    val landed = spark.read.parquet(out)
    assert(landed.count() === 3) // no duplicates, no loss
    assert(rowsOf(landed.select(col("orderId"))) ===
      Set(Seq("o1"), Seq("o2"), Seq("o3")))
  }

  test("chained streaming aggregation state survives a checkpoint restart") {
    // trendingKeys holds TWO stateful operators' state (windowed counts +
    // per-window argmax); both must recover from the checkpoint for the
    // fixpoint to match the batch result
    val in = Files.createTempDirectory("graft-trend-in").toString
    val out = Files.createTempDirectory("graft-trend-out").toString
    val ckpt = Files.createTempDirectory("graft-trend-ckpt").toString
    val evs = Seq(
      OrderEvent("e1", "alice", Seq("a"), 1.0, ts("2024-01-01T00:00:01Z")),
      OrderEvent("e2", "alice", Seq("a"), 1.0, ts("2024-01-01T00:00:03Z")),
      OrderEvent("e3", "bob", Seq("a"), 1.0, ts("2024-01-01T00:00:05Z")))
    val flush = Seq(
      OrderEvent("flush", "zz", Seq("x"), 1.0, ts("2024-01-03T00:00:00Z")))
    val schema = evs.toDF().schema
    def top() = Topologies.trendingKeys(
      Sources.fileStream(spark, in, schema), col("user"), col("ts"),
      "10 seconds", "1 hour")

    // run 1: events arrive but no watermark flush — counts are buffered
    evs.toDF().coalesce(1).write.mode("append").parquet(in)
    val q1 = Sinks.toParquet(top(), out, ckpt).start()
    q1.processAllAvailable()
    q1.stop()

    // the flush arrives while the query is DOWN; restart must recover both
    // operators' buffered state to close and emit the window
    flush.toDF().coalesce(1).write.mode("append").parquet(in)
    val q2 = Sinks.toParquet(top(), out, ckpt).start()
    q2.processAllAvailable()
    q2.stop()

    val base = ts("2024-01-01T00:00:00Z")
    val landed = spark.read.parquet(out)
    assert(rowsOf(landed) === Set(Seq(base, "alice", 2L)))
  }

  test("stream-stream join state survives a checkpoint restart (flagship J3 durability)") {
    import graft.streaming.PaymentEvent
    val oIn = Files.createTempDirectory("graft-j3-orders").toString
    val pIn = Files.createTempDirectory("graft-j3-payments").toString
    val out = Files.createTempDirectory("graft-j3-out").toString
    val ckpt = Files.createTempDirectory("graft-j3-ckpt").toString
    val oSchema = orders.toDF().schema
    val payments = Seq(
      PaymentEvent("o1", "PAID", ts("2024-01-01T00:04:00Z")), // within +5 min of o1
      PaymentEvent("o3", "PAID", ts("2024-01-01T01:00:00Z"))) // outside → never joins
    val pSchema = payments.toDF().schema

    def joined() = Sources.fileStream(spark, oIn, oSchema)
      .withWatermark("ts", "5 minutes")
      .join(
        Sources.fileStream(spark, pIn, pSchema)
          .withColumnRenamed("orderId", "p_orderId")
          .withColumnRenamed("ts", "pts")
          .withWatermark("pts", "5 minutes"),
        expr("orderId = p_orderId AND pts BETWEEN ts - INTERVAL 5 minutes " +
          "AND ts + INTERVAL 5 minutes"))
      .select(col("orderId"), col("amount"), col("status"))

    // run 1: ONLY orders arrive — they are buffered in join state, nothing
    // can be emitted yet
    orders.toDF().coalesce(1).write.mode("append").parquet(oIn)
    val q1 = Sinks.toParquet(joined(), out, ckpt).start()
    q1.processAllAvailable()
    q1.stop()
    assert(!Files.list(java.nio.file.Paths.get(out)).iterator().hasNext ||
      spark.read.parquet(out).count() === 0)

    // payments arrive while the query is DOWN; restart from the checkpoint
    // — the buffered order state must be recovered for the join to fire
    payments.toDF().coalesce(1).write.mode("append").parquet(pIn)
    val q2 = Sinks.toParquet(joined(), out, ckpt).start()
    q2.processAllAvailable()
    q2.stop()

    val landed = spark.read.parquet(out)
    assert(rowsOf(landed) === Set(Seq("o1", 4000.0, "PAID"))) // once, exactly
  }

  test("K1 batch sink writes and re-reads parquet") {
    val out = Files.createTempDirectory("graft-batch-out").toString
    Sinks.writeParquet(orders.toDF(), out)
    assert(spark.read.parquet(out).count() === 3)
  }
}
