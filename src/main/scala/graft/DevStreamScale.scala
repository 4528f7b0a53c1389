package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Topologies

/** Dev-only streaming scale probe (NOT part of the library surface): runs
  * the flagship `paidOrders` topology as a real file-source micro-batched
  * stream over an arbitrary SF dir — the same harness as
  * StreamingScaleSpec — and prints per-batch telemetry from the streaming
  * progress feed: input rows, batch wall-clock, and the stream–stream
  * join's STATE STORE footprint (rows + bytes), which is the quantity
  * that grows with volume on a real cluster and the one the watermark is
  * supposed to bound.
  *
  * Usage: `runMain graft.DevStreamScale <sfDir>`; honors
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS.
  */
object DevStreamScale {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft_stream_scale_").toFile

    val orders = Tables.orders(spark, sfDir).select(
      col("o_orderkey").cast("string").as("orderId"),
      col("o_custkey").cast("string").as("user"),
      array().cast("array<string>").as("products"),
      col("o_totalprice").as("amount"),
      col("o_orderdate").cast("timestamp").as("ts"))
    val payments = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").cast("string").as("orderId"),
      when(col("l_returnflag") === "N", "PAID").otherwise("PENDING").as("status"),
      col("l_shipdate").cast("timestamp").as("ts"))
    val profiles = Tables.customer(spark, sfDir).select(
      col("c_custkey").cast("string").as("user"),
      col("c_mktsegment").as("profile"))
    val discounts = Tables.discounts(spark).withColumnRenamed("factor", "amount")

    def writeChrono(df: DataFrame, sub: String): String = {
      val path = s"${work.getPath}/$sub"
      val years = df.select(year(col("ts")).as("y")).distinct()
        .collect().map(_.getInt(0)).sorted
      for (y <- years) {
        df.filter(year(col("ts")) === y).coalesce(1)
          .write.mode("append").parquet(path)
        Thread.sleep(60)
      }
      path
    }
    val t0 = System.nanoTime()
    val oPath = writeChrono(orders, "orders")
    val pPath = writeChrono(payments, "payments")
    println(f"[stream-scale] chrono write ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val oStream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(oPath)
    val pStream = spark.readStream.schema(payments.schema)
      .option("maxFilesPerTrigger", "1").parquet(pPath)

    val outPath = s"${work.getPath}/out"
    val t1 = System.nanoTime()
    val q = Topologies.paidOrders(oStream, pStream, profiles, discounts,
        joinWindow = "45 days")
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", s"${work.getPath}/ckpt")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val runSec = (System.nanoTime() - t1) / 1e9

    var maxStateRows = 0L
    var maxStateBytes = 0L
    var batches = 0
    var inputRows = 0L
    for (p <- q.recentProgress; if p != null) {
      batches += 1
      inputRows += p.numInputRows
      for (so <- p.stateOperators) {
        maxStateRows = math.max(maxStateRows, so.numRowsTotal)
        maxStateBytes = math.max(maxStateBytes, so.memoryUsedBytes)
      }
      println(f"[stream-scale] batch=${p.batchId}%3d in=${p.numInputRows}%8d " +
        f"ms=${p.batchDuration}%6d state_rows=${p.stateOperators.map(_.numRowsTotal).sum}%9d " +
        f"state_mb=${p.stateOperators.map(_.memoryUsedBytes).sum / 1e6}%8.1f")
    }
    val out = spark.read.parquet(outPath).count()
    println(f"[stream-scale] SUMMARY sf=$sfDir batches(last-window)=$batches " +
      f"total_sec=$runSec%.1f out_rows=$out " +
      f"max_state_rows=$maxStateRows max_state_mb=${maxStateBytes / 1e6}%.1f")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(work)
    spark.stop()
  }
}
