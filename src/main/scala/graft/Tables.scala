package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-supplied parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All loaders take the scale-factor directory (e.g. `/root/testdata/sf0.01`)
  * so the same query code runs at every SF. Column pruning / predicate
  * pushdown is left to Catalyst — callers `select`/`filter` and the parquet
  * scan prunes (verified via `explain`: `ReadSchema` / `PushedFilters`).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS); Spark 4 refuses it unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which reads it as epoch-nano
    * bigint. We add two derived columns:
    *  - `ts_us` — epoch microseconds via INTEGER division (`ts div 1000`).
    *    Integer division is exact truncation, matching how DuckDB (the
    *    correctness oracle) truncates TIMESTAMP_NS → TIMESTAMP(µs). A
    *    floating-point `ts / 1000` would round (nanos exceed 2^53) and
    *    disagree with the oracle near boundaries.
    *  - `ts_ts` — a proper TimestampType column for `window()` /
    *    `session_window()` (session TZ is UTC).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The engine's entry points (Verify/Bench/DevBench) set this at session
    // build; the guarded set here covers ad-hoc sessions (tests, shells)
    // without re-mutating an already-configured session on every call.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
  }

  /** The GlobalKTable stand-in (FIXTURES.md §C): a small, fully-replicated
    * dimension mapping market segment ("profile") → discount factor.
    * Mirrors the reference's `discounts` topic
    * (src/main/scala/KafkaStreamsApp.scala:159-160); replication to every
    * node = `broadcast()` at the join site.
    */
  def discounts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("AUTOMOBILE", 0.05),
      ("BUILDING",   0.10),
      ("FURNITURE",  0.15),
      ("HOUSEHOLD",  0.20),
      ("MACHINERY",  0.25)
    ).toDF("profile", "factor")
  }

  /** SQL literal matching [[discounts]], for the DuckDB oracle. */
  val discountsSql: String =
    "(VALUES ('AUTOMOBILE', 0.05), ('BUILDING', 0.10), ('FURNITURE', 0.15), " +
      "('HOUSEHOLD', 0.20), ('MACHINERY', 0.25)) AS d(profile, factor)"
}
