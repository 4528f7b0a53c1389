package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY §4 / the 100 TB
  * design point): two tables bucketed and sorted on the same key with the
  * same bucket count join WITHOUT any exchange — the sort-merge join reads
  * bucket i of each side directly. This is the persistent analog of Kafka
  * Streams' co-partitioned topics (same partitioner + partition count ⇒
  * joinable without a repartition topic, KSA's J1 precondition), and the
  * standard way to amortize one shuffle across every future join on a fact
  * table's key.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted table in the session catalog.
    * Every later equi-join or aggregation on `key` against a table
    * bucketed the same way plans with zero exchanges.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet") // managed table under spark.sql.warehouse.dir
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
