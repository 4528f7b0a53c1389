package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout helpers for the 100 TB design point: directory
  * partitioning. A fact table partitioned by a low-cardinality selective
  * column (date, source, language) lets every query that filters on it
  * skip whole directories at planning time (`PartitionFilters` in the
  * scan, SURVEY §4.2) — the IO analog of predicate pushdown, and the
  * single biggest scan-cost lever on date-ranged queries. Complements
  * [[Bucketing]] (which co-locates by a HIGH-cardinality join key).
  */
object Layout {

  /** Write `df` hive-partitioned by `cols` (directory per value combo). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned layout back; filters on the partition columns
    * prune directories before any file is opened.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
