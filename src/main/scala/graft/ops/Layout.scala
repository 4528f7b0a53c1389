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

  /** RANGE-SORTED layout — the second scan-cost lever after directory
    * partitioning: range-repartition on the sort key, sort within each
    * partition, write. Every output file then owns a DISJOINT key range,
    * so parquet min/max statistics let a range/point predicate skip
    * whole files (and row groups) at planning time — the right layout
    * for the "one day of one key range" access pattern on a 100 TB fact
    * table, complementing [[Bucketing]] (join co-location) and hive
    * partitioning (low-cardinality pruning). Sampling for the range
    * boundaries is one extra lightweight job (Spark's RangePartitioner).
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int,
      cols: String*): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(cols.nonEmpty, "need at least one sort column")
    val key = cols.map(df.col)
    df.repartitionByRange(numFiles, key: _*)
      .sortWithinPartitions(key: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** SMALL-FILE COMPACTION — the table-maintenance pass every streaming
    * ingest needs: micro-batch sinks land a file per trigger per
    * partition, and a 100 TB table quickly owns millions of kilobyte
    * files whose open/footer costs dominate scans. Rewrites `path` to
    * `ceil(bytes / targetBytes)` files via a round-robin repartition
    * (no shuffle key — pure size rebalancing). The write lands in a
    * sibling staging directory first; swap-in is the caller's
    * (table-format-specific) atomic step, because a direct
    * overwrite-in-place would read and clobber the same files.
    * Returns the staging path.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): String = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    val src = new org.apache.hadoop.fs.Path(path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a hive-partitioned root would be silently FLATTENED by a plain
    // rewrite (the inferred partition column becomes a data column and
    // directory pruning is lost) — compact each leaf partition instead
    val partitioned = fs.listStatus(src).exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
    require(!partitioned,
      s"$path is hive-partitioned; compact each leaf partition directory " +
        "instead (a flat rewrite would drop the partition layout)")
    val bytes = fs.getContentSummary(src).getLength
    val nFilesLong = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    require(nFilesLong <= 10000000L,
      s"targetBytes=$targetBytes would produce $nFilesLong files — raise the target")
    val staged = s"$path.compacted"
    spark.read.parquet(path).repartition(nFilesLong.toInt)
      .write.mode("overwrite").parquet(staged)
    staged
  }
}
