package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) interleave of pre-bucketed keys: bit `i` of bucket
    * column `j` lands at output bit `i * k + j` (k = number of columns).
    * Inputs must already be longs in `[0, 2^bits)` — see [[writeZOrdered]]
    * for the normalization pass. Pure long shift/mask arithmetic, so the
    * whole key stays inside whole-stage codegen (`bits * k` or-terms;
    * `bits * k <= 62` keeps the key in a signed long).
    */
  def zorderKey(bits: Int)(buckets: Column*): Column = {
    require(buckets.nonEmpty, "need at least one bucket column")
    require(bits >= 1 && bits * buckets.size <= 62,
      s"bits=$bits over ${buckets.size} columns exceeds a signed long")
    val k = buckets.size
    val terms = for {
      i <- 0 until bits
      j <- buckets.indices
    } yield shiftleft(shiftright(buckets(j), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-ORDERED layout — multi-dimensional file skipping. [[writeSorted]]
    * clusters ONE key: a filter on any second column still reads every
    * file. Interleaving the bits of k keys (Morton order) gives every
    * file a small hyper-rectangle of the key space, so parquet min/max
    * stats skip files for predicates on ANY prefix-free subset of the
    * z-columns — the standard layout play for a 100 TB fact table with
    * two or three independent access paths (e.g. time × tenant).
    *
    * Columns are normalized to equal-WIDTH buckets from a single min/max
    * aggregate pass (one extra lightweight job, stats collected on the
    * driver as plain scalars). Equal-width is outlier-sensitive; for
    * heavily skewed keys, pre-transform (e.g. `log`) or pre-bucket by
    * rank and call [[zorderKey]] directly. NULLs bucket to 0 so they
    * cluster together rather than scattering.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, bits: Int,
      cols: String*): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(cols.size >= 2, "z-ordering needs >= 2 columns (use writeSorted for 1)")
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = (1L << bits) - 1
    val buckets = cols.zipWithIndex.map { case (c, j) =>
      val lo = if (stats.isNullAt(2 * j)) 0.0 else stats.getDouble(2 * j)
      val hi = if (stats.isNullAt(2 * j + 1)) 0.0 else stats.getDouble(2 * j + 1)
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      // NULL → floor(null) → greatest skips nulls → bucket 0 (clustered)
      least(greatest(
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(n.toDouble)).cast("long"),
        lit(0L)), lit(n))
    }
    val key = zorderKey(bits)(buckets: _*)
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
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
