package graft.ops

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Source/sink formats beyond parquet: CSV, JSON-lines, ORC — the
  * interchange surface a pipeline needs at its edges (exports to
  * spreadsheets/BI, ingestion from logging systems, ORC-standardized
  * lakes). Avro is NOT offered: the spark-avro datasource module is not
  * on this classpath (only Spark's internal avro-core jars), and a
  * format that cannot be exercised would be a stub.
  *
  * Scale rules baked into the API:
  *  - Readers take an EXPLICIT schema. `inferSchema` (CSV) and schema
  *    sampling (JSON) are a full extra pass over the data — at 100 TB
  *    that is a second job before the first real one. Schemas are known
  *    at pipeline-build time; passing them makes the read one pass and
  *    the column pruning exact.
  *  - CSV is written and read RFC 4180 (quotes escaped by DOUBLING, via
  *    `escape` = `"`): Spark's default backslash escaping corrupts field
  *    boundaries in every non-Spark consumer (spreadsheets, DuckDB,
  *    pandas) the moment a field contains a quote.
  *  - Malformed-record policy is explicit, three-valued: FAILFAST for
  *    trusted interchange; default PERMISSIVE (bad rows null-filled);
  *    or pass `corruptCol` to capture each unparseable raw record in a
  *    named column (the [[Serde]] drop-malformed idiom — filter it
  *    `isNull` to drop, or route non-null rows to quarantine). Without
  *    `corruptCol`, a malformed row is indistinguishable from legitimate
  *    nulls — fine for exports, not for curation-grade ingestion.
  *  - Writers never coalesce: output parallelism = upstream partitioning
  *    (a single-file export is a driver-side convenience, not a
  *    distributed write).
  */
object Formats {

  private def withPolicy(r: DataFrameReader, schema: StructType,
      failFast: Boolean, corruptCol: Option[String]): DataFrameReader = {
    require(!(failFast && corruptCol.nonEmpty),
      "corruptCol captures bad records; FAILFAST refuses them — pick one")
    val s = corruptCol.fold(schema)(c => schema.add(c, StringType))
    val base = r.schema(s).option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
    corruptCol.fold(base)(c => base.option("columnNameOfCorruptRecord", c))
  }

  /** Read CSV with an explicit schema; header line skipped when present.
    * With `corruptCol`, the result carries that extra string column
    * holding the raw line of every malformed record (null when clean).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, failFast: Boolean = false,
      corruptCol: Option[String] = None): DataFrame =
    withPolicy(spark.read, schema, failFast, corruptCol)
      .option("header", header.toString)
      .option("escape", "\"")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("escape", "\"")
      .csv(path)

  /** Read JSON-lines with an explicit schema (no sampling pass); see
    * [[readCsv]] for the `corruptCol` malformed-record capture.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false, corruptCol: Option[String] = None): DataFrame =
    withPolicy(spark.read, schema, failFast, corruptCol).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC: the columnar alternative when the lake standardizes on it;
    * same pushdown/pruning behavior class as parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
