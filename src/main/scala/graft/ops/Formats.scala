package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  *  - Malformed-record policy is explicit: PERMISSIVE with a corrupt
  *    column (the [[Serde]] drop-malformed idiom) is the curation-grade
  *    default; FAILFAST is for trusted interchange.
  *  - Writers never coalesce: output parallelism = upstream partitioning
  *    (a single-file export is a driver-side convenience, not a
  *    distributed write).
  */
object Formats {

  /** Read CSV with an explicit schema; header line skipped when present. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, failFast: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** Read JSON-lines with an explicit schema (no sampling pass). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

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
