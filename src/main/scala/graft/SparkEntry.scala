package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual catalog lives in [[Queries]]; one named query per SURVEY.md §2
  * operator (and extension), each with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The paid-orders pipeline (SURVEY §3.1): J1 ⋈ J2(broadcast) → P4 re-key
    * → J3 interval join → J4 residual filter.
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.paidOrders(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
