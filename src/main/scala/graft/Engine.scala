package graft

import org.apache.spark.sql.SparkSession

/** The library's session front door: one place that encodes how a graft
  * session should be configured, for users switching from the reference
  * engine (SURVEY §4.3). Everything here is a plain Spark config — no
  * custom runtime — so the same settings work on a 1000-executor cluster
  * submit as on `local[*]` development.
  *
  *  - UTC session time zone: timestamps compare identically across
  *    engines and clusters regardless of driver locale.
  *  - `nanosAsLong`: the fixture's nanosecond-precision parquet
  *    timestamps read as epoch-nano longs instead of failing the scan
  *    (see [[Tables.events]] for the µs conversion contract).
  *  - AQE stays ON (default) — runtime join re-planning, skew-join
  *    splitting and partition coalescing are the 100 TB safety net.
  *  - SQL extensions: the engine's function surface
  *    ([[graft.functions.GraftSparkExtensions]]: `cosine_similarity`,
  *    `quality_score`, …) and the cartesian guardrail
  *    ([[graft.plans.GraftGuardrails]], armed per-session via
  *    `spark.graft.failOnCartesian`).
  */
object Engine extends org.apache.spark.internal.Logging {

  /** The engine's session settings as data — applied by [[builder]], and
    * directly usable as `--conf` pairs on a cluster `spark-submit`.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" ->
      "graft.functions.GraftSparkExtensions,graft.plans.GraftGuardrails")

  /** A pre-configured builder; caller picks master/app/overrides. */
  def builder(): SparkSession.Builder =
    sessionConfigs.foldLeft(SparkSession.builder()) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Build (or join) the session and make the SQL function surface
    * available even when the session pre-existed this call (extensions
    * only apply at session creation; programmatic registration is
    * idempotent, so doing both is safe). The cartesian GUARDRAIL has no
    * post-creation registration hook — if the session pre-existed without
    * it, `spark.graft.failOnCartesian` would silently do nothing, so that
    * gap is logged loudly instead of masked.
    */
  def session(master: String = "local[*]"): SparkSession = {
    val s = builder().master(master).appName("graft").getOrCreate()
    graft.functions.GraftFunctions.register(s)
    val ext = s.conf.getOption("spark.sql.extensions").getOrElse("")
    if (!ext.contains("GraftGuardrails"))
      logWarning("Engine.session() joined a pre-existing SparkSession built " +
        "without graft.plans.GraftGuardrails — spark.graft.failOnCartesian " +
        "will have no effect in this session; use Guardrails.assertNoCartesian " +
        "programmatically or rebuild the session through Engine.builder()")
    s
  }
}
