package graft

/** The session front door: configs-as-data and function availability. */
class EngineSpec extends SparkSpec {

  test("sessionConfigs pin the cross-engine determinism and extension settings") {
    assert(Engine.sessionConfigs("spark.sql.session.timeZone") === "UTC")
    assert(Engine.sessionConfigs("spark.sql.legacy.parquet.nanosAsLong") === "true")
    val ext = Engine.sessionConfigs("spark.sql.extensions")
    assert(ext.contains("GraftSparkExtensions") && ext.contains("GraftGuardrails"))
  }

  test("session() exposes the SQL function surface even on a pre-existing session") {
    // the shared test session predates this call — extensions can't apply,
    // so session() must fall back to programmatic registration
    val s = Engine.session()
    val r = s.sql("SELECT quality_score('A clean, well formed sentence.') AS q")
      .collect()(0)
    assert(!r.isNullAt(0))
    // idempotent: calling again must not throw on re-registration
    Engine.session()
  }
}
