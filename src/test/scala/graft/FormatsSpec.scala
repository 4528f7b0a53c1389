package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Formats

/** Round-trip tests for the non-parquet source/sink formats, on data with
  * the awkward cases each format mishandles by default: delimiters and
  * quotes inside text (CSV), unicode (JSON), nulls (all).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    (0L, "plain text", "en"),
    (1L, "comma, inside", "de"),
    (2L, "\"quoted\" and , both", "fr"),
    (3L, "unicode é中文", "zh"),
    (4L, null: String, "en"))
    .toDF("id", "text", "lang")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("CSV round-trips delimiters, quotes and nulls with an explicit schema") {
    val path = tmp("csv")
    Formats.writeCsv(data, path)
    val back = Formats.readCsv(spark, path, data.schema)
    assert(rowsOf(back) === rowsOf(data))
  }

  test("JSON-lines round-trips unicode and nulls with an explicit schema") {
    val path = tmp("jsonl")
    Formats.writeJsonl(data, path)
    val back = Formats.readJsonl(spark, path, data.schema)
    // JSON writers drop null fields; the explicit schema reads them back as null
    assert(rowsOf(back) === rowsOf(data))
  }

  test("ORC round-trips with schema preserved") {
    val path = tmp("orc")
    Formats.writeOrc(data, path)
    val back = Formats.readOrc(spark, path)
    // files always read back nullable; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType))
      === data.schema.map(f => (f.name, f.dataType)))
    assert(rowsOf(back) === rowsOf(data))
  }

  test("CSV writes RFC-4180 doubled quotes, not backslash escapes") {
    val path = tmp("csvrfc")
    Formats.writeCsv(data.filter(col("id") === 2), path, header = false)
    val files = new java.io.File(path).listFiles.filter(_.getName.endsWith(".csv"))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
    // a non-Spark RFC-4180 consumer (spreadsheet, DuckDB, pandas) expects
    // the in-field quotes DOUBLED: "...""quoted"" and , both"
    assert(lines.toSeq === Seq("2,\"\"\"quoted\"\" and , both\",fr"), lines.toSeq)
  }

  test("JSONL corruptCol captures malformed lines; filtering it drops them") {
    val path = tmp("jsonlbad")
    Formats.writeJsonl(data.filter(col("id") < 2), path)
    // drop a truncated line in as its own file (appending to a Spark part
    // file would invalidate its hadoop .crc sidecar)
    val w = new java.io.FileWriter(new java.io.File(path, "malformed.json"))
    w.write("{\"id\": 99, \"text\": \"trunca")
    w.close()
    val back = Formats.readJsonl(spark, path, data.schema, corruptCol = Some("_bad"))
    assert(back.count() === 3)
    val clean = back.filter(col("_bad").isNull).drop("_bad")
    assert(rowsOf(clean) === rowsOf(data.filter(col("id") < 2)))
    // the bad row carries its raw line for quarantine (Spark disallows
    // referencing ONLY the corrupt column — keep a data column alongside)
    val bad = back.filter(col("_bad").isNotNull)
      .select(col("id"), col("_bad")).collect()
    assert(bad.length === 1 && bad.head.getString(1).startsWith("{\"id\": 99"))
  }

  test("corruptCol and FAILFAST are mutually exclusive") {
    val err = intercept[IllegalArgumentException] {
      Formats.readJsonl(spark, "/tmp/nowhere", data.schema,
        failFast = true, corruptCol = Some("_bad"))
    }
    assert(err.getMessage.contains("pick one"))
  }

  test("CSV read pushes filters and prunes columns like a columnar-adjacent source") {
    val path = tmp("csvplan")
    Formats.writeCsv(data, path)
    val df = Formats.readCsv(spark, path, data.schema)
      .filter(col("lang") === "en").select("id", "lang")
    // CSV can prune columns at parse time; the filter at least reaches the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,lang:string>"), plan)
    assert(rowsOf(df) === Set(Seq(0L, "en"), Seq(4L, "en")))
  }
}
