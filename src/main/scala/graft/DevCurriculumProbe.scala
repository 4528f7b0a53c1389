package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Dev-only timing probe for curriculumOrder's stages (not library surface). */
object DevCurriculumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graftsf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val d = Tables.documents(spark, sfDir)
    // warm the scan + quality pipeline
    time("warm qualityTiers #1") {
      TextAnalysis.qualityTiers(col("doc_id"), col("text"))(d).count()
    }
    time("warm qualityTiers #2") {
      TextAnalysis.qualityTiers(col("doc_id"), col("text"))(d).count()
    }
    def keyedPlan = TextAnalysis.qualityTiers(col("doc_id"), col("text"))(d)
      .select(col("doc_id"), col("tier"),
        (lit(3) - col("tier")).as("rev"),
        md5(concat(lit("cur:"), col("doc_id").cast("string"))).as("h"))
    time("keyed.count (no ckpt)") { keyedPlan.count() }
    time("keyed.count again") { keyedPlan.count() }
    val pers = time("keyed.persist + count") {
      val p = keyedPlan.persist(); p.count(); p
    }
    time("persisted count again") { pers.count() }
    pers.unpersist()
    val keyed = time("keyed + localCheckpoint") { keyedPlan.localCheckpoint() }
    time("count checkpointed") { keyed.count() }
    val keyed2 = time("localCheckpoint #2") { keyedPlan.localCheckpoint() }
    keyed2.count()
    time("seededShuffle (baseline)") {
      TextAnalysis.seededShuffle(col("doc_id"), "s42", 8)(d).count()
    }
    time("full curriculumOrder #1") {
      TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "cur")(d).count()
    }
    time("full curriculumOrder #2") {
      TextAnalysis.curriculumOrder(col("doc_id"), col("text"), "cur")(d).count()
    }
    spark.stop()
  }
}
