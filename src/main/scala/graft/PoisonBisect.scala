package graft

import org.apache.spark.sql.SparkSession

/** Dev-only bisect harness for session-degradation hunts: time a cheap
  * canary query after every suspect, so the catalog entry that poisons
  * the session shows up as the first canary regression. Not part of the
  * driver contract.
  *
  * Usage: `sbt "runMain graft.PoisonBisect canaryName suspect1 suspect2 ..."`
  * (no suspects = whole catalog in order). Honors SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS.
  */
object PoisonBisect {
  def main(args: Array[String]): Unit = {
    val canaryName = args.headOption.getOrElse("p2_project")
    val suspects = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val canary = SparkEntry.queries(canaryName)
    def timeCanary(): Double = {
      val t0 = System.nanoTime()
      Housekeeping.scopedBlocks(spark) { canary(spark, sfDir).count() }
      (System.nanoTime() - t0) / 1e9
    }
    // settle one-time codegen/scan warmup before the baseline
    timeCanary()
    println(f"[bisect] baseline $canaryName: ${timeCanary()}%8.3f s")
    suspects.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try Housekeeping.scopedBlocks(spark) { fn(spark, sfDir).count() }
      catch { case e: Throwable => println(s"[bisect] $name FAILED: ${e.getMessage}") }
      val qSec = (System.nanoTime() - t0) / 1e9
      println(f"[bisect] after $name%-28s (query ${qSec}%8.3f s) canary ${timeCanary()}%8.3f s")
    }
    spark.stop()
  }
}
