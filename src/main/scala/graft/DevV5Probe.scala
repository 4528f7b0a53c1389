package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis, Texts}

/** Dev-only stage-time bisection for the x6j curation-v5 composition (NOT
  * part of the library surface): times gate, gate-join, fingerprint
  * window, localCheckpoint and per-source rank separately so a
  * superlinear scale step can be attributed to a stage instead of
  * guessed at.
  *
  * Usage: `runMain graft.DevV5Probe <sfDir>`
  */
object DevV5Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v5probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // micro-bisection: force-evaluate each gate subexpression alone
    // (agg(sum) defeats count()'s column pruning)
    val d0 = Tables.documents(spark, sfDir)
    for (round <- 1 to 2) {
      println(s"[v5probe] -- micro round $round --")
      timed("split+size only") {
        d0.select(size(split(col("text"), " ")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("alpha regexp_count") {
        d0.select(regexp_count(concat(lit(" "), col("text")),
            lit(" [^ ]*[a-zA-Z][^ ]*")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("alpha native byte-scan") {
        d0.select(graft.functions.AlphaWordCount(col("text")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("symbol regexp_count") {
        d0.select(regexp_count(col("text"), lit("#|\\.\\.\\.")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("symbol native byte-scan") {
        d0.select(graft.functions.SymbolMarkCount(col("text")).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("stopword regexp_count") {
        d0.select(regexp_count(col("text"),
            lit(Texts.stopwordCountPattern)).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("stopword native token-probe") {
        d0.select(graft.functions.StopwordHits(col("text"), Texts.enStopwords).as("n"))
          .agg(sum(col("n"))).collect()
      }
      timed("10 stopword contains") {
        val padded = concat(lit(" "), col("text"), lit(" "))
        val hits = Texts.enStopwords
          .map(w => when(padded.contains(s" $w "), lit(1)).otherwise(lit(0)))
          .reduce(_ + _)
        d0.select(hits.as("n")).agg(sum(col("n"))).collect()
      }
      timed("full gopherRules sum(pass)") {
        TextAnalysis.gopherRules(col("doc_id"), col("text"), Texts.enStopwords)(d0)
          .agg(sum(col("pass"))).collect()
      }
    }

    for (round <- 1 to 2) {
      println(s"[v5probe] -- round $round --")
      val d = Tables.documents(spark, sfDir)
      val gate = timed("gate (pass filter count)") {
        val g = TextAnalysis.gopherRules(
            col("doc_id"), col("text"), Texts.enStopwords)(d)
          .filter(col("pass") === 1).select("doc_id")
        g.count(); g
      }
      val joined = timed("gate join (count)") {
        val j = d.join(gate, "doc_id"); j.count(); j
      }
      val deduped = timed("fingerprint window (count)") {
        val s = Dedup.exact(Seq(md5(col("text"))), col("doc_id"))(joined)
          .select(col("doc_id"), col("source"))
        s.count(); s
      }
      val surv = timed("localCheckpoint") { deduped.localCheckpoint() }
      timed("perSourceRank (count)") {
        TextAnalysis.perSourceRank(col("doc_id"), col("source"), "v5")(surv)
          .count()
      }
      timed("full entry (count)") {
        Housekeeping.scopedBlocks(spark) {
          ExtensionQueries.all.find(_.name == "x6j_curation_v5").get
            .run(spark, sfDir).count()
        }
      }
    }
  }
}
