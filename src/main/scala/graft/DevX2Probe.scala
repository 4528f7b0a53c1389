package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Texts}

/** Dev-only stage-time bisection for the x2 prefix-filtered set-similarity
  * join (NOT part of the library surface): times each stage of
  * [[Dedup.ngramJaccardPairs]]'s pipeline separately so a superlinear
  * scale step can be attributed to a stage instead of guessed at.
  *
  * Usage: `runMain graft.DevX2Probe <sfDir>`
  */
object DevX2Probe {
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
      println(f"[x2probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val d = Tables.documents(spark, sfDir)
    val (id, text, n, threshold) = (col("doc_id"), col("text"), 3, 0.3)

    // stage 1: exploded distinct shingles (the s-exchange + dedup)
    val ex = Texts.explodedShingles(d, id, text, n)
      .repartition(col("s"))
      .dropDuplicates("id", "s")
    timed("ex.count")(println("  rows=" + ex.count()))

    // stage 2: df aggregate + join back
    val dfc = ex.groupBy(col("s")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= 1000L)
    val kept = ex.join(dfc, "s")
    timed("kept.count")(println("  rows=" + kept.count()))

    // stage 3: per-doc arrays (the id-exchange + sort_array)
    val docsArr = kept
      .groupBy(col("id"))
      .agg(
        sort_array(collect_list(struct(col("__df"), col("s")))).as("byDf"),
        sort_array(collect_list(col("s"))).as("bys"),
        count(lit(1)).as("sz"))
      .withColumn("prefix",
        transform(
          slice(col("byDf"), lit(1),
            (floor(lit(1.0 - threshold) * col("sz") + lit(1e-9)) + 1).cast("int")),
          x => x.getField("s")))
      .drop("byDf")
    timed("docsArr.count")(println("  rows=" + docsArr.count()))

    // stage 4: prefix explode + candidate self-join + distinct
    val pref = docsArr.select(col("id"), col("sz"), explode(col("prefix")).as("s"))
    timed("pref.count")(println("  rows=" + pref.count()))
    val cand = pref.as("l")
      .join(pref.as("r"),
        col("l.s") === col("r.s") && col("l.id") < col("r.id")
          && col("l.sz") * lit(threshold) <= col("r.sz") + lit(1e-9)
          && col("r.sz") * lit(threshold) <= col("l.sz") + lit(1e-9))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    timed("cand.count")(println("  rows=" + cand.count()))

    // stage 5: the full query (verification included), for reference
    timed("full")(println("  rows=" +
      Dedup.ngramJaccardPairs(id, text, n, threshold, maxShingleDf = 1000L)(d).count()))
    spark.stop()
  }
}
