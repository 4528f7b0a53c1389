package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Clustering

/** Throwaway dev probe: where does sqrt-N k-means training time go?
  * Times trainKMeans at several (k, maxIter) points on one sf dir.
  * Usage: runMain graft.DevKmeansProbe <sfDir>
  */
object DevKmeansProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    for ((k, it) <- Seq((8, 10), (142, 1), (142, 2), (142, 4), (142, 10))) {
      val t0 = System.nanoTime()
      val m = Clustering.trainKMeans(emb, col("vec_id"), col("embedding"),
        k = k, maxIter = it)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] k=$k%4d maxIter=$it%2d rounds=${m.rounds}%2d  $sec%7.2f s")
    }
    spark.stop()
  }
}
