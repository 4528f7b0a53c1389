package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    q.join(corpus, col("id") =!= col("qid"))
      .select(col("qid"), col("id"), graft.ops.Similarity.cosine(col("qvec"), col("vec")).as("sim"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_sim")
    spark.stop()
  }
}
