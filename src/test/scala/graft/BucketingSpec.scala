package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** Co-located join via bucketing: same key, same bucket count on both
  * sides ⇒ the equi-join plans with ZERO exchanges (the persistent analog
  * of Kafka Streams co-partitioned topics). Also: aggregation on the
  * bucket key needs no shuffle.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans no exchange and returns correct rows") {
    val facts = Seq.tabulate(100)(i => (i.toLong % 10, s"f$i")).toDF("k", "f")
    val dims = Seq.tabulate(10)(i => (i.toLong, s"d$i")).toDF("k", "d")
    Bucketing.writeBucketed(facts, "bspec_facts", "k", 4)
    Bucketing.writeBucketed(dims, "bspec_dims", "k", 4)
    try {
      val l = Bucketing.readBucketed(spark, "bspec_facts")
      val r = Bucketing.readBucketed(spark, "bspec_dims")
      // disable broadcast so the co-located sort-merge path is what's tested
      val joined = l.hint("merge").join(r, Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() === 100)
      assert(rowsOf(joined.filter(col("k") === 3).select(col("d")).distinct()) ===
        Set(Seq("d3")))

      // aggregation on the bucket key also rides the bucketing: no exchange
      val agg = l.groupBy("k").agg(count(lit(1)).as("cnt"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() === 10)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }
}
